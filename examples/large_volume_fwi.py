"""128^3 (2.1M-voxel) single-chip 3D FWI: scattered-field encoding + chunked CG.

The three levers that make a large-volume inversion practical on ONE
chip of the targeted runtime (measured rationale in PERF_NOTES round 3):

  - random source encoding (encode=8): 32 transmitters -> 8 supershots,
    cutting the RHS-linear GMRES-CBS solve cost 4x;
  - scattered-field misfit (fwi3d.scattered_data_3d): encoding crosstalk
    rides the DIRECT arrival amplitude while the gradient signal rides
    the weak scattering — background subtraction is what makes the
    encoded gradient usable at soft-tissue contrast;
  - chunked execution (chunk_iterations=1): the relay kills multi-minute
    single programs at this volume; one-iteration programs fit the
    per-program device-time budget, with exact carry between chunks.

Run:  python examples/large_volume_fwi.py       (TPU, ~5-8 minutes)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from waveforminversionust_tpu import FWIConfig, PMLConfig
from waveforminversionust_tpu.fwi.fwi3d import (build_fwi_data_3d,
                                                nonlinear_cg_3d,
                                                sample_receivers_3d,
                                                scattered_data_3d)
from waveforminversionust_tpu.fwi.runner3d import reconstruction_rmse_3d
from waveforminversionust_tpu.models.acquisition3d import (
    build_acquisition3d, cylinder_positions, source_fields_3d)
from waveforminversionust_tpu.models.grid3d import Grid3D
from waveforminversionust_tpu.ops import cpx
from waveforminversionust_tpu.ops.born3d import born_gmres_solve_3d

C0, F = 1500.0, 300e3


def main():
    n = 128
    grid = Grid3D(nx=n, ny=n, nz=n, dx=0.75e-3, dy=0.75e-3, dz=0.75e-3,
                  x0=-(n - 1) * 0.375e-3, y0=-(n - 1) * 0.375e-3,
                  z0=-(n - 1) * 0.375e-3)
    pml = PMLConfig(a0=20.0, l_pml=9e-3)
    pos = cylinder_positions(2, 16, 36e-3, 24e-3)     # 32 elements
    acq = build_acquisition3d(grid, pos, min_angle=0.0)  # encode needs this
    Z, Y, X = grid.meshgrid()
    r2 = (X - 5e-3) ** 2 + Y ** 2 + Z ** 2
    vel_true = (C0 + 60.0 * np.exp(-r2 / (2 * 6e-3 ** 2))).astype(np.float32)

    src = cpx.scale(source_fields_3d(acq, grid), 1e6)
    t0 = time.time()
    wv, it = jax.jit(lambda v, s: born_gmres_solve_3d(
        v, s, F, grid, pml, tol=1e-5, maxiter=800, restart=8))(
        jnp.asarray(vel_true), src)
    rec_obs = sample_receivers_3d(wv, jnp.asarray(acq.rx_idx))
    np.asarray(jax.device_get(rec_obs.re[0, 0]))      # sync
    print(f"synthesis (32 RHS, {n}^3): {time.time() - t0:.1f} s, "
          f"{int(it)} matvecs", flush=True)

    t0 = time.time()
    data = build_fwi_data_3d(acq, rec_obs, F, grid)
    # Match the loop's source scale to the synthesis (1e6): with UNIT
    # one-hots the 128^3 fields are ~1e-8-class and the line-search
    # |drec|^2 products land at the f32 denormal boundary — every step
    # goes NaN and reject_nonfinite freezes the model (measured; the
    # one-hot-denormal pitfall, PERF_NOTES).
    data = data._replace(src=cpx.scale(data.src, 1e6))
    data = scattered_data_3d(data, grid, c_ref=C0, pml=pml, gmres_tol=1e-5)
    print(f"background solve + calibration: {time.time() - t0:.1f} s",
          flush=True)

    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    score = lambda v: reconstruction_rmse_3d(v, grid, vel_true,
                                             radius=33e-3,
                                             z_halfspan=15e-3)
    fwi = FWIConfig(clip_velocity=(C0 - 120.0, C0 + 120.0))
    n_it = 24
    t0 = time.time()
    vel, m = nonlinear_cg_3d(vel0, data, grid, fwi, num_iterations=n_it,
                             pml=pml, iter_cap=400, solver3d="gmres",
                             gmres_tol=1e-4, gmres_restart=8,
                             encode=8, chunk_iterations=2)
    loss = np.asarray(m.loss)                          # sync
    dt = time.time() - t0
    print(f"{n_it} scattered-encoded CG iterations (chunked): {dt:.1f} s "
          f"({dt / n_it:.1f} s/iter incl compile)")
    print("loss:", np.array2string(loss, precision=3))
    print(f"inside-array RMSE: homogeneous {score(vel0):.2f} -> "
          f"{score(vel):.2f} m/s")


if __name__ == "__main__":
    main()
