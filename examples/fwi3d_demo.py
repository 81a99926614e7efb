"""Tiny 3D FWI: cylinder-array acquisition around a volumetric blob.

The reference is strictly 2D; this drives the framework's 3D slice
(models/acquisition3d + ops/born3d + fwi/fwi3d): synthesize volumetric
ring data with the 3D convergent-Born solver, then run 3D nonlinear CG.
On a multi-device mesh the transmit batch shards with
`parallel.sharding.shard_fwi_data_3d` (the CBS operator is global in
k-space, so shots are the scalable axis). ~1-2 minutes on CPU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from waveforminversionust_tpu import FWIConfig, PMLConfig
from waveforminversionust_tpu.fwi.fwi3d import (build_fwi_data_3d,
                                                nonlinear_cg_3d,
                                                sample_receivers_3d)
from waveforminversionust_tpu.models.acquisition3d import (build_acquisition3d,
                                                           cylinder_positions,
                                                           source_fields_3d)
from waveforminversionust_tpu.models.grid3d import Grid3D
from waveforminversionust_tpu.ops.born3d import born_series_solve_3d


def main():
    f = 200e3
    c0 = 1500.0
    pml = PMLConfig(a0=20.0, l_pml=6e-3)
    grid = Grid3D.centered(12e-3, 1.0e-3)
    pos = cylinder_positions(n_rings=1, n_per_ring=8, radius=8e-3,
                             z_span=0.0)
    acq = build_acquisition3d(grid, pos, min_angle=0.8)

    z = grid.z0 + grid.dz * jnp.arange(grid.nz)
    y = grid.y0 + grid.dy * jnp.arange(grid.ny)
    x = grid.x0 + grid.dx * jnp.arange(grid.nx)
    r2 = (z[:, None, None] ** 2 + y[None, :, None] ** 2
          + x[None, None, :] ** 2)
    vel_true = (c0 + 40.0 * jnp.exp(-r2 / 4e-3 ** 2)).astype(jnp.float32)

    src = source_fields_3d(acq, grid)
    # one jitted program for the synthesis solve: on the targeted TPU
    # runtime eager dispatch round-trips a relay per op (see the verify
    # notes) and the Born series is hundreds of FFT pairs
    import jax
    wv, _ = jax.jit(lambda v, s: born_series_solve_3d(
        v, s, f, grid, pml, iter_cap=400))(vel_true, src)
    rec_obs = sample_receivers_3d(wv, jnp.asarray(acq.rx_idx))
    data = build_fwi_data_3d(acq, rec_obs, f, grid)

    vel0 = jnp.full(grid.shape, c0, jnp.float32)
    fwi = FWIConfig(num_iterations=4, estimate_source_strength=False,
                    clip_velocity=(c0 - 100.0, c0 + 100.0))
    vel, metrics = nonlinear_cg_3d(vel0, data, grid, fwi, pml=pml,
                                   iter_cap=400)
    losses = np.asarray(metrics.loss)
    err0 = float(jnp.linalg.norm(vel0 - vel_true))
    err = float(jnp.linalg.norm(vel - vel_true))
    print(f"misfit {losses[0]:.3e} -> {losses[-1]:.3e}")
    print(f"velocity error {err0:.1f} -> {err:.1f} (volume L2, m/s)")


if __name__ == "__main__":
    main()
