"""Volumetric attenuation inversion: recover a 3D absorber map by L-BFGS
through the lossy 3D CBS custom VJP.

The reference's physics is strictly lossless AND strictly 2D
(solveHelmholtz.m builds k = omega/c only); this drives two framework
extensions at once: the 3D spectral solver (ops.born3d) with an
attenuation map in its potential, and the alpha-differentiable custom VJP
(`_born3d_diff_lossy`: one adjoint solve yields both the velocity and the
alpha cotangents), wrapped turnkey as `fwi.lbfgs.run_lbfgs_attenuation_3d`.

Synthesizes cylinder-array data through a volumetric Gaussian absorber in
a known homogeneous sound-speed medium, then recovers alpha starting from
a lossless model. ~5 minutes on CPU (25^3 grid, 8 transmits, 6 L-BFGS
iterations through GMRES-CBS solves).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Tiny 25^3 demo: CPU is the right backend (the axon relay pays ~30 ms per
# dispatch, which dwarfs this problem; remove to run on TPU at real sizes).
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from waveforminversionust_tpu import PMLConfig
from waveforminversionust_tpu.fwi.fwi3d import (build_fwi_data_3d,
                                                sample_receivers_3d)
from waveforminversionust_tpu.fwi.lbfgs import run_lbfgs_attenuation_3d
from waveforminversionust_tpu.models.acquisition3d import (
    build_acquisition3d, cylinder_positions, source_fields_3d)
from waveforminversionust_tpu.models.grid3d import Grid3D
from waveforminversionust_tpu.ops import cpx
from waveforminversionust_tpu.ops.born3d import born_series_solve_3d


def main():
    f = 200e3
    c0 = 1500.0
    pml = PMLConfig(a0=20.0, l_pml=6e-3)
    grid = Grid3D.centered(12e-3, 1.0e-3)            # 25^3
    nz, ny, nx = grid.shape

    pos = cylinder_positions(n_rings=1, n_per_ring=8, radius=8e-3,
                             z_span=0.0)
    acq = build_acquisition3d(grid, pos, min_angle=0.8)

    z = grid.z0 + grid.dz * np.arange(nz)
    y = grid.y0 + grid.dy * np.arange(ny)
    x = grid.x0 + grid.dx * np.arange(nx)
    r2 = (z[:, None, None] ** 2 + y[None, :, None] ** 2
          + x[None, None, :] ** 2)
    alpha_true = (40.0 * np.exp(-r2 / 3e-3 ** 2)).astype(np.float32)
    vel = jnp.full(grid.shape, c0, jnp.float32)      # known speed map

    src = source_fields_3d(acq, grid)
    wv, _ = born_series_solve_3d(vel, src, f, grid, pml, iter_cap=500,
                                 attenuation=jnp.asarray(alpha_true))
    rec_obs = sample_receivers_3d(wv, jnp.asarray(acq.rx_idx))
    data = build_fwi_data_3d(acq, rec_obs, f, grid)
    # One-hot-source rescale into f32's normal range (see tests/test_fft3d).
    data = data._replace(src=cpx.scale(data.src, 1e6),
                         rec_obs=cpx.scale(data.rec_obs, 1e6))

    res = run_lbfgs_attenuation_3d(vel, jnp.zeros(grid.shape, jnp.float32),
                                   data, grid, pml, iter_cap=500,
                                   use_gmres=True, num_iterations=6,
                                   estimate_sources=False, alpha_scale=40.0)
    losses = np.asarray(res.loss_history)
    c = (nz // 2, ny // 2, nx // 2)
    print("loss:", " -> ".join(f"{v:.3e}" for v in losses))
    print(f"alpha at center: {float(res.attenuation[c]):.1f} Np/m "
          f"(true {float(alpha_true[c]):.1f}), "
          f"edge: {float(res.attenuation[3, 3, 3]):.2f} (true ~0)")


if __name__ == "__main__":
    main()
