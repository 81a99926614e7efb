"""3D Born-series solver: analytic free-space Green's function check."""

import jax.numpy as jnp
import numpy as np

from waveforminversionust_tpu import PMLConfig
from waveforminversionust_tpu.models.grid3d import Grid3D
from waveforminversionust_tpu.ops import cpx
from waveforminversionust_tpu.ops.born3d import born_series_solve_3d


def test_3d_homogeneous_matches_analytic_greens():
    """3D free-space Green's function for (lap + k^2) u = delta with the
    exp(-ikr) convention: u = -exp(-ikr)/(4 pi r); grid delta = h^3-weighted
    continuum delta."""
    c0 = 1500.0
    f = 150e3  # lambda = 10 mm
    grid = Grid3D.centered(30e-3, 1.5e-3)  # 41^3
    nz, ny, nx = grid.shape
    vel = np.full(grid.shape, c0, np.float32)
    src = np.zeros((1,) + grid.shape, np.complex64)
    src[0, nz // 2, ny // 2, nx // 2] = 1.0

    u, its = born_series_solve_3d(jnp.array(vel), cpx.of(src), jnp.float32(f),
                                  grid, PMLConfig(a0=20.0, l_pml=9e-3))
    u = cpx.to_numpy(u)[0]
    assert int(its) > 10

    Z, Y, X = grid.meshgrid()
    R = np.sqrt(X ** 2 + Y ** 2 + Z ** 2)
    k = 2 * np.pi * f / c0
    h3 = grid.dx * grid.dy * grid.dz
    ref = -np.exp(-1j * k * np.maximum(R, 1e-9)) / (4 * np.pi * np.maximum(R, 1e-9)) * h3
    ring = (R > 6e-3) & (R < 18e-3)
    err = np.linalg.norm((u - ref)[ring]) / np.linalg.norm(ref[ring])
    assert err < 0.05, err


def test_3d_heterogeneous_finite_and_scattering():
    c0 = 1500.0
    grid = Grid3D.centered(18e-3, 1.5e-3)  # 25^3
    Z, Y, X = grid.meshgrid()
    vel = (c0 + 40 * np.exp(-(X ** 2 + Y ** 2 + Z ** 2) / (2 * (4e-3) ** 2))).astype(np.float32)
    nz, ny, nx = grid.shape
    src = np.zeros((2,) + grid.shape, np.complex64)
    src[0, nz // 2, ny // 2, 4] = 1.0
    src[1, nz // 2, 4, nx // 2] = 1.0
    u, _ = born_series_solve_3d(jnp.array(vel), cpx.of(src), jnp.float32(200e3),
                                grid, PMLConfig(a0=20.0, l_pml=6e-3))
    un = cpx.to_numpy(u)
    assert np.isfinite(un).all()
    # scattered field differs from homogeneous solution
    u0, _ = born_series_solve_3d(jnp.full(grid.shape, c0, np.float32),
                                 cpx.of(src), jnp.float32(200e3), grid,
                                 PMLConfig(a0=20.0, l_pml=6e-3))
    u0n = cpx.to_numpy(u0)
    rel = np.linalg.norm(un - u0n) / np.linalg.norm(u0n)
    assert 0.01 < rel < 1.0
