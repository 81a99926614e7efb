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


def test_3d_gmres_matches_fixed_point():
    """Krylov-accelerated 3D CBS (born_gmres_solve_3d): reaches a lower
    preconditioned residual than the physics-count fixed point in no more
    matvecs, and agrees with it in the field."""
    from waveforminversionust_tpu.ops.born3d import (born_gmres_solve_3d,
                                                     born_operator_3d)

    c0 = 1500.0
    f = 250e3
    grid = Grid3D.centered(18e-3, 1.5e-3)  # 25^3
    pml = PMLConfig(a0=20.0, l_pml=6e-3)
    Z, Y, X = grid.meshgrid()
    vel = (c0 + 60 * np.exp(-(X ** 2 + Y ** 2 + Z ** 2)
                            / (2 * (4e-3) ** 2))).astype(np.float32)
    rng = np.random.default_rng(3)
    src = (rng.standard_normal((2,) + grid.shape)
           + 1j * rng.standard_normal((2,) + grid.shape)).astype(np.complex64)

    def relres(u):
        greens, v_pot, gamma, _ = born_operator_3d(vel, f, grid, pml)
        b = -cpx.mul(gamma, greens(cpx.of(src)))
        r = b - cpx.mul(gamma, u - greens(cpx.mul(v_pot, u)))
        return float(jnp.sqrt(jnp.sum(r.re ** 2 + r.im ** 2)
                              / jnp.sum(b.re ** 2 + b.im ** 2)))

    u_fp, n_fp = born_series_solve_3d(vel, src, f, grid, pml, iter_cap=2000)
    # Same matvec budget (up to one restart cycle of overshoot): GMRES must
    # end at a LOWER preconditioned residual than the fixed point.
    u_gm, n_gm = born_gmres_solve_3d(vel, src, f, grid, pml, tol=1e-4,
                                     maxiter=int(n_fp), restart=8)
    res_fp, res_gm = relres(u_fp), relres(u_gm)
    assert int(n_gm) <= int(n_fp) + 9, (int(n_gm), int(n_fp))
    assert res_gm < res_fp, (res_gm, res_fp)
    d = np.linalg.norm(cpx.to_numpy(u_gm) - cpx.to_numpy(u_fp))
    assert d / np.linalg.norm(cpx.to_numpy(u_fp)) < 0.05


def test_3d_gmres_adjoint_lossy():
    """GMRES-CBS adjoint + attenuation variants match the fixed point."""
    from waveforminversionust_tpu.ops.born3d import born_gmres_solve_3d

    c0 = 1500.0
    f = 250e3
    grid = Grid3D.centered(15e-3, 1.5e-3)  # 21^3
    pml = PMLConfig(a0=20.0, l_pml=6e-3)
    Z, Y, X = grid.meshgrid()
    r2 = X ** 2 + Y ** 2 + Z ** 2
    vel = (c0 + 40 * np.exp(-r2 / (2 * (4e-3) ** 2))).astype(np.float32)
    alpha = (8.0 * np.exp(-r2 / (2 * (3e-3) ** 2))).astype(np.float32)
    rng = np.random.default_rng(4)
    src = (rng.standard_normal((1,) + grid.shape)
           + 1j * rng.standard_normal((1,) + grid.shape)).astype(np.complex64)

    u_fp, _ = born_series_solve_3d(vel, src, f, grid, pml, adjoint=True,
                                   iter_cap=2000, attenuation=alpha)
    u_gm, _ = born_gmres_solve_3d(vel, src, f, grid, pml, adjoint=True,
                                  tol=1e-5, maxiter=600, attenuation=alpha)
    d = np.linalg.norm(cpx.to_numpy(u_gm) - cpx.to_numpy(u_fp))
    assert d / np.linalg.norm(cpx.to_numpy(u_fp)) < 0.05


def test_3d_dft_spectral_matches_fft():
    """The MXU DFT-as-matmul spectral path (spectral="dft") is numerically
    the same transform as fftn: transform, round trip, and the whole CBS
    solve agree with the FFT path (the TPU default for axes <= 128; on
    CPU "auto" keeps fftn)."""
    from waveforminversionust_tpu.ops.born3d import _dft3, _fft3

    rng = np.random.default_rng(7)
    x = cpx.of((rng.standard_normal((2, 12, 10, 14))
                + 1j * rng.standard_normal((2, 12, 10, 14))
                ).astype(np.complex64))
    a, b = cpx.to_numpy(_fft3(x)), cpx.to_numpy(_dft3(x))
    assert np.linalg.norm(np.abs(a - b)) / np.linalg.norm(np.abs(a)) < 1e-5
    rt = cpx.to_numpy(_dft3(_dft3(x), inverse=True))
    x0 = cpx.to_numpy(x)
    assert np.linalg.norm(np.abs(rt - x0)) / np.linalg.norm(np.abs(x0)) < 1e-5

    grid = Grid3D.centered(15e-3, 1.5e-3)  # 21^3
    pml = PMLConfig(a0=20.0, l_pml=6e-3)
    Z, Y, X = grid.meshgrid()
    vel = (1500 + 50 * np.exp(-(X ** 2 + Y ** 2 + Z ** 2)
                              / (2 * (4e-3) ** 2))).astype(np.float32)
    src = (rng.standard_normal((1,) + grid.shape)
           + 1j * rng.standard_normal((1,) + grid.shape)).astype(np.complex64)
    u1, _ = born_series_solve_3d(vel, src, 250e3, grid, pml, iter_cap=800,
                                 spectral="fft")
    u2, _ = born_series_solve_3d(vel, src, 250e3, grid, pml, iter_cap=800,
                                 spectral="dft")
    d = np.linalg.norm(cpx.to_numpy(u2) - cpx.to_numpy(u1))
    assert d / np.linalg.norm(cpx.to_numpy(u1)) < 1e-4


def test_3d_gmres_eps_scale_converges_to_same_field():
    """eps_scale reshapes only the G/V splitting (the preconditioner):
    GMRES at the same tol converges to the same field (~tol ball) at a
    comparable matvec count. Chip ladder: PERF_NOTES round 5 (optimum
    ~0.85 at -6% matvecs — kept an expert knob, not a default)."""
    from waveforminversionust_tpu.ops.born3d import born_gmres_solve_3d

    c0 = 1500.0
    f = 250e3
    grid = Grid3D.centered(18e-3, 1.5e-3)  # 25^3
    pml = PMLConfig(a0=20.0, l_pml=6e-3)
    Z, Y, X = grid.meshgrid()
    vel = (c0 + 60 * np.exp(-(X ** 2 + Y ** 2 + Z ** 2)
                            / (2 * (4e-3) ** 2))).astype(np.float32)
    rng = np.random.default_rng(5)
    src = (rng.standard_normal((1,) + grid.shape)
           + 1j * rng.standard_normal((1,) + grid.shape)).astype(np.complex64)

    u1, n1 = born_gmres_solve_3d(vel, src, f, grid, pml, tol=1e-4,
                                 maxiter=600, restart=8)
    u085, n085 = born_gmres_solve_3d(vel, src, f, grid, pml, tol=1e-4,
                                     maxiter=600, restart=8, eps_scale=0.85)
    d = np.linalg.norm(cpx.to_numpy(u085) - cpx.to_numpy(u1))
    assert d / np.linalg.norm(cpx.to_numpy(u1)) < 5e-3, d
    assert int(n085) < 2 * int(n1), (int(n085), int(n1))
