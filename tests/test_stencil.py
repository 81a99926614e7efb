"""Stencil, PML, and operator-application correctness tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from waveforminversionust_tpu import Grid2D, PMLConfig
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom
from waveforminversionust_tpu.ops import apply
from waveforminversionust_tpu.ops.stencil import (
    constant_stencil_symbol, helmholtz_coefficients, pml_stretch_fields,
    stencil_params, STENCIL_OFFSETS)

from oracles import (dense_helmholtz_oracle, pml_fields_oracle,
                     stencil_params_oracle)

F = 350e3


def _nonsquare_grid():
    # Deliberately non-square: the reference's indexing silently assumed
    # square grids (SURVEY.md Appendix A); ours must not.
    return Grid2D(nx=14, ny=11, dx=0.8e-3, dy=0.8e-3, x0=-5.2e-3, y0=-4.0e-3)


def test_stencil_params_match_oracle():
    b, d, e = stencil_params(1400.0, 1600.0, F, 0.8e-3, 1.0)
    bo, do, eo = stencil_params_oracle(1400.0, 1600.0, F, 0.8e-3, 1.0)
    assert b == pytest.approx(bo, rel=1e-6)
    assert float(d) == pytest.approx(do, rel=1e-3)  # f32 normal eq vs f64 lstsq
    assert float(e) == pytest.approx(eo, rel=1e-3)


def test_pml_fields_match_oracle():
    grid = _nonsquare_grid()
    A, B, C = pml_stretch_fields(grid, jnp.float32(F), PMLConfig(l_pml=2e-3))
    Ao, Bo, Co = pml_fields_oracle(grid.x, grid.y, F, 10.0, 2e-3)
    np.testing.assert_allclose(np.array(A), Ao, rtol=2e-5)
    np.testing.assert_allclose(np.array(B), Bo, rtol=2e-5)
    np.testing.assert_allclose(np.array(C), Co, rtol=2e-5)
    assert A.shape == (grid.ny, grid.nx - 1)
    assert B.shape == (grid.ny - 1, grid.nx)
    assert C.shape == (grid.ny, grid.nx)


def test_coefficients_match_dense_oracle_nonsquare():
    """Full matrix parity against an independently-coded scalar-loop oracle."""
    grid = _nonsquare_grid()
    rng = np.random.default_rng(0)
    vel = (1500 + 60 * rng.standard_normal(grid.shape)).astype(np.float32)
    pml = PMLConfig(l_pml=2e-3)
    coeffs = helmholtz_coefficients(jnp.array(vel), grid, jnp.float32(F), pml,
                                    dirichlet_value=1.0)
    H = np.array(apply.dense_matrix(coeffs))
    Ho = dense_helmholtz_oracle(grid.x, grid.y, vel, F, pml.a0, pml.l_pml)
    np.testing.assert_allclose(H, Ho, rtol=0, atol=2e-3 * np.abs(Ho).max())


def test_plane_wave_annihilation():
    """Dispersion-optimized stencil annihilates plane waves at ~6 ppw."""
    grid = Grid2D.centered(24e-3, 0.8e-3)
    vel = np.full(grid.shape, 1500, np.float32)
    coeffs = helmholtz_coefficients(jnp.array(vel), grid, jnp.float32(F),
                                    PMLConfig(a0=0.0))
    X, Y = grid.meshgrid()
    kmag = 2 * np.pi * F / 1500
    k2 = kmag ** 2
    for ang in (0.0, np.pi / 8, np.pi / 4):
        kx, ky = kmag * np.cos(ang), kmag * np.sin(ang)
        u = np.exp(-1j * (kx * X + ky * Y)).astype(np.complex64)
        hu = np.array(apply.h_apply(coeffs, jnp.array(u)))
        assert np.abs(hu[2:-2, 2:-2]).max() / k2 < 1e-4


def test_transpose_and_adjoint_identities(rng):
    grid = _nonsquare_grid()
    vel = smooth_blob_phantom(grid, radius=2e-3, dc=50)
    coeffs = helmholtz_coefficients(jnp.array(vel), grid, jnp.float32(F),
                                    PMLConfig(l_pml=2e-3))
    shape = (3,) + grid.shape
    u = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)
    v = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)
    u, v = jnp.array(u), jnp.array(v)

    # <H u, v> == <u, H^H v>
    lhs = jnp.vdot(apply.h_apply(coeffs, u), v)
    rhs = jnp.vdot(u, apply.h_apply_adjoint(coeffs, v))
    assert abs(complex(lhs - rhs)) / abs(complex(lhs)) < 1e-5

    # transposed planes applied with h_apply == h_apply_transpose
    t1 = apply.h_apply(apply.transpose_coefficients(coeffs), u)
    t2 = apply.h_apply_transpose(coeffs, u)
    np.testing.assert_allclose(np.array(t1), np.array(t2), atol=1e-6 * float(jnp.abs(t1).max()))

    # adjoint planes == conj of transposed planes, applied
    a1 = apply.h_apply(apply.adjoint_coefficients(coeffs), v)
    a2 = apply.h_apply_adjoint(coeffs, v)
    np.testing.assert_allclose(np.array(a1), np.array(a2), atol=1e-6 * float(jnp.abs(a1).max()))


def test_constant_symbol_matches_periodic_apply(rng):
    grid = Grid2D.centered(12e-3, 0.8e-3)
    vel = np.full(grid.shape, 1500, np.float32)
    coeffs = np.array(helmholtz_coefficients(jnp.array(vel), grid,
                                             jnp.float32(F), PMLConfig(a0=0.0)))
    b, d, e = stencil_params(1500.0, 1500.0, F, grid.h, grid.aspect)
    k2 = (2 * np.pi * F / 1500) ** 2
    ny, nx = grid.shape
    sym = np.array(constant_stencil_symbol(jnp.complex64(k2), b, d, e,
                                           grid.h, grid.aspect, ny, nx))
    v = rng.standard_normal((ny, nx)) + 1j * rng.standard_normal((ny, nx))
    pred = np.fft.ifft2(sym * np.fft.fft2(v))
    direct = np.zeros_like(v)
    mid = (ny // 2, nx // 2)
    for s, (dy, dx) in enumerate(STENCIL_OFFSETS):
        direct += coeffs[s][mid] * np.roll(v, (-dy, -dx), axis=(0, 1))
    assert np.abs(pred - direct).max() / np.abs(direct).max() < 1e-5
