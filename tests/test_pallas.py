"""Pallas kernel correctness (interpreter mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from waveforminversionust_tpu import Grid2D, PMLConfig
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom
from waveforminversionust_tpu.ops.apply import h_apply
from waveforminversionust_tpu.ops.pallas_stencil import h_apply_pallas
from waveforminversionust_tpu.ops.stencil import helmholtz_coefficients

INTERPRET = jax.devices()[0].platform != "tpu"


def test_pallas_apply_matches_jnp(rng):
    grid = Grid2D.centered(12e-3, 0.8e-3)
    vel = smooth_blob_phantom(grid, radius=4e-3, dc=40)
    coeffs = helmholtz_coefficients(jnp.array(vel), grid, jnp.float32(350e3),
                                    PMLConfig(l_pml=2.4e-3))
    shape = (3,) + grid.shape
    u = jnp.array((rng.standard_normal(shape)
                   + 1j * rng.standard_normal(shape)).astype(np.complex64))
    ref = h_apply(coeffs, u)
    out = h_apply_pallas(coeffs, u, interpret=INTERPRET)
    assert float(jnp.abs(out - ref).max() / jnp.abs(ref).max()) < 1e-5


def test_pallas_apply_nonsquare(rng):
    grid = Grid2D(nx=20, ny=14, dx=0.8e-3, dy=0.8e-3, x0=-7.6e-3, y0=-5.2e-3)
    vel = np.full(grid.shape, 1500.0, np.float32)
    coeffs = helmholtz_coefficients(jnp.array(vel), grid, jnp.float32(350e3),
                                    PMLConfig(l_pml=2e-3))
    shape = (2,) + grid.shape
    u = jnp.array((rng.standard_normal(shape)
                   + 1j * rng.standard_normal(shape)).astype(np.complex64))
    ref = h_apply(coeffs, u)
    out = h_apply_pallas(coeffs, u, interpret=INTERPRET)
    assert float(jnp.abs(out - ref).max() / jnp.abs(ref).max()) < 1e-5


def test_pallas_apply_cpx_matches_split_engine(rng):
    """Split-complex fused apply (the production-engine form) == the jnp
    9-shifted-copies apply, forward and adjoint (adjoint via the
    re-centered conjugate planes, as ops.solve._make_apply_cpx wires it)."""
    from waveforminversionust_tpu.ops import cpx
    from waveforminversionust_tpu.ops.pallas_stencil import h_apply_pallas_cpx
    from waveforminversionust_tpu.ops.split_engine import (
        adjoint_coefficients_cpx, h_apply_adjoint_cpx, h_apply_cpx,
        helmholtz_coefficients_cpx)

    grid = Grid2D.centered(12e-3, 0.8e-3)
    vel = smooth_blob_phantom(grid, radius=4e-3, dc=40)
    coeffs = helmholtz_coefficients_cpx(jnp.array(vel), grid,
                                        jnp.float32(350e3),
                                        PMLConfig(l_pml=2.4e-3))
    shape = (3,) + grid.shape
    u = cpx.Cpx(jnp.array(rng.standard_normal(shape), jnp.float32),
                jnp.array(rng.standard_normal(shape), jnp.float32))

    ref = h_apply_cpx(coeffs, u)
    out = h_apply_pallas_cpx(coeffs, u, interpret=INTERPRET)
    scale = float(jnp.abs(ref.re).max())
    assert float(jnp.abs(out.re - ref.re).max()) < 1e-5 * scale
    assert float(jnp.abs(out.im - ref.im).max()) < 1e-5 * scale

    ref_a = h_apply_adjoint_cpx(coeffs, u)
    out_a = h_apply_pallas_cpx(adjoint_coefficients_cpx(coeffs), u,
                               interpret=INTERPRET)
    assert float(jnp.abs(out_a.re - ref_a.re).max()) < 1e-5 * scale
    assert float(jnp.abs(out_a.im - ref_a.im).max()) < 1e-5 * scale


def test_make_apply_cpx_gating():
    """SolverConfig.fused_apply gates the closure choice: "off" always jnp;
    "on" always the kernel; "auto" respects the VMEM size gate."""
    from waveforminversionust_tpu import SolverConfig
    from waveforminversionust_tpu.ops.pallas_stencil import fused_apply_fits
    from waveforminversionust_tpu.ops.solve import _use_fused_apply

    assert fused_apply_fits(301, 301)
    assert fused_apply_fits(601, 601)
    assert fused_apply_fits(704, 704)   # measured VMEM boundary (round 4)
    assert not fused_apply_fits(736, 736)
    assert not fused_apply_fits(801, 801)
    assert not fused_apply_fits(1024, 1024)
    assert not _use_fused_apply(SolverConfig(fused_apply="off"), 301, 301)
    assert _use_fused_apply(SolverConfig(fused_apply="on"), 301, 301)
    on_cpu = jax.default_backend() == "cpu"
    assert _use_fused_apply(SolverConfig(), 301, 301) == (not on_cpu)
    assert not _use_fused_apply(SolverConfig(), 1024, 1024) or not on_cpu


def test_fused_apply_kernel_dispatch():
    """"auto" off-CPU routes <= 704^2 to the whole-field kernel, larger
    MISALIGNED-width grids (production odd widths, e.g. 801) to the
    y-tiled kernel, and larger 8-aligned widths to the jnp apply (where
    XLA's fused one-pass slice-add measured faster — PERF_NOTES round 5);
    "tiled" forces the tiled kernel everywhere; CPU "auto" stays on the
    jnp apply."""
    from waveforminversionust_tpu import SolverConfig
    from waveforminversionust_tpu.ops.solve import _fused_apply_kernel

    on_cpu = jax.default_backend() == "cpu"
    assert _fused_apply_kernel(SolverConfig(fused_apply="off"), 301, 301) is None
    assert _fused_apply_kernel(SolverConfig(fused_apply="on"), 301, 301) == "whole"
    assert _fused_apply_kernel(SolverConfig(fused_apply="tiled"), 301, 301) == "tiled"
    auto_small = _fused_apply_kernel(SolverConfig(), 301, 301)
    auto_odd = _fused_apply_kernel(SolverConfig(), 801, 801)
    auto_aligned = _fused_apply_kernel(SolverConfig(), 1024, 1024)
    if on_cpu:
        assert auto_small is None and auto_odd is None and auto_aligned is None
    else:
        assert auto_small == "whole" and auto_odd == "tiled"
        assert auto_aligned is None


def test_tiled_apply_cpx_matches_split_engine(rng):
    """y-tiled fused apply == the jnp apply, forward and adjoint, across
    tile-divisibility edge cases (multi-tile, non-divisible rows,
    non-square, single tile)."""
    from waveforminversionust_tpu.ops import cpx
    from waveforminversionust_tpu.ops.pallas_stencil import h_apply_tiled_cpx
    from waveforminversionust_tpu.ops.split_engine import (
        adjoint_coefficients_cpx, h_apply_adjoint_cpx, h_apply_cpx,
        helmholtz_coefficients_cpx)

    for ny, nx, tile in [(32, 24, 8), (29, 24, 8), (41, 23, 16), (14, 20, 128)]:
        grid = Grid2D(nx=nx, ny=ny, dx=0.8e-3, dy=0.8e-3,
                      x0=-(nx - 1) * 0.4e-3, y0=-(ny - 1) * 0.4e-3)
        vel = np.full(grid.shape, 1500.0, np.float32)
        coeffs = helmholtz_coefficients_cpx(
            jnp.array(vel), grid, jnp.float32(350e3), PMLConfig(l_pml=2e-3))
        shape = (3,) + grid.shape
        u = cpx.Cpx(jnp.array(rng.standard_normal(shape), jnp.float32),
                    jnp.array(rng.standard_normal(shape), jnp.float32))

        ref = h_apply_cpx(coeffs, u)
        out = h_apply_tiled_cpx(coeffs, u, interpret=INTERPRET, tile=tile)
        scale = float(jnp.abs(ref.re).max())
        assert float(jnp.abs(out.re - ref.re).max()) < 1e-5 * scale, (ny, nx)
        assert float(jnp.abs(out.im - ref.im).max()) < 1e-5 * scale, (ny, nx)

        ref_a = h_apply_adjoint_cpx(coeffs, u)
        out_a = h_apply_tiled_cpx(adjoint_coefficients_cpx(coeffs), u,
                                  interpret=INTERPRET, tile=tile)
        assert float(jnp.abs(out_a.re - ref_a.re).max()) < 1e-5 * scale, (ny, nx)
        assert float(jnp.abs(out_a.im - ref_a.im).max()) < 1e-5 * scale, (ny, nx)
