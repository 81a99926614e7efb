"""Twisted (two-sided) block-tridiagonal engine vs the block-Thomas oracle.

Layers: the XLA twisted factor/solve (ops/twisted.py) must match
banded_solve_cpx on the same planes (it solves the same system by a
different elimination ordering); the fused Pallas kernels
(ops/pallas_twisted.py, interpret mode on CPU) must match the XLA twisted
path; and the full solve_helmholtz with factorization="twisted" must hit
direct-solver residuals on the reference-style workload.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveforminversionust_tpu import (AcquisitionConfig, Grid2D, PMLConfig,
                                      SolverConfig)
from waveforminversionust_tpu.ops import cpx
from waveforminversionust_tpu.ops.cpx import Cpx
from waveforminversionust_tpu.ops.split_engine import (
    banded_factor_cpx, banded_solve_cpx, helmholtz_coefficients_cpx)
from waveforminversionust_tpu.ops.twisted import (twisted_factor_cpx,
                                                  twisted_solve_cpx)


def _random_planes(ny, nx, seed=0, diag_boost=4.0):
    """Well-conditioned random block-tridiagonal planes (9, ny, nx)."""
    rng = np.random.default_rng(seed)

    def part():
        a = rng.standard_normal((9, ny, nx)).astype(np.float32)
        a[0] += diag_boost * np.sign(a[0]) + 2 * diag_boost
        return a

    return Cpx(jnp.asarray(part()), jnp.asarray(0.5 * part()))


def _helmholtz_planes(ny=41, nx=37):
    grid = Grid2D(nx=nx, ny=ny, dx=0.8e-3, dy=0.8e-3,
                  x0=-(nx - 1) * 0.4e-3, y0=-(ny - 1) * 0.4e-3)
    vel = 1500.0 + 40.0 * jnp.exp(
        -((jnp.arange(ny)[:, None] - ny / 2) ** 2
          + (jnp.arange(nx)[None, :] - nx / 2) ** 2) / 40.0)
    return grid, helmholtz_coefficients_cpx(
        vel.astype(jnp.float32), grid, 350e3, PMLConfig(l_pml=4e-3))


def _rhs(ny, nx, batch=3, seed=1):
    rng = np.random.default_rng(seed)
    return Cpx(jnp.asarray(rng.standard_normal((batch, ny, nx)), jnp.float32),
               jnp.asarray(rng.standard_normal((batch, ny, nx)), jnp.float32))


def _to_c(z: Cpx):
    return np.asarray(z.re) + 1j * np.asarray(z.im)


@pytest.mark.parametrize("ny,nx,m", [
    (12, 9, None),    # even ny, non-square
    (13, 9, None),    # odd ny
    (13, 9, 3),       # off-center twist
    (13, 9, 11),      # twist near the bottom (m = ny-2)
    (12, 9, 1),       # twist at the top (m = 1)
])
@pytest.mark.parametrize("adjoint", [False, True])
def test_twisted_matches_thomas_random(ny, nx, m, adjoint):
    coeffs = _random_planes(ny, nx)
    b = _rhs(ny, nx)
    x_ref = banded_solve_cpx(banded_factor_cpx(coeffs), b, adjoint=adjoint)
    x_tw = twisted_solve_cpx(twisted_factor_cpx(coeffs, m=m), b,
                             adjoint=adjoint)
    ref, tw = _to_c(x_ref), _to_c(x_tw)
    err = np.abs(tw - ref).max() / np.abs(ref).max()
    assert err < 5e-5, err


@pytest.mark.parametrize("adjoint", [False, True])
def test_twisted_residual_helmholtz(adjoint):
    """True-residual check on real Helmholtz planes (indefinite operator)."""
    from waveforminversionust_tpu.ops.split_engine import (h_apply_adjoint_cpx,
                                                           h_apply_cpx)

    grid, coeffs = _helmholtz_planes()
    b = _rhs(grid.ny, grid.nx, batch=2)
    x = twisted_solve_cpx(twisted_factor_cpx(coeffs), b, adjoint=adjoint)
    hx = (h_apply_adjoint_cpx if adjoint else h_apply_cpx)(coeffs, x)
    r = _to_c(hx) - _to_c(b)
    rel = np.linalg.norm(r) / np.linalg.norm(_to_c(b))
    assert rel < 2e-5, rel


@pytest.mark.parametrize("adjoint", [False, True])
def test_pallas_twisted_interpret_matches_xla(adjoint):
    pytest.importorskip("jax.experimental.pallas")
    from waveforminversionust_tpu.ops.pallas_twisted import (
        twisted_factor_pallas, twisted_solve_pallas)

    grid, coeffs = _helmholtz_planes(ny=21, nx=17)
    b = _rhs(grid.ny, grid.nx, batch=2, seed=3)
    x_ref = twisted_solve_cpx(twisted_factor_cpx(coeffs), b, adjoint=adjoint)
    fac = twisted_factor_pallas(coeffs, interpret=True)
    x = twisted_solve_pallas(fac, b, adjoint=adjoint, interpret=True)
    ref, tw = _to_c(x_ref), _to_c(x)
    err = np.abs(tw - ref).max() / np.abs(ref).max()
    assert err < 5e-5, err


@pytest.mark.parametrize("ny,nx", [(12, 9), (13, 9)])
def test_pallas_twisted_factor_layout(ny, nx):
    """Two-chain (nsteps+1, nxp, nxp) block layout maps back to the XLA g."""
    pytest.importorskip("jax.experimental.pallas")
    from waveforminversionust_tpu.ops.pallas_twisted import (
        twisted_factor_pallas)
    from waveforminversionust_tpu.ops.twisted import middle_row

    coeffs = _random_planes(ny, nx, seed=5)
    m = middle_row(ny)
    ref = twisted_factor_cpx(coeffs, m=m)
    fac = twisted_factor_pallas(coeffs, interpret=True)
    assert fac.m == m
    nsteps = fac.g_down.re.shape[0] - 1
    assert nsteps == ny - 1 - m
    for y in range(ny):
        if y < m:
            blk = fac.g_down[y]
        elif y == m:
            blk = fac.g_down[nsteps]
        else:
            blk = fac.g_up[ny - 1 - y]
        got = _to_c(blk)[:nx, :nx]
        want = _to_c(ref.g[y])
        err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-30)
        assert err < 5e-5, (y, err)


@pytest.mark.parametrize("adjoint", [False, True])
def test_solve_helmholtz_twisted_config(adjoint):
    """factorization='twisted' end-to-end through the public solve."""
    import waveforminversionust_tpu as wi
    from waveforminversionust_tpu.ops.solve import (helmholtz_operator_solve,
                                                    make_helmholtz_operator)

    grid = Grid2D.centered(16e-3, 0.8e-3)  # 41x41
    acq = wi.build_ring_acquisition(
        grid, AcquisitionConfig(num_elements=8, radius=13e-3,
                                num_excluded_each_side=1))
    vel = jnp.full(grid.shape, 1500.0, jnp.float32)
    src = cpx.of(acq.source_fields())
    cfg = SolverConfig(split_complex=True, factorization="twisted",
                       pml=PMLConfig(l_pml=3.2e-3))
    op = make_helmholtz_operator(vel, 350e3, grid, cfg)
    u = helmholtz_operator_solve(op, src, grid, cfg, adjoint=adjoint)

    ref_cfg = SolverConfig(split_complex=True, factorization="thomas",
                           pml=PMLConfig(l_pml=3.2e-3))
    op_ref = make_helmholtz_operator(vel, 350e3, grid, ref_cfg)
    u_ref = helmholtz_operator_solve(op_ref, src, grid, ref_cfg,
                                     adjoint=adjoint)
    a, r = _to_c(u), _to_c(u_ref)
    err = np.abs(a - r).max() / np.abs(r).max()
    assert err < 5e-5, err


def test_twisted_factor_pallas_rejects_off_center_m():
    """The fused sweeps support only m <= ny-1-m (top chain shorter); an
    off-center m must be rejected at factor time with an actionable error,
    not a bare trace-time assert in the solve (round-4 advisor note)."""
    from waveforminversionust_tpu.ops.pallas_twisted import \
        twisted_factor_pallas

    planes = _random_planes(9, 8)
    with pytest.raises(ValueError, match="m <= ny-1-m"):
        twisted_factor_pallas(planes, interpret=True, m=6)
    for bad in (0, 8):
        with pytest.raises(ValueError, match="out of range"):
            twisted_factor_pallas(planes, interpret=True, m=bad)
