"""Cyclic-reduction factorization vs dense numpy and the block-Thomas solver."""

import jax.numpy as jnp
import numpy as np
import pytest

from waveforminversionust_tpu import Grid2D, PMLConfig
from waveforminversionust_tpu.ops import cpx
from waveforminversionust_tpu.ops.cpx import Cpx
from waveforminversionust_tpu.ops.cyclic import cr_factor_cpx, cr_solve_cpx
from waveforminversionust_tpu.ops.split_engine import (banded_factor_cpx,
                                                       banded_solve_cpx,
                                                       helmholtz_coefficients_cpx)


def _random_planes(rng, ny, nx):
    """Random 9 coefficient planes with the solver's structural zeros
    (Dirichlet-style boundary) and a dominant center for invertibility."""
    c = (rng.standard_normal((9, ny, nx)) + 1j * rng.standard_normal((9, ny, nx)))
    c = c.astype(np.complex64)
    c[0] += 6.0  # diagonal dominance
    # structural zeros: first/last row and column couple only via center
    for s in range(1, 9):
        c[s, 0, :] = 0
        c[s, -1, :] = 0
        c[s, :, 0] = 0
        c[s, :, -1] = 0
    return c


def _dense_from_planes(c):
    """Row-major (y*nx + x) dense assembly of the 9-plane operator."""
    from waveforminversionust_tpu.ops.stencil import STENCIL_OFFSETS
    _, ny, nx = c.shape
    n = ny * nx
    a = np.zeros((n, n), np.complex64)
    for s, (dy, dx) in enumerate(STENCIL_OFFSETS):
        for y in range(ny):
            yy = y + dy
            if not (0 <= yy < ny):
                continue
            for x in range(nx):
                xx = x + dx
                if not (0 <= xx < nx):
                    continue
                a[y * nx + x, yy * nx + xx] = c[s, y, x]
    return a


@pytest.mark.parametrize("ny,nx", [(9, 12), (8, 12), (2, 8), (16, 8), (1, 8)])
def test_cr_solve_matches_dense(rng, ny, nx):
    c = _random_planes(rng, ny, nx)
    a = _dense_from_planes(c).astype(np.complex128)
    rhs = (rng.standard_normal((3, ny, nx))
           + 1j * rng.standard_normal((3, ny, nx))).astype(np.complex64)

    factor = cr_factor_cpx(cpx.of(jnp.asarray(c)), block=8)
    for adjoint in (False, True):
        out = cr_solve_cpx(factor, cpx.of(jnp.asarray(rhs)), adjoint=adjoint)
        got = (np.asarray(out.re) + 1j * np.asarray(out.im)).reshape(3, -1)
        mat = a.conj().T if adjoint else a
        want = np.linalg.solve(mat, rhs.reshape(3, -1).T).T
        rel = (np.linalg.norm(got - want, axis=1)
               / np.linalg.norm(want, axis=1)).max()
        assert rel < 1e-4, (ny, nx, adjoint, rel)


def test_cr_matches_block_thomas_on_helmholtz(rng):
    """CR and block-Thomas agree on a real Helmholtz system (61x61,
    350 kHz, PML + Dirichlet), forward and adjoint, multi-RHS."""
    grid = Grid2D.centered(24e-3, 0.8e-3)  # 61x61
    vel = jnp.asarray(1500.0 + 40 * rng.standard_normal(grid.shape),
                      jnp.float32)
    coeffs = helmholtz_coefficients_cpx(vel, grid, jnp.float32(350e3),
                                        PMLConfig(l_pml=4e-3))
    rhs_np = np.zeros((4, 61, 61), np.complex64)
    rhs_np[0, 30, 30] = 1.0
    rhs_np[1, 20, 40] = 1.0 - 0.5j
    rhs_np[2, 45, 15] = 2.0j
    rhs_np[3, 10, 10] = -1.0
    rhs = cpx.of(jnp.asarray(rhs_np))

    thomas = banded_factor_cpx(coeffs)
    cr = cr_factor_cpx(coeffs, block=32)
    for adjoint in (False, True):
        want = banded_solve_cpx(thomas, rhs, adjoint=adjoint)
        got = cr_solve_cpx(cr, rhs, adjoint=adjoint)
        w = np.asarray(want.re) + 1j * np.asarray(want.im)
        g = np.asarray(got.re) + 1j * np.asarray(got.im)
        rel = np.linalg.norm(g - w) / np.linalg.norm(w)
        assert rel < 5e-4, (adjoint, rel)


def test_cr_helmholtz_true_residual(rng):
    """||H x - b|| / ||b|| of the CR solve on the Helmholtz system."""
    from waveforminversionust_tpu.ops.split_engine import h_apply_cpx

    grid = Grid2D.centered(24e-3, 0.8e-3)
    vel = jnp.full(grid.shape, 1500.0, jnp.float32)
    coeffs = helmholtz_coefficients_cpx(vel, grid, jnp.float32(350e3),
                                        PMLConfig(l_pml=4e-3))
    rhs_np = np.zeros((2, 61, 61), np.complex64)
    rhs_np[0, 30, 30] = 1.0
    rhs_np[1, 16, 44] = 1.0j
    rhs = cpx.of(jnp.asarray(rhs_np))

    factor = cr_factor_cpx(coeffs)
    x = cr_solve_cpx(factor, rhs)
    r = h_apply_cpx(coeffs, x) - rhs
    rel = (np.sqrt(np.asarray(cpx.abs2(r)).sum())
           / np.sqrt(np.asarray(cpx.abs2(rhs)).sum()))
    assert rel < 1e-4, rel


def test_solve_helmholtz_cr_config(rng):
    """Public entry point with factorization='cr' matches the default
    block-Thomas result (split engine)."""
    import dataclasses
    from waveforminversionust_tpu import SolverConfig, solve_helmholtz

    grid = Grid2D.centered(24e-3, 0.8e-3)
    vel = jnp.asarray(1500.0 + 30 * rng.standard_normal(grid.shape),
                      jnp.float32)
    src_np = np.zeros((3, 61, 61), np.complex64)
    src_np[0, 30, 30] = 1.0
    src_np[1, 12, 48] = 1.0j
    src_np[2, 48, 12] = -1.0 + 2.0j
    cfg_cr = SolverConfig(split_complex=True, factorization="cr",
                          pml=PMLConfig(l_pml=4e-3))
    cfg_th = dataclasses.replace(cfg_cr, factorization="thomas")

    u_cr, info = solve_helmholtz(vel, cpx.of(jnp.asarray(src_np)), 350e3,
                                 grid, cfg_cr)
    u_th, _ = solve_helmholtz(vel, cpx.of(jnp.asarray(src_np)), 350e3,
                              grid, cfg_th)
    assert float(np.asarray(info.rel_residual).max()) < 1e-4
    g = np.asarray(u_cr.re) + 1j * np.asarray(u_cr.im)
    w = np.asarray(u_th.re) + 1j * np.asarray(u_th.im)
    assert np.linalg.norm(g - w) / np.linalg.norm(w) < 5e-4


def test_cg_iteration_cr_matches_thomas(rng):
    """Full CG inversion (2 iterations) with the CR factorization matches
    block-Thomas: same loss trajectory, same velocity."""
    from waveforminversionust_tpu import (AcquisitionConfig, FWIConfig,
                                          SolverConfig)
    from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
    from waveforminversionust_tpu.fwi.objective import build_fwi_data
    from waveforminversionust_tpu.fwi.optimizers import nonlinear_cg
    from waveforminversionust_tpu.models.acquisition import build_ring_acquisition
    from waveforminversionust_tpu.models.phantom import smooth_blob_phantom

    grid = Grid2D.centered(24e-3, 0.8e-3)
    acq_cfg = AcquisitionConfig(num_elements=24, radius=18e-3,
                                num_excluded_each_side=2)
    solver_th = SolverConfig(split_complex=True, pml=PMLConfig(l_pml=4e-3))
    import dataclasses
    solver_cr = dataclasses.replace(solver_th, factorization="cr")
    vel_true = smooth_blob_phantom(grid, radius=8e-3, dc=30)
    ds = synthesize_ring_dataset(vel_true, grid, acq_cfg, f=200e3, seed=0,
                                 solver=SolverConfig(pml=PMLConfig(l_pml=4e-3)))
    acq = build_ring_acquisition(grid, acq_cfg, x_elem=ds.x_circ,
                                 y_elem=ds.y_circ)
    data = build_fwi_data(acq, ds.rec_data, 200e3, split=True)
    vel0 = jnp.full(grid.shape, 1500.0, jnp.float32)
    fwi = FWIConfig(num_iterations=2)

    r_th = nonlinear_cg(vel0, data, grid, solver_th, fwi)
    r_cr = nonlinear_cg(vel0, data, grid, solver_cr, fwi)
    np.testing.assert_allclose(np.asarray(r_cr.metrics.loss),
                               np.asarray(r_th.metrics.loss), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(r_cr.velocity),
                               np.asarray(r_th.velocity),
                               atol=2e-3 * float(np.abs(np.asarray(r_th.velocity)).max()))
