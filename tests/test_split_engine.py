"""Split-complex engine vs the native-complex oracle implementations."""

import jax.numpy as jnp
import pytest
import numpy as np

from waveforminversionust_tpu import Grid2D, PMLConfig
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom
from waveforminversionust_tpu.ops import apply, cpx
from waveforminversionust_tpu.ops.banded import banded_factor, banded_solve
from waveforminversionust_tpu.ops.split_engine import (banded_factor_cpx,
                                                       banded_solve_cpx,
                                                       h_apply_adjoint_cpx,
                                                       h_apply_cpx,
                                                       helmholtz_coefficients_cpx)
from waveforminversionust_tpu.ops.stencil import helmholtz_coefficients

F = 350e3
PML = PMLConfig(l_pml=2.4e-3)


def _setup(rng, nxh=12e-3):
    grid = Grid2D.centered(nxh, 0.8e-3)
    vel = smooth_blob_phantom(grid, radius=4e-3, dc=40)
    shape = (3,) + grid.shape
    u = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)
    return grid, vel, u


def test_coefficients_match(rng):
    grid, vel, _ = _setup(rng)
    native = np.asarray(helmholtz_coefficients(jnp.array(vel), grid,
                                               jnp.float32(F), PML))
    split = cpx.to_numpy(helmholtz_coefficients_cpx(vel, grid,
                                                    jnp.float32(F), PML))
    np.testing.assert_allclose(split, native, rtol=0,
                               atol=2e-6 * np.abs(native).max())


def test_apply_matches(rng):
    grid, vel, u = _setup(rng)
    coeffs = helmholtz_coefficients(jnp.array(vel), grid, jnp.float32(F), PML)
    coeffs_s = helmholtz_coefficients_cpx(vel, grid, jnp.float32(F), PML)
    ref = np.asarray(apply.h_apply(coeffs, jnp.array(u)))
    out = cpx.to_numpy(h_apply_cpx(coeffs_s, cpx.of(u)))
    np.testing.assert_allclose(out, ref, atol=2e-5 * np.abs(ref).max())
    refa = np.asarray(apply.h_apply_adjoint(coeffs, jnp.array(u)))
    outa = cpx.to_numpy(h_apply_adjoint_cpx(coeffs_s, cpx.of(u)))
    np.testing.assert_allclose(outa, refa, atol=2e-5 * np.abs(refa).max())


def test_banded_matches(rng):
    grid, vel, _ = _setup(rng)
    ny, nx = grid.shape
    src = np.zeros((2, ny, nx), np.complex64)
    src[0, ny // 2, nx // 2] = 1.0
    src[1, ny // 3, 2 * nx // 3] = 1.0 - 0.5j

    coeffs = helmholtz_coefficients(jnp.array(vel), grid, jnp.float32(F), PML)
    fac = banded_factor(coeffs)
    x_ref = np.asarray(banded_solve(fac, jnp.array(src)))
    xa_ref = np.asarray(banded_solve(fac, jnp.array(src), adjoint=True))

    coeffs_s = helmholtz_coefficients_cpx(vel, grid, jnp.float32(F), PML)
    fac_s = banded_factor_cpx(coeffs_s)
    x = cpx.to_numpy(banded_solve_cpx(fac_s, cpx.of(src)))
    xa = cpx.to_numpy(banded_solve_cpx(fac_s, cpx.of(src), adjoint=True))

    assert np.abs(x - x_ref).max() < 2e-5 * np.abs(x_ref).max()
    assert np.abs(xa - xa_ref).max() < 2e-5 * np.abs(xa_ref).max()
    # residual of the split solution against the split operator
    r = cpx.to_numpy(h_apply_cpx(coeffs_s, cpx.of(x.astype(np.complex64)))) - src
    rel = np.linalg.norm(r.reshape(2, -1), axis=1) / np.linalg.norm(src.reshape(2, -1), axis=1)
    assert rel.max() < 1e-4


def test_split_cg_matches_native():
    """The full CG inversion in split-complex mode equals the native path."""
    import dataclasses
    from waveforminversionust_tpu import (AcquisitionConfig, FWIConfig,
                                          SolverConfig)
    from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
    from waveforminversionust_tpu.fwi.objective import build_fwi_data
    from waveforminversionust_tpu.fwi.optimizers import nonlinear_cg
    from waveforminversionust_tpu.models.acquisition import build_ring_acquisition

    f = 200e3
    acq_cfg = AcquisitionConfig(num_elements=24, radius=9e-3,
                                num_excluded_each_side=2)
    solver = SolverConfig(pml=PMLConfig(l_pml=2.4e-3))
    grid = Grid2D.centered(12e-3, 0.8e-3)
    vel_true = smooth_blob_phantom(grid, radius=4e-3, dc=30)
    ds = synthesize_ring_dataset(vel_true, grid, acq_cfg, f=f, seed=0,
                                 solver=solver)
    acq = build_ring_acquisition(grid, acq_cfg, x_elem=ds.x_circ,
                                 y_elem=ds.y_circ)
    vel0 = jnp.full(grid.shape, 1500.0, jnp.float32)
    fwi = FWIConfig(num_iterations=3)

    data_n = build_fwi_data(acq, ds.rec_data, f)
    res_n = nonlinear_cg(vel0, data_n, grid, solver, fwi)

    solver_s = dataclasses.replace(solver, split_complex=True)
    data_s = build_fwi_data(acq, ds.rec_data, f, split=True)
    res_s = nonlinear_cg(vel0, data_s, grid, solver_s, fwi)

    np.testing.assert_allclose(np.asarray(res_s.metrics.loss),
                               np.asarray(res_n.metrics.loss), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(res_s.velocity),
                               np.asarray(res_n.velocity), atol=0.05)
    # split result fields come back as ComplexParts of matching shape
    assert res_s.wavefield.real.shape == (24,) + grid.shape


def test_split_born_matches_native(rng):
    from waveforminversionust_tpu import SolverConfig
    from waveforminversionust_tpu.ops.born import born_series_solve
    from waveforminversionust_tpu.ops.split_engine import born_series_solve_cpx

    grid = Grid2D.centered(24e-3, 0.8e-3)
    vel = smooth_blob_phantom(grid, radius=8e-3, dc=40)
    ny, nx = grid.shape
    src = np.zeros((2, ny, nx), np.complex64)
    src[0, ny // 2, nx // 2] = 1.0
    src[1, ny // 3, nx // 3] = 0.5 - 1.0j
    pml = SolverConfig().born_pml

    for adjoint in (False, True):
        ref, itn = born_series_solve(jnp.array(vel), jnp.array(src),
                                     jnp.float32(350e3), grid, pml,
                                     adjoint=adjoint)
        out, its = born_series_solve_cpx(vel, cpx.of(src), jnp.float32(350e3),
                                         grid, pml, adjoint=adjoint)
        assert int(its) == int(itn)
        ref = np.asarray(ref)
        got = cpx.to_numpy(out)
        assert np.abs(got - ref).max() < 5e-5 * np.abs(ref).max()


def test_split_cg_born_method_runs():
    import dataclasses
    from waveforminversionust_tpu import (AcquisitionConfig, FWIConfig,
                                          SolverConfig, SolverMethod)
    from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
    from waveforminversionust_tpu.fwi.objective import build_fwi_data
    from waveforminversionust_tpu.fwi.optimizers import nonlinear_cg
    from waveforminversionust_tpu.models.acquisition import build_ring_acquisition

    f = 200e3
    acq_cfg = AcquisitionConfig(num_elements=16, radius=9e-3,
                                num_excluded_each_side=2)
    solver = SolverConfig(pml=PMLConfig(l_pml=2.4e-3),
                          born_pml=PMLConfig(a0=20.0, l_pml=2.4e-3),
                          method=SolverMethod.BORN, split_complex=True)
    grid = Grid2D.centered(12e-3, 0.8e-3)
    vel_true = smooth_blob_phantom(grid, radius=4e-3, dc=30)
    ds = synthesize_ring_dataset(vel_true, grid, acq_cfg, f=f, seed=0,
                                 solver=SolverConfig(pml=PMLConfig(l_pml=2.4e-3)))
    acq = build_ring_acquisition(grid, acq_cfg, x_elem=ds.x_circ,
                                 y_elem=ds.y_circ)
    data = build_fwi_data(acq, ds.rec_data, f, split=True)
    res = nonlinear_cg(jnp.full(grid.shape, 1500.0, jnp.float32), data, grid,
                       solver, FWIConfig(num_iterations=2))
    losses = np.asarray(res.metrics.loss)
    assert np.all(np.isfinite(losses)) and losses[-1] < losses[0]


def test_split_vjp_matches_native_gradient(rng):
    """grad through the split differentiable solve == grad through the
    native custom-VJP path (which is FD-validated)."""
    import dataclasses
    import jax
    from waveforminversionust_tpu import SolverConfig
    from waveforminversionust_tpu.ops.solve import solve_helmholtz

    grid = Grid2D.centered(8e-3, 0.8e-3)
    vel = smooth_blob_phantom(grid, radius=3e-3, dc=60)
    ny, nx = grid.shape
    src = np.zeros((2, ny, nx), np.complex64)
    src[0, ny // 2, nx // 2 + 3] = 1.0
    src[1, ny // 2 - 2, nx // 2] = 0.5 - 0.25j
    cfg_n = SolverConfig(pml=PMLConfig(l_pml=2e-3), refine=2)
    cfg_s = dataclasses.replace(cfg_n, split_complex=True)

    w = np.cos(np.arange(ny * nx)).reshape(ny, nx).astype(np.float32)

    def loss_native(v):
        u, _ = solve_helmholtz(v, jnp.array(src), 350e3, grid, cfg_n)
        return jnp.sum(jnp.abs(u) ** 2 * (1.0 + 0.3 * w))

    def loss_split(v):
        u, _ = solve_helmholtz(v, src, 350e3, grid, cfg_s)
        return jnp.sum(cpx.abs2(u) * (1.0 + 0.3 * w))

    l_n = float(loss_native(jnp.array(vel)))
    l_s = float(loss_split(jnp.array(vel)))
    assert l_s == pytest.approx(l_n, rel=1e-4)

    g_n = np.asarray(jax.grad(loss_native)(jnp.array(vel)))
    g_s = np.asarray(jax.grad(loss_split)(jnp.array(vel)))
    np.testing.assert_allclose(g_s, g_n, atol=5e-4 * np.abs(g_n).max())

    # adjoint-mode solve too
    def loss_native_adj(v):
        u, _ = solve_helmholtz(v, jnp.array(src), 350e3, grid, cfg_n,
                               adjoint=True)
        return jnp.sum(jnp.abs(u) ** 2)

    def loss_split_adj(v):
        u, _ = solve_helmholtz(v, src, 350e3, grid, cfg_s, adjoint=True)
        return jnp.sum(cpx.abs2(u))

    g_n = np.asarray(jax.grad(loss_native_adj)(jnp.array(vel)))
    g_s = np.asarray(jax.grad(loss_split_adj)(jnp.array(vel)))
    np.testing.assert_allclose(g_s, g_n, atol=5e-4 * np.abs(g_n).max())


def test_split_lbfgs_runs():
    import dataclasses
    from waveforminversionust_tpu import (AcquisitionConfig, SolverConfig)
    from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
    from waveforminversionust_tpu.fwi.lbfgs import run_lbfgs
    from waveforminversionust_tpu.fwi.objective import build_fwi_data
    from waveforminversionust_tpu.models.acquisition import build_ring_acquisition

    f = 200e3
    acq_cfg = AcquisitionConfig(num_elements=16, radius=9e-3,
                                num_excluded_each_side=2)
    solver = SolverConfig(pml=PMLConfig(l_pml=2.4e-3))
    grid = Grid2D.centered(12e-3, 0.8e-3)
    vel_true = smooth_blob_phantom(grid, radius=4e-3, dc=30)
    ds = synthesize_ring_dataset(vel_true, grid, acq_cfg, f=f, seed=0,
                                 solver=solver)
    acq = build_ring_acquisition(grid, acq_cfg, x_elem=ds.x_circ,
                                 y_elem=ds.y_circ)
    solver_s = dataclasses.replace(solver, split_complex=True)
    data_s = build_fwi_data(acq, ds.rec_data, f, split=True)
    res = run_lbfgs(jnp.full(grid.shape, 1500.0, jnp.float32), data_s, grid,
                    solver_s, num_iterations=3)
    losses = np.asarray(res.loss_history)
    assert np.all(np.isfinite(losses)) and losses[-1] < losses[0]


def test_split_synthesize_matches_native():
    import dataclasses
    from waveforminversionust_tpu import AcquisitionConfig, SolverConfig
    from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset

    acq = AcquisitionConfig(num_elements=12, radius=9e-3,
                            num_excluded_each_side=1)
    solver = SolverConfig(pml=PMLConfig(l_pml=2.4e-3))
    grid = Grid2D.centered(12e-3, 0.8e-3)
    vel = smooth_blob_phantom(grid, radius=4e-3, dc=30)
    ds_n = synthesize_ring_dataset(vel, grid, acq, f=200e3, seed=1,
                                   solver=solver)
    ds_s = synthesize_ring_dataset(vel, grid, acq, f=200e3, seed=1,
                                   solver=dataclasses.replace(solver,
                                                              split_complex=True))
    np.testing.assert_allclose(ds_s.rec_data, ds_n.rec_data,
                               atol=2e-5 * np.abs(ds_n.rec_data).max())


def test_schulz_hybrid_factor_matches_exact(rng):
    """Opt-in warm-started Newton-Schulz factorization (with per-row exact
    fallback) matches the exact factorization's solve residuals."""
    grid, vel, _ = _setup(rng, nxh=24e-3)
    ny, nx = grid.shape
    src = np.zeros((2, ny, nx), np.complex64)
    src[0, ny // 2, nx // 2] = 1.0
    src[1, ny // 3, 2 * nx // 3] = 1.0
    coeffs = helmholtz_coefficients_cpx(vel, grid, jnp.float32(F), PML)
    s = cpx.of(src)
    for steps in (0, 4):
        fac = banded_factor_cpx(coeffs, schulz_steps=steps)
        x = banded_solve_cpx(fac, s)
        r = s - h_apply_cpx(coeffs, x)
        rel = np.sqrt(np.asarray(
            jnp.sum(cpx.abs2(r), axis=(1, 2)) / jnp.sum(cpx.abs2(s), axis=(1, 2))))
        assert rel.max() < 1e-4, (steps, rel)

    # rough model (worst case for the warm start): the fallback must keep
    # the solve finite and accurate
    vel_rough = vel + 40 * rng.standard_normal(grid.shape).astype(np.float32)
    coeffs_r = helmholtz_coefficients_cpx(jnp.clip(vel_rough, 1350, 1700),
                                          grid, jnp.float32(F), PML)
    fac = banded_factor_cpx(coeffs_r, schulz_steps=4)
    x = banded_solve_cpx(fac, s)
    r = s - h_apply_cpx(coeffs_r, x)
    rel = np.sqrt(np.asarray(
        jnp.sum(cpx.abs2(r), axis=(1, 2)) / jnp.sum(cpx.abs2(s), axis=(1, 2))))
    assert np.isfinite(rel).all()
    assert rel.max() < 1e-2, rel


def test_fast_sweep_ops_match_stock_sweeps(rng):
    """banded_solve_cpx with precomputed real-embedded sweep operators
    (prepare_sweep_ops) matches the stock banded sweeps, forward and
    adjoint."""
    import numpy as np
    from waveforminversionust_tpu.ops.split_engine import (
        banded_factor_cpx, banded_solve_cpx, helmholtz_coefficients_cpx)

    grid = Grid2D.centered(10e-3, 0.8e-3, ymax=12e-3)
    vel = smooth_blob_phantom(grid, radius=4e-3, dc=60)
    coeffs = helmholtz_coefficients_cpx(vel, grid, 350e3, PMLConfig(l_pml=2e-3))
    ny, nx = grid.shape
    b = cpx.Cpx(jnp.asarray(rng.standard_normal((3, ny, nx)), jnp.float32),
                jnp.asarray(rng.standard_normal((3, ny, nx)), jnp.float32))
    slow = banded_factor_cpx(coeffs)
    fast = banded_factor_cpx(coeffs, precompute_sweeps=True)
    assert fast.sweeps is not None
    for adjoint in (False, True):
        x_slow = cpx.to_numpy(banded_solve_cpx(slow, b, adjoint=adjoint))
        x_fast = cpx.to_numpy(banded_solve_cpx(fast, b, adjoint=adjoint))
        rel = np.linalg.norm(x_fast - x_slow) / np.linalg.norm(x_slow)
        assert rel < 1e-5, (adjoint, rel)
