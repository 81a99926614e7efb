"""Distributed SPIKE solve on the virtual 8-device CPU mesh: the
grid-sharded factorization + solve must match the single-device block-Thomas
direct solver (forward AND adjoint), unlocking grids beyond one chip
(SURVEY.md section 2 'grid domain decomposition')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from waveforminversionust_tpu import Grid2D, PMLConfig, SolverConfig
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom
from waveforminversionust_tpu.ops import cpx
from waveforminversionust_tpu.ops.cpx import Cpx
from waveforminversionust_tpu.ops.split_engine import (
    banded_factor_cpx, banded_solve_cpx, h_apply_cpx,
    helmholtz_coefficients_cpx)
from waveforminversionust_tpu.parallel.spike import (
    spike_factor, spike_helmholtz_factor, spike_helmholtz_solve, spike_solve)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

F = 200e3


def _grid_mesh():
    return Mesh(np.array(jax.devices()[:8]), ("grid",))


def _setup(h=0.8e-3):
    # Non-square grid with ny = 64 (divisible by 8): exercises the slab
    # math including rectangular-grid indexing.
    grid = Grid2D.centered(12e-3, h, ymax=25.2e-3)
    assert grid.ny == 64 and grid.nx == 31
    ny, nx = grid.ny, grid.nx
    vel = smooth_blob_phantom(grid, radius=6e-3, dc=40)
    rng = np.random.default_rng(0)
    src = Cpx(jnp.asarray(rng.standard_normal((3, ny, nx)), jnp.float32)
              * 0.01,
              jnp.asarray(rng.standard_normal((3, ny, nx)), jnp.float32)
              * 0.01)
    cfg = SolverConfig(split_complex=True, pml=PMLConfig(l_pml=4e-3))
    coeffs = helmholtz_coefficients_cpx(vel, grid, F, cfg.pml, cfg.stencil)
    return grid, vel, src, cfg, coeffs


def test_spike_solve_matches_thomas_forward_and_adjoint():
    grid, vel, src, cfg, coeffs = _setup()
    mesh = _grid_mesh()

    ref_factor = banded_factor_cpx(coeffs)
    sp_factor = spike_factor(coeffs, mesh)

    for adjoint in (False, True):
        x_ref = banded_solve_cpx(ref_factor, src, adjoint=adjoint)
        x_sp = spike_solve(sp_factor, src, mesh, adjoint=adjoint)
        a = cpx.to_numpy(x_sp)
        b = cpx.to_numpy(x_ref)
        rel = np.linalg.norm(a - b) / np.linalg.norm(b)
        assert rel < 1e-4, (adjoint, rel)
        # true residual of the sharded solution
        op = (lambda v: h_apply_cpx(coeffs, v))
        if adjoint:
            from waveforminversionust_tpu.ops.split_engine import \
                h_apply_adjoint_cpx
            op = (lambda v: h_apply_adjoint_cpx(coeffs, v))
        r = cpx.to_numpy(op(x_sp) - src)
        res = np.linalg.norm(r) / np.linalg.norm(cpx.to_numpy(src))
        assert res < 1e-4, (adjoint, res)


def test_spike_helmholtz_wrapper_matches_operator_path():
    """The Helmholtz-level wrapper (with Dirichlet-row bookkeeping) matches
    helmholtz_operator_solve on sharded inputs."""
    from waveforminversionust_tpu.ops.solve import (helmholtz_operator_solve,
                                                    make_helmholtz_operator)

    grid, vel, src, cfg, coeffs = _setup()
    mesh = _grid_mesh()

    # shard the velocity and sources over the row axis
    vsh = jax.device_put(vel, NamedSharding(mesh, P("grid")))
    ssh = Cpx(jax.device_put(src.re, NamedSharding(mesh, P(None, "grid"))),
              jax.device_put(src.im, NamedSharding(mesh, P(None, "grid"))))

    factor = spike_helmholtz_factor(vsh, F, grid, mesh, cfg)
    op = make_helmholtz_operator(vel, F, grid, cfg)

    for adjoint in (False, True):
        u_sp = spike_helmholtz_solve(factor, ssh, grid, mesh,
                                     adjoint=adjoint)
        u_ref = helmholtz_operator_solve(op, src, grid, cfg, adjoint=adjoint)
        a, b = cpx.to_numpy(u_sp), cpx.to_numpy(u_ref)
        rel = np.linalg.norm(a - b) / np.linalg.norm(b)
        assert rel < 1e-4, (adjoint, rel)


def test_spike_cg_matches_single_device():
    """The FULL nonlinear-CG inversion runs grid-sharded end to end
    (SolverConfig(factorization='spike') + nonlinear_cg(mesh=...)) and its
    trajectory matches the single-device inversion — the 'grid' mesh axis
    above the solver layer (SURVEY.md section 2 'grid domain
    decomposition'; the reference cannot shard anything)."""
    import dataclasses

    from waveforminversionust_tpu import AcquisitionConfig, FWIConfig
    from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
    from waveforminversionust_tpu.fwi.objective import build_fwi_data
    from waveforminversionust_tpu.fwi.optimizers import nonlinear_cg
    from waveforminversionust_tpu.models.acquisition import \
        build_ring_acquisition
    from waveforminversionust_tpu.parallel.sharding import shard_fwi_data_grid

    grid = Grid2D.centered(12e-3, 0.8e-3, ymax=25.2e-3)  # ny=64, nx=31
    acq_cfg = AcquisitionConfig(num_elements=8, radius=9e-3,
                                num_excluded_each_side=1)
    cfg = SolverConfig(split_complex=True, pml=PMLConfig(l_pml=2.4e-3))
    vel_true = smooth_blob_phantom(grid, radius=5e-3, dc=30)
    ds = synthesize_ring_dataset(vel_true, grid, acq_cfg, f=F, solver=cfg,
                                 seed=3)
    acq = build_ring_acquisition(grid, acq_cfg, x_elem=ds.x_circ,
                                 y_elem=ds.y_circ)
    data = build_fwi_data(acq, ds.rec_data, F, split=True)
    fwi = FWIConfig(num_iterations=2)
    vel0 = jnp.full(grid.shape, 1500.0, jnp.float32)

    ref = nonlinear_cg(vel0, data, grid, cfg, fwi)

    mesh = _grid_mesh()
    cfg_sp = dataclasses.replace(cfg, factorization="spike")
    data_sh = shard_fwi_data_grid(data, mesh)
    sp = nonlinear_cg(vel0, data_sh, grid, cfg_sp, fwi, mesh=mesh)

    v_ref = np.asarray(ref.velocity)
    v_sp = np.asarray(sp.velocity)
    assert np.linalg.norm(v_sp - v_ref) / np.linalg.norm(v_ref) < 1e-4
    np.testing.assert_allclose(np.asarray(sp.metrics.loss),
                               np.asarray(ref.metrics.loss), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(sp.metrics.step_size),
                               np.asarray(ref.metrics.step_size), rtol=1e-3)


def test_spike_cg_shot_grid_mesh_matches_single_device():
    """Shot data parallelism COMPOSED with the grid decomposition: the
    full CG inversion on a 2x4 ("shot", "grid") mesh — transmit batch
    sharded over "shot", SPIKE rows over "grid" (spike_solve
    batch_axis, auto-detected from the mesh by helmholtz_operator_solve)
    — matches the single-device trajectory. This is the 2D analog of a
    production (dp x model-parallel) mesh: each shot group runs its own
    RHS shard against a shot-replicated factor, and GSPMD places the
    cross-shot gradient/misfit reductions."""
    import dataclasses

    from waveforminversionust_tpu import AcquisitionConfig, FWIConfig
    from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
    from waveforminversionust_tpu.fwi.objective import build_fwi_data
    from waveforminversionust_tpu.fwi.optimizers import nonlinear_cg
    from waveforminversionust_tpu.models.acquisition import \
        build_ring_acquisition
    from waveforminversionust_tpu.parallel.sharding import (
        shard_fwi_data_shot_grid, shot_grid_mesh)

    grid = Grid2D.centered(12e-3, 0.8e-3, ymax=25.2e-3)  # ny=64, nx=31
    acq_cfg = AcquisitionConfig(num_elements=8, radius=9e-3,
                                num_excluded_each_side=1)
    cfg = SolverConfig(split_complex=True, pml=PMLConfig(l_pml=2.4e-3))
    vel_true = smooth_blob_phantom(grid, radius=5e-3, dc=30)
    ds = synthesize_ring_dataset(vel_true, grid, acq_cfg, f=F, solver=cfg,
                                 seed=3)
    acq = build_ring_acquisition(grid, acq_cfg, x_elem=ds.x_circ,
                                 y_elem=ds.y_circ)
    data = build_fwi_data(acq, ds.rec_data, F, split=True)
    assert data.src.re.shape[0] == 8  # 8 tx over shot=2
    fwi = FWIConfig(num_iterations=2)
    vel0 = jnp.full(grid.shape, 1500.0, jnp.float32)

    ref = nonlinear_cg(vel0, data, grid, cfg, fwi)

    mesh = shot_grid_mesh(2, 4, devices=jax.devices()[:8])
    cfg_sp = dataclasses.replace(cfg, factorization="spike")
    data_sh = shard_fwi_data_shot_grid(data, mesh)
    sp = nonlinear_cg(vel0, data_sh, grid, cfg_sp, fwi, mesh=mesh)

    v_ref, v_sp = np.asarray(ref.velocity), np.asarray(sp.velocity)
    assert np.linalg.norm(v_sp - v_ref) / np.linalg.norm(v_ref) < 1e-4
    np.testing.assert_allclose(np.asarray(sp.metrics.loss),
                               np.asarray(ref.metrics.loss), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(sp.metrics.step_size),
                               np.asarray(ref.metrics.step_size), rtol=1e-3)


@pytest.mark.slow
def test_spike_cg_beyond_one_chip_grid():
    """A 1024-row-class inversion — the grid size SPIKE exists for — drives
    the full CG loop on the 8-device mesh: 1024 grid rows, one 128-row slab
    per device, finite decreasing loss. (The reference's host solver tops
    out at 301^2 in ~5 s/iter; this grid class would not even fit one
    factorization per chip at production nx.)"""
    import dataclasses

    from waveforminversionust_tpu import AcquisitionConfig, FWIConfig
    from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
    from waveforminversionust_tpu.fwi.objective import build_fwi_data
    from waveforminversionust_tpu.fwi.optimizers import nonlinear_cg
    from waveforminversionust_tpu.models.acquisition import \
        build_ring_acquisition
    from waveforminversionust_tpu.parallel.sharding import shard_fwi_data_grid

    grid = Grid2D.centered(24.8e-3, 0.8e-3, ymax=409.2e-3)
    assert grid.ny == 1024 and grid.nx == 63
    acq_cfg = AcquisitionConfig(num_elements=8, radius=18e-3,
                                num_excluded_each_side=1)
    cfg = SolverConfig(split_complex=True, factorization="spike",
                       pml=PMLConfig(l_pml=4e-3))
    vel_true = smooth_blob_phantom(grid, radius=8e-3, dc=30)
    ds = synthesize_ring_dataset(vel_true, grid, acq_cfg, f=F,
                                 solver=dataclasses.replace(
                                     cfg, factorization="auto"), seed=5)
    acq = build_ring_acquisition(grid, acq_cfg, x_elem=ds.x_circ,
                                 y_elem=ds.y_circ)
    mesh = _grid_mesh()
    data = shard_fwi_data_grid(build_fwi_data(acq, ds.rec_data, F,
                                              split=True), mesh)
    vel0 = jnp.full(grid.shape, 1500.0, jnp.float32)
    res = nonlinear_cg(vel0, data, grid, cfg, FWIConfig(num_iterations=2),
                       mesh=mesh)
    loss = np.asarray(res.metrics.loss)
    assert np.all(np.isfinite(loss)), loss
    assert loss[-1] < loss[0], loss
    assert np.all(np.isfinite(np.asarray(res.velocity)))


def test_spike_large_grid_runs_sharded():
    """A 1024-row solve (beyond-one-chip class) runs on the 8-device mesh
    and satisfies its own residual."""
    h = 0.8e-3
    # CPU-sized stand-in with the same slab structure (ny=256, nx=61).
    grid = Grid2D.centered(24e-3, h, ymax=102e-3)
    assert grid.ny % 8 == 0
    ny, nx = grid.ny, grid.nx
    vel = smooth_blob_phantom(grid, radius=10e-3, dc=40)
    cfg = SolverConfig(split_complex=True, pml=PMLConfig(l_pml=4e-3))
    coeffs = helmholtz_coefficients_cpx(vel, grid, F, cfg.pml, cfg.stencil)
    rng = np.random.default_rng(1)
    src = Cpx(jnp.asarray(rng.standard_normal((2, ny, nx)), jnp.float32),
              jnp.asarray(rng.standard_normal((2, ny, nx)), jnp.float32))
    mesh = _grid_mesh()
    factor = spike_factor(coeffs, mesh)
    x = spike_solve(factor, src, mesh)
    r = cpx.to_numpy(h_apply_cpx(coeffs, x) - src)
    res = np.linalg.norm(r) / np.linalg.norm(cpx.to_numpy(src))
    assert res < 1e-4, res


def test_spike_gauss_newton_matches_single_device():
    """The Gauss-Newton inversion runs grid-sharded end to end
    (run_gauss_newton(mesh=...) with factorization='spike'): every
    factorization/solve of the Newton-CG — forward, adjoint, inner Hvps,
    backtracking trials — is the distributed SPIKE elimination, and the
    trajectory matches single-device execution."""
    import dataclasses

    from waveforminversionust_tpu import AcquisitionConfig, FWIConfig
    from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
    from waveforminversionust_tpu.fwi.newton import run_gauss_newton
    from waveforminversionust_tpu.fwi.objective import build_fwi_data
    from waveforminversionust_tpu.models.acquisition import \
        build_ring_acquisition
    from waveforminversionust_tpu.parallel.sharding import shard_fwi_data_grid

    grid = Grid2D.centered(12e-3, 0.8e-3, ymax=25.2e-3)  # ny=64, nx=31
    acq_cfg = AcquisitionConfig(num_elements=8, radius=9e-3,
                                num_excluded_each_side=1)
    cfg = SolverConfig(split_complex=True, pml=PMLConfig(l_pml=2.4e-3))
    vel_true = smooth_blob_phantom(grid, radius=5e-3, dc=30)
    ds = synthesize_ring_dataset(vel_true, grid, acq_cfg, f=F, solver=cfg,
                                 seed=3)
    acq = build_ring_acquisition(grid, acq_cfg, x_elem=ds.x_circ,
                                 y_elem=ds.y_circ)
    data = build_fwi_data(acq, ds.rec_data, F, split=True)
    fwi = FWIConfig()
    vel0 = jnp.full(grid.shape, 1500.0, jnp.float32)

    ref = run_gauss_newton(vel0, data, grid, cfg, fwi=fwi,
                           num_iterations=2, cg_iters=4)

    mesh = _grid_mesh()
    cfg_sp = dataclasses.replace(cfg, factorization="spike")
    sp = run_gauss_newton(vel0, shard_fwi_data_grid(data, mesh), grid,
                          cfg_sp, fwi=fwi, num_iterations=2, cg_iters=4,
                          mesh=mesh)

    v_ref = np.asarray(ref.velocity)
    v_sp = np.asarray(sp.velocity)
    assert np.linalg.norm(v_sp - v_ref) / np.linalg.norm(v_ref) < 1e-4
    np.testing.assert_allclose(np.asarray(sp.metrics.loss),
                               np.asarray(ref.metrics.loss), rtol=1e-3)
