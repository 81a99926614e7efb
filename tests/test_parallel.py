"""Multi-device tests on the virtual 8-device CPU mesh: shot-sharded
inversion must match single-device results; halo-exchange stencil application
must match the unsharded operator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from waveforminversionust_tpu import (AcquisitionConfig, FWIConfig, Grid2D,
                                      PMLConfig, SolverConfig)
from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
from waveforminversionust_tpu.fwi.objective import build_fwi_data
from waveforminversionust_tpu.fwi.optimizers import nonlinear_cg
from waveforminversionust_tpu.models.acquisition import build_ring_acquisition
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom
from waveforminversionust_tpu.ops.apply import h_apply
from waveforminversionust_tpu.ops.stencil import helmholtz_coefficients
from waveforminversionust_tpu.parallel.halo import make_grid_sharded_apply
from waveforminversionust_tpu.parallel.sharding import (shard_fwi_data,
                                                        shot_mesh)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_shot_sharded_cg_matches_single_device():
    """The jitted CG loop with shot-sharded inputs gives the same answer as
    unsharded execution (GSPMD inserts the cross-shot reductions)."""
    C0 = 1500.0
    f = 200e3
    acq_cfg = AcquisitionConfig(num_elements=32, radius=18e-3,
                                num_excluded_each_side=3)
    solver = SolverConfig(pml=PMLConfig(l_pml=4e-3))
    grid = Grid2D.centered(24e-3, 0.8e-3)
    vel_true = smooth_blob_phantom(grid, radius=8e-3, dc=30, c_bkgnd=C0)
    ds = synthesize_ring_dataset(vel_true, grid, acq_cfg, f=f, seed=0,
                                 solver=solver)
    acq = build_ring_acquisition(grid, acq_cfg, x_elem=ds.x_circ,
                                 y_elem=ds.y_circ)
    data = build_fwi_data(acq, ds.rec_data, f)
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    fwi = FWIConfig(num_iterations=2)

    res_single = nonlinear_cg(vel0, data, grid, solver, fwi)

    mesh = shot_mesh()
    data_sharded = shard_fwi_data(data, mesh)
    res_sharded = nonlinear_cg(vel0, data_sharded, grid, solver, fwi)

    np.testing.assert_allclose(np.array(res_sharded.metrics.loss),
                               np.array(res_single.metrics.loss), rtol=1e-3)
    np.testing.assert_allclose(np.array(res_sharded.velocity),
                               np.array(res_single.velocity),
                               atol=1e-3 * float(jnp.abs(res_single.velocity).max()))


def test_shot_sharded_bilinear_attenuation_matches_single_device():
    """shard_fwi_data must preserve and correctly place the optional fields:
    bilinear receiver weights rx_w (shot-sharded) and the attenuation map
    (replicated). Regression: a _replace-less reconstruction silently reset
    both to None, so a sharded lossy inversion ran the lossless physics."""
    C0 = 1500.0
    f = 200e3
    acq_cfg = AcquisitionConfig(num_elements=32, radius=18e-3,
                                num_excluded_each_side=3,
                                interpolation="bilinear")
    solver = SolverConfig(pml=PMLConfig(l_pml=4e-3))
    grid = Grid2D.centered(24e-3, 0.8e-3)
    vel_true = smooth_blob_phantom(grid, radius=8e-3, dc=30, c_bkgnd=C0)
    alpha = jnp.full(grid.shape, 5.0, jnp.float32)  # mild uniform loss
    ds = synthesize_ring_dataset(vel_true, grid, acq_cfg, f=f, seed=0,
                                 solver=solver, attenuation=alpha)
    acq = build_ring_acquisition(grid, acq_cfg, x_elem=ds.x_circ,
                                 y_elem=ds.y_circ)
    data = build_fwi_data(acq, ds.rec_data, f, attenuation=alpha)
    assert data.rx_w is not None and data.attenuation is not None
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    fwi = FWIConfig(num_iterations=2)

    res_single = nonlinear_cg(vel0, data, grid, solver, fwi)

    mesh = shot_mesh()
    data_sharded = shard_fwi_data(data, mesh)
    assert data_sharded.rx_w is not None, "rx_w dropped by shard_fwi_data"
    assert data_sharded.attenuation is not None, \
        "attenuation dropped by shard_fwi_data"
    res_sharded = nonlinear_cg(vel0, data_sharded, grid, solver, fwi)

    np.testing.assert_allclose(np.asarray(res_sharded.metrics.loss),
                               np.asarray(res_single.metrics.loss), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(res_sharded.velocity),
                               np.asarray(res_single.velocity),
                               atol=1e-3 * float(jnp.abs(res_single.velocity).max()))


def test_halo_apply_matches_unsharded():
    grid = Grid2D(nx=24, ny=32, dx=0.8e-3, dy=0.8e-3, x0=-9.2e-3, y0=-12.4e-3)
    rng = np.random.default_rng(0)
    vel = (1500 + 50 * rng.standard_normal(grid.shape)).astype(np.float32)
    coeffs = helmholtz_coefficients(jnp.array(vel), grid, jnp.float32(350e3),
                                    PMLConfig(l_pml=2e-3))
    u = jnp.array((rng.standard_normal((3,) + grid.shape)
                   + 1j * rng.standard_normal((3,) + grid.shape))
                  .astype(np.complex64))

    ref = h_apply(coeffs, u)

    mesh = Mesh(np.array(jax.devices()[:8]), ("grid",))
    apply_sharded = make_grid_sharded_apply(mesh)
    sharding_c = NamedSharding(mesh, P(None, "grid", None))
    coeffs_s = jax.device_put(coeffs, sharding_c)
    u_s = jax.device_put(u, sharding_c)
    out = jax.jit(apply_sharded)(coeffs_s, u_s)

    np.testing.assert_allclose(np.array(out), np.array(ref),
                               atol=1e-5 * float(jnp.abs(ref).max()))


def test_shot_sharded_split_cg_matches_single_device():
    """Production path: split-complex engine + shot sharding."""
    import dataclasses
    C0 = 1500.0
    f = 200e3
    acq_cfg = AcquisitionConfig(num_elements=32, radius=18e-3,
                                num_excluded_each_side=3)
    solver = SolverConfig(pml=PMLConfig(l_pml=4e-3), split_complex=True)
    grid = Grid2D.centered(24e-3, 0.8e-3)
    vel_true = smooth_blob_phantom(grid, radius=8e-3, dc=30, c_bkgnd=C0)
    ds = synthesize_ring_dataset(vel_true, grid, acq_cfg, f=f, seed=0,
                                 solver=dataclasses.replace(solver,
                                                            split_complex=False))
    acq = build_ring_acquisition(grid, acq_cfg, x_elem=ds.x_circ,
                                 y_elem=ds.y_circ)
    data = build_fwi_data(acq, ds.rec_data, f, split=True)
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    fwi = FWIConfig(num_iterations=2)

    res_single = nonlinear_cg(vel0, data, grid, solver, fwi)

    mesh = shot_mesh()
    data_sharded = shard_fwi_data(data, mesh)  # polymorphic over Cpx
    res_sharded = nonlinear_cg(vel0, data_sharded, grid, solver, fwi)

    np.testing.assert_allclose(np.asarray(res_sharded.metrics.loss),
                               np.asarray(res_single.metrics.loss), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(res_sharded.velocity),
                               np.asarray(res_single.velocity),
                               atol=1e-3 * float(jnp.abs(res_single.velocity).max()))


def test_freq_shot_sharded_multifreq_matches_serial():
    """Joint multi-frequency CG executed over a 2x4 (freq, shot) mesh via
    shard_map (psum reductions) matches the single-device serial lax.map
    run (SURVEY.md section 2 'Frequency parallelism')."""
    from waveforminversionust_tpu.fwi.multifreq import (
        nonlinear_cg_multifreq, nonlinear_cg_multifreq_sharded,
        stack_frequencies)
    from waveforminversionust_tpu.models.acquisition import (ring_positions,
                                                             snap_to_grid)
    from waveforminversionust_tpu.parallel.sharding import (
        shard_multifreq_data, shot_freq_mesh)

    C0 = 1500.0
    acq_cfg = AcquisitionConfig(num_elements=32, radius=18e-3,
                                num_excluded_each_side=3)
    solver = SolverConfig(pml=PMLConfig(l_pml=4e-3))
    coarse = Grid2D.centered(24e-3, 0.8e-3)
    xe, ye = ring_positions(acq_cfg.num_elements, acq_cfg.radius)
    xi, yi = snap_to_grid(coarse, xe, ye)
    xs, ys = coarse.x[xi], coarse.y[yi]
    fine = Grid2D.centered(24e-3, 0.4e-3)
    true_vel_f = smooth_blob_phantom(fine, radius=8e-3, dc=30, c_bkgnd=C0)

    acq = build_ring_acquisition(coarse, acq_cfg, x_elem=xs, y_elem=ys)
    datas = []
    for fq in (120e3, 200e3):
        ds = synthesize_ring_dataset(true_vel_f, fine, acq_cfg, f=fq, seed=3,
                                     solver=solver, x_elem=xs, y_elem=ys)
        datas.append(build_fwi_data(acq, ds.rec_data, fq))
    mf = stack_frequencies(datas)
    vel0 = jnp.full(coarse.shape, C0, jnp.float32)
    fwi = FWIConfig(num_iterations=2)

    vel_serial, met_serial = nonlinear_cg_multifreq(vel0, mf, coarse, solver,
                                                    fwi)

    mesh = shot_freq_mesh(4, 2)
    mf_sharded = shard_multifreq_data(mf, mesh)
    vel_sharded, met_sharded = nonlinear_cg_multifreq_sharded(
        vel0, mf_sharded, coarse, mesh, solver, fwi)

    np.testing.assert_allclose(np.asarray(met_sharded.loss),
                               np.asarray(met_serial.loss), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(vel_sharded),
                               np.asarray(vel_serial),
                               atol=1e-3 * float(np.abs(vel_serial).max()))


def test_shot_sharded_3d_cg_matches_single_device():
    """3D FWI shot-sharded over the mesh == unsharded (the 3D Born operator
    is global in k-space, so the scalable axis is the transmit batch —
    GSPMD inserts the gradient/inner-product psums)."""
    from waveforminversionust_tpu.fwi.fwi3d import (build_fwi_data_3d,
                                                    nonlinear_cg_3d,
                                                    sample_receivers_3d)
    from waveforminversionust_tpu.models.acquisition3d import (
        build_acquisition3d, cylinder_positions, source_fields_3d)
    from waveforminversionust_tpu.models.grid3d import Grid3D
    from waveforminversionust_tpu.ops.born3d import born_series_solve_3d
    from waveforminversionust_tpu.parallel.sharding import shard_fwi_data_3d

    C0, f = 1500.0, 200e3
    pml = PMLConfig(a0=20.0, l_pml=6e-3)
    grid = Grid3D.centered(12e-3, 1.0e-3)
    pos = cylinder_positions(1, 8, 8e-3, 0.0)
    acq = build_acquisition3d(grid, pos, min_angle=0.8)
    z = grid.z0 + grid.dz * jnp.arange(grid.nz)
    y = grid.y0 + grid.dy * jnp.arange(grid.ny)
    x = grid.x0 + grid.dx * jnp.arange(grid.nx)
    r2 = (z[:, None, None] ** 2 + y[None, :, None] ** 2
          + x[None, None, :] ** 2)
    vel_true = (C0 + 40.0 * jnp.exp(-r2 / 4e-3 ** 2)).astype(jnp.float32)
    src = source_fields_3d(acq, grid)
    wv, _ = born_series_solve_3d(vel_true, src, f, grid, pml, iter_cap=400)
    rec_obs = sample_receivers_3d(wv, jnp.asarray(acq.rx_idx))
    data = build_fwi_data_3d(acq, rec_obs, f, grid)
    vel0 = jnp.full(grid.shape, C0, jnp.float32)

    vel_ref, m_ref = nonlinear_cg_3d(vel0, data, grid, num_iterations=2,
                                     pml=pml, iter_cap=400)

    mesh = shot_mesh()
    data_sh = shard_fwi_data_3d(data, mesh)
    vel_sh, m_sh = nonlinear_cg_3d(vel0, data_sh, grid, num_iterations=2,
                                   pml=pml, iter_cap=400)
    np.testing.assert_allclose(np.asarray(m_sh.loss), np.asarray(m_ref.loss),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(vel_sh), np.asarray(vel_ref),
                               rtol=5e-5, atol=5e-4)


def test_shot_sharded_gauss_newton_matches_single_device():
    """The Gauss-Newton loop with shot-sharded inputs matches unsharded
    execution: every Frechet/Hvp solve is batched over transmitters, so
    GSPMD shards the whole inner Newton-CG along the shot axis with psum'd
    reductions — no GN-specific communication code."""
    from waveforminversionust_tpu.fwi.newton import run_gauss_newton

    C0 = 1500.0
    f = 200e3
    acq_cfg = AcquisitionConfig(num_elements=32, radius=18e-3,
                                num_excluded_each_side=3)
    solver = SolverConfig(pml=PMLConfig(l_pml=4e-3))
    grid = Grid2D.centered(24e-3, 0.8e-3)
    vel_true = smooth_blob_phantom(grid, radius=8e-3, dc=30, c_bkgnd=C0)
    ds = synthesize_ring_dataset(vel_true, grid, acq_cfg, f=f, seed=0,
                                 solver=solver)
    acq = build_ring_acquisition(grid, acq_cfg, x_elem=ds.x_circ,
                                 y_elem=ds.y_circ)
    data = build_fwi_data(acq, ds.rec_data, f)
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    fwi = FWIConfig()

    res_single = run_gauss_newton(vel0, data, grid, solver, fwi=fwi,
                                  num_iterations=2, cg_iters=4)
    res_sharded = run_gauss_newton(vel0, shard_fwi_data(data, shot_mesh()),
                                   grid, solver, fwi=fwi,
                                   num_iterations=2, cg_iters=4)
    np.testing.assert_allclose(np.array(res_sharded.metrics.loss),
                               np.array(res_single.metrics.loss), rtol=1e-3)
    np.testing.assert_allclose(
        np.array(res_sharded.velocity), np.array(res_single.velocity),
        atol=1e-3 * float(jnp.abs(res_single.velocity).max()))


def test_shot_sharded_lbfgs_matches_single_device():
    """The reference's SECOND inversion path (autodiff L-BFGS, reference:
    fwi_loss_function.py:106-132) with shot-sharded inputs matches
    single-device execution: the value_and_grad through the custom-VJP
    solve batches over transmitters, so GSPMD shards the forward AND the
    adjoint (backward) solve plus the misfit reductions along the shot
    axis — same story as the CG path."""
    from waveforminversionust_tpu.fwi.lbfgs import run_lbfgs

    C0 = 1500.0
    f = 200e3
    acq_cfg = AcquisitionConfig(num_elements=32, radius=18e-3,
                                num_excluded_each_side=3)
    solver = SolverConfig(pml=PMLConfig(l_pml=4e-3))
    grid = Grid2D.centered(24e-3, 0.8e-3)
    vel_true = smooth_blob_phantom(grid, radius=8e-3, dc=30, c_bkgnd=C0)
    ds = synthesize_ring_dataset(vel_true, grid, acq_cfg, f=f, seed=0,
                                 solver=solver)
    acq = build_ring_acquisition(grid, acq_cfg, x_elem=ds.x_circ,
                                 y_elem=ds.y_circ)
    data = build_fwi_data(acq, ds.rec_data, f)
    vel0 = jnp.full(grid.shape, C0, jnp.float32)

    res_single = run_lbfgs(vel0, data, grid, solver, num_iterations=3)
    res_sharded = run_lbfgs(vel0, shard_fwi_data(data, shot_mesh()),
                            grid, solver, num_iterations=3)

    loss_ref = np.asarray(res_single.loss_history)
    assert np.all(np.isfinite(loss_ref)) and loss_ref[-1] < loss_ref[0]
    np.testing.assert_allclose(np.asarray(res_sharded.loss_history),
                               loss_ref, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(res_sharded.velocity), np.asarray(res_single.velocity),
        atol=1e-3 * float(jnp.abs(res_single.velocity).max()))


def test_shot_sharded_lbfgs_3d_matches_single_device():
    """3D L-BFGS (fwi.lbfgs.run_lbfgs_3d) shot-sharded over the mesh ==
    unsharded — the volumetric second inversion path gets the same
    multi-device certification as the 3D CG path above."""
    from waveforminversionust_tpu.fwi.fwi3d import (build_fwi_data_3d,
                                                    sample_receivers_3d)
    from waveforminversionust_tpu.fwi.lbfgs import run_lbfgs_3d
    from waveforminversionust_tpu.models.acquisition3d import (
        build_acquisition3d, cylinder_positions, source_fields_3d)
    from waveforminversionust_tpu.models.grid3d import Grid3D
    from waveforminversionust_tpu.ops import cpx as cpxlib
    from waveforminversionust_tpu.ops.born3d import born_series_solve_3d
    from waveforminversionust_tpu.parallel.sharding import shard_fwi_data_3d

    C0, f = 1500.0, 200e3
    pml = PMLConfig(a0=20.0, l_pml=6e-3)
    grid = Grid3D.centered(12e-3, 1.0e-3)
    pos = cylinder_positions(1, 8, 8e-3, 0.0)
    acq = build_acquisition3d(grid, pos, min_angle=0.8)
    z = grid.z0 + grid.dz * jnp.arange(grid.nz)
    y = grid.y0 + grid.dy * jnp.arange(grid.ny)
    x = grid.x0 + grid.dx * jnp.arange(grid.nx)
    r2 = (z[:, None, None] ** 2 + y[None, :, None] ** 2
          + x[None, None, :] ** 2)
    vel_true = (C0 + 40.0 * jnp.exp(-r2 / 4e-3 ** 2)).astype(jnp.float32)
    src = source_fields_3d(acq, grid)
    wv, _ = born_series_solve_3d(vel_true, src, f, grid, pml, iter_cap=400)
    rec_obs = sample_receivers_3d(wv, jnp.asarray(acq.rx_idx))
    data = build_fwi_data_3d(acq, rec_obs, f, grid)
    # One-hot-source denormal pitfall (PERF_NOTES): scale to normal range.
    data = data._replace(src=cpxlib.scale(data.src, 1e6),
                         rec_obs=cpxlib.scale(data.rec_obs, 1e6))
    vel0 = jnp.full(grid.shape, C0, jnp.float32)

    # tol=1e-6: at the default 2e-3 the solver noise floor sits above the
    # psum reduction-order differences, and the zoom linesearch's binary
    # Wolfe decisions can flip between sharded and single runs.
    res_single = run_lbfgs_3d(vel0, data, grid, pml, iter_cap=400,
                              tol=1e-6, num_iterations=2)
    res_sharded = run_lbfgs_3d(vel0, shard_fwi_data_3d(data, shot_mesh()),
                               grid, pml, iter_cap=400, tol=1e-6,
                               num_iterations=2)

    loss_ref = np.asarray(res_single.loss_history)
    assert np.all(np.isfinite(loss_ref)) and loss_ref[-1] < loss_ref[0]
    # rtol 1e-2: the GMRES inner solves run at tol=2e-3, so the psum'd
    # cross-shard reduction order shifts the loss within solver noise.
    np.testing.assert_allclose(np.asarray(res_sharded.loss_history),
                               loss_ref, rtol=1e-2)
    np.testing.assert_allclose(
        np.asarray(res_sharded.velocity), np.asarray(res_single.velocity),
        atol=1e-3 * float(jnp.abs(res_single.velocity).max()))
