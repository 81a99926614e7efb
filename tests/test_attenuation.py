"""Lossy-media (attenuation) support in the FD Helmholtz solve.

The reference models lossless media only; attenuation is a framework
addition: ``solve_helmholtz(..., attenuation=alpha)`` with alpha [Np/m]
makes k = omega/c + i*sgn*alpha, so field amplitudes decay as
exp(-alpha * distance) on top of geometric spreading.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from waveforminversionust_tpu import (Grid2D, PMLConfig, SolverConfig,
                                      SolverMethod)
from waveforminversionust_tpu.ops.solve import solve_helmholtz
from waveforminversionust_tpu.utils.host import fetch

F = 300e3
C0 = 1500.0


@pytest.fixture(scope="module")
def setup():
    grid = Grid2D.centered(16e-3, 0.4e-3)  # 81x81
    solver = SolverConfig(pml=PMLConfig(l_pml=3.2e-3))
    vel = np.full(grid.shape, C0, np.float32)
    src = np.zeros(grid.shape, np.complex64)
    src[grid.ny // 2, grid.nx // 2] = 1.0
    return grid, solver, vel, src[None]


def test_attenuation_decays_exponentially(setup):
    """|u_lossy| / |u_lossless| ~ exp(-alpha r) away from the source."""
    grid, solver, vel, src = setup
    alpha = 150.0  # Np/m -> exp(-alpha*8mm) ~ 0.30
    u0, info0 = solve_helmholtz(vel, src, F, grid, solver)
    ua, infoa = solve_helmholtz(vel, src, F, grid, solver,
                                attenuation=np.full(grid.shape, alpha,
                                                    np.float32))
    assert float(info0.rel_residual.max()) < 1e-4
    assert float(infoa.rel_residual.max()) < 1e-4
    cy, cx = grid.ny // 2, grid.nx // 2
    for npix in (10, 20):  # 4 mm, 8 mm
        r = npix * grid.h
        ratio = (abs(complex(fetch(ua[0, cy, cx + npix])))
                 / abs(complex(fetch(u0[0, cy, cx + npix]))))
        expect = np.exp(-alpha * r)
        # The discrete operator's effective decay differs from the continuum
        # by dispersion/PML effects; 25% agreement is the physics check.
        assert ratio == pytest.approx(expect, rel=0.25), (npix, ratio, expect)
    # and monotone: more attenuation, less amplitude
    assert abs(complex(fetch(ua[0, cy, cx + 20]))) < abs(
        complex(fetch(u0[0, cy, cx + 20])))


def test_split_matches_native_lossy(setup):
    grid, solver, vel, src = setup
    alpha = np.full(grid.shape, 100.0, np.float32)
    u_n, _ = solve_helmholtz(vel, src, F, grid, solver, attenuation=alpha)
    split = dataclasses.replace(solver, split_complex=True)
    u_s, _ = solve_helmholtz(vel, src, F, grid, split, attenuation=alpha)
    u_s = fetch(u_s.re if hasattr(u_s, "re") else u_s)
    got = np.asarray(u_s) if not np.iscomplexobj(u_s) else u_s
    # compare real parts and magnitudes
    np.testing.assert_allclose(np.real(fetch(u_n)),
                               np.asarray(got),
                               atol=3e-5 * float(jnp.abs(u_n).max()))


def test_adjoint_solve_lossy_consistent(setup):
    """<H^-H a, b> == conj(<a, H^-1 b>) holds for the lossy operator too."""
    grid, solver, vel, src = setup
    alpha = np.full(grid.shape, 80.0, np.float32)
    rng = np.random.default_rng(0)
    a = (rng.standard_normal(grid.shape)
         + 1j * rng.standard_normal(grid.shape)).astype(np.complex64)[None]
    u, _ = solve_helmholtz(vel, src, F, grid, solver, attenuation=alpha)
    w, _ = solve_helmholtz(vel, a, F, grid, solver, adjoint=True,
                           attenuation=alpha)
    lhs = np.vdot(np.asarray(fetch(w[0])), np.asarray(fetch(src[0])))
    rhs = np.vdot(np.asarray(fetch(a[0])), np.asarray(fetch(u[0])))
    assert lhs == pytest.approx(rhs, rel=1e-3)


def test_born_supports_attenuation(setup):
    """The spectral (CBS) engine is lossy-capable too: alpha damps the
    field monotonically, alpha=0 reproduces the lossless solve exactly,
    and the split-complex form matches the native one (round-3 removal of
    the historical Born+attenuation guard; k = omega/c + i*sgn*alpha is
    engine-agnostic, cf. ops.born3d)."""
    from waveforminversionust_tpu.ops import cpx
    from waveforminversionust_tpu.ops.born import born_series_solve
    from waveforminversionust_tpu.ops.split_engine import born_series_solve_cpx

    grid, solver, vel, src = setup
    born = dataclasses.replace(solver, method=SolverMethod.BORN)
    alpha = np.full(grid.shape, 150.0, np.float32)
    u0, _ = solve_helmholtz(vel, src, F, grid, born)
    ua, _ = solve_helmholtz(vel, src, F, grid, born, attenuation=alpha)
    cy, cx = grid.ny // 2, grid.nx // 2
    a0 = abs(complex(fetch(u0[0, cy, cx + 20])))
    aa = abs(complex(fetch(ua[0, cy, cx + 20])))
    assert aa < 0.7 * a0, (aa, a0)  # exp(-150*8mm) ~ 0.30 in the continuum
    uz, _ = solve_helmholtz(vel, src, F, grid, born,
                            attenuation=np.zeros(grid.shape, np.float32))
    np.testing.assert_array_equal(np.asarray(fetch(uz)),
                                  np.asarray(fetch(u0)))
    # split form == native (both plain series; the krylov default differs)
    u_n, _ = born_series_solve(vel, jnp.asarray(src), F, grid, born.born_pml,
                               iter_cap=born.born_iter_cap,
                               attenuation=jnp.asarray(alpha))
    u_s, _ = born_series_solve_cpx(vel, cpx.of(jnp.asarray(src)), F, grid,
                                   born.born_pml,
                                   iter_cap=born.born_iter_cap,
                                   attenuation=jnp.asarray(alpha))
    got = np.asarray(u_s.re) + 1j * np.asarray(u_s.im)
    rel = (np.linalg.norm(got - np.asarray(u_n))
           / np.linalg.norm(np.asarray(u_n)))
    assert rel < 1e-4, rel


def test_synthesize_with_attenuation(setup):
    from waveforminversionust_tpu import AcquisitionConfig
    from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset

    grid, solver, vel, _ = setup
    acq = AcquisitionConfig(num_elements=12, radius=6e-3)
    ds0 = synthesize_ring_dataset(vel, grid, acq, f=F, solver=solver, seed=1)
    dsa = synthesize_ring_dataset(vel, grid, acq, f=F, solver=solver, seed=1,
                                  attenuation=np.full(grid.shape, 120.0,
                                                      np.float32))
    # same geometry, strictly weaker transmissions
    m0 = np.abs(ds0.rec_data).mean()
    ma = np.abs(dsa.rec_data).mean()
    assert ma < 0.7 * m0


def test_virtual_source_lossy_factor():
    """VIRT = (2 omega^2 slow + 2 i omega alpha_signed) * u, both engines."""
    from waveforminversionust_tpu.fwi.objective import virtual_source
    from waveforminversionust_tpu.ops import cpx

    rng = np.random.default_rng(0)
    slow = (1 / 1500.0 + 1e-5 * rng.standard_normal((5, 6))).astype(np.float32)
    a_s = (-40.0 * np.ones((5, 6))).astype(np.float32)
    u = (rng.standard_normal((2, 5, 6))
         + 1j * rng.standard_normal((2, 5, 6))).astype(np.complex64)
    omega = 2 * np.pi * F
    expect = (2 * omega ** 2 * slow + 2j * omega * a_s)[None] * u
    got = virtual_source(jnp.asarray(slow), jnp.asarray(u), jnp.float32(F),
                         jnp.asarray(a_s))
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5)
    got_s = virtual_source(jnp.asarray(slow), cpx.of(u), jnp.float32(F),
                           jnp.asarray(a_s))
    np.testing.assert_allclose(np.asarray(got_s.re) + 1j * np.asarray(got_s.im),
                               expect, rtol=1e-5)


def test_lossy_adjoint_state_gradient_quality():
    """The hand-derived CG gradient in a lossy medium tracks jax.grad of the
    misfit as closely as the reference's lossless approximation does (the
    VIRT factor ignores the PML stretch and the stencil's k^2 neighbor
    spread — measured ~2% directional error either way), and the lossy
    Frechet correction (2*i*omega*alpha) does not degrade it."""
    import jax

    from waveforminversionust_tpu.fwi.objective import misfit, virtual_source

    grid = Grid2D.centered(12e-3, 0.6e-3)  # 41x41
    solver = SolverConfig(pml=PMLConfig(l_pml=2.4e-3))
    rng = np.random.default_rng(3)
    vel0 = (1500.0 + 20 * rng.standard_normal(grid.shape)).astype(np.float32)
    alpha = (60.0 * np.exp(-((np.arange(grid.nx) - grid.nx / 2) ** 2
                             / (2 * 8.0 ** 2)))[None, :]
             * np.ones((grid.ny, 1))).astype(np.float32)
    src = np.zeros((2,) + grid.shape, np.complex64)
    src[0, 8, 8] = 1.0
    src[1, 30, 28] = 1.0
    ry, rx = np.array([20, 10, 33]), np.array([35, 22, 12])
    u_true, _ = solve_helmholtz(vel0 + 15, src, F, grid, solver,
                                attenuation=alpha)
    obs = fetch(u_true[:, ry, rx])
    slow0 = jnp.asarray(1.0 / vel0)

    def lossf(slow):
        u, _ = solve_helmholtz(1.0 / slow, src, F, grid, solver,
                               attenuation=alpha)
        return misfit(u[:, ry, rx], jnp.asarray(obs))

    g_auto = np.asarray(jax.grad(lossf)(slow0))

    u, _ = solve_helmholtz(vel0, src, F, grid, solver, attenuation=alpha)
    res = np.asarray(fetch(u[:, ry, rx])) - obs
    adj_src = np.zeros_like(src)
    adj_src[:, ry, rx] = res
    lam, _ = solve_helmholtz(vel0, jnp.asarray(adj_src), F, grid, solver,
                             adjoint=True, attenuation=alpha)

    def cos(a_signed):
        virt = virtual_source(slow0, u, jnp.float32(F), a_signed)
        g = -np.sum(np.real(np.conj(np.asarray(fetch(virt)))
                            * np.asarray(fetch(lam))), axis=0)
        return float(np.vdot(g.ravel(), g_auto.ravel())
                     / (np.linalg.norm(g) * np.linalg.norm(g_auto)))

    sgn = np.sign(solver.pml.sign_convention)
    c_lossy = cos(jnp.asarray((sgn * alpha).astype(np.float32)))
    c_lossless = cos(None)
    assert c_lossy > 0.98
    assert c_lossy >= c_lossless - 1e-6


def test_cg_inversion_in_lossy_medium():
    """End-to-end: synthesize lossy data, invert velocity with the known
    alpha map passed through build_fwi_data — loss decreases and the
    reconstruction moves toward the true model."""
    from waveforminversionust_tpu import AcquisitionConfig, FWIConfig
    from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
    from waveforminversionust_tpu.fwi.objective import build_fwi_data
    from waveforminversionust_tpu.fwi.optimizers import nonlinear_cg
    from waveforminversionust_tpu.models.acquisition import (
        build_ring_acquisition, ring_positions, snap_to_grid)
    from waveforminversionust_tpu.models.phantom import smooth_blob_phantom

    fine = Grid2D.centered(24e-3, 0.4e-3)
    coarse = Grid2D.centered(24e-3, 0.8e-3)
    acq_cfg = AcquisitionConfig(num_elements=32, radius=9e-3,
                                num_excluded_each_side=3)
    # Snap element positions to the INVERSION grid first so both grids place
    # them identically (see synthesize_ring_dataset's docstring).
    xe, ye = ring_positions(acq_cfg.num_elements, acq_cfg.radius)
    xi, yi = snap_to_grid(coarse, xe, ye)
    xs, ys = coarse.x[xi], coarse.y[yi]
    solver = SolverConfig(pml=PMLConfig(l_pml=3.2e-3))
    vel_true = smooth_blob_phantom(fine, radius=6e-3, dc=30)
    alpha_fine = np.full(fine.shape, 50.0, np.float32)
    ds = synthesize_ring_dataset(vel_true, fine, acq_cfg, f=200e3,
                                 solver=solver, seed=5,
                                 attenuation=alpha_fine,
                                 x_elem=xs, y_elem=ys)
    acq = build_ring_acquisition(coarse, acq_cfg, x_elem=ds.x_circ,
                                 y_elem=ds.y_circ)
    alpha_coarse = np.full(coarse.shape, 50.0, np.float32)
    data = build_fwi_data(acq, ds.rec_data, 200e3,
                          attenuation=alpha_coarse)
    vel0 = jnp.full(coarse.shape, 1500.0, jnp.float32)
    res = nonlinear_cg(vel0, data, coarse, solver,
                       FWIConfig(num_iterations=5))
    loss = np.asarray(res.metrics.loss)
    assert np.all(np.isfinite(loss))
    assert loss[-1] < 0.6 * loss[0]
    vmax = float(np.max(np.asarray(res.velocity)))
    assert 1510.0 < vmax < 1545.0  # moving toward the +30 blob


def test_invert_dataset_scalar_attenuation():
    """invert_dataset expands scalar alpha to the grid (0.0 means lossless)."""
    from waveforminversionust_tpu import AcquisitionConfig, FWIConfig
    from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
    from waveforminversionust_tpu.fwi.runner import invert_dataset
    from waveforminversionust_tpu.models.acquisition import (ring_positions,
                                                             snap_to_grid)
    from waveforminversionust_tpu.models.phantom import smooth_blob_phantom

    fine = Grid2D.centered(24e-3, 0.4e-3)
    coarse = Grid2D.centered(24e-3, 0.8e-3)
    acq = AcquisitionConfig(num_elements=32, radius=9e-3,
                            num_excluded_each_side=3)
    xe, ye = ring_positions(acq.num_elements, acq.radius)
    xi, yi = snap_to_grid(coarse, xe, ye)
    solver = SolverConfig(pml=PMLConfig(l_pml=3.2e-3))
    ds = synthesize_ring_dataset(smooth_blob_phantom(fine, radius=6e-3, dc=30),
                                 fine, acq, f=200e3, solver=solver, seed=5,
                                 attenuation=np.full(fine.shape, 50.0,
                                                     np.float32),
                                 x_elem=coarse.x[xi], y_elem=coarse.y[yi])
    fwi = FWIConfig(c_init=1500.0, num_iterations=3)
    res = invert_dataset(ds, grid=coarse, acquisition=acq, solver=solver,
                         fwi=fwi, attenuation=50.0)
    loss = res.metrics["loss"]
    assert loss[-1] < 0.3 * loss[0]
    # 0.0 -> plain lossless path still runs
    res0 = invert_dataset(ds, grid=coarse, acquisition=acq, solver=solver,
                          fwi=fwi, attenuation=0.0)
    assert np.isfinite(res0.metrics["loss"]).all()


def test_multifreq_lossy_regularized():
    """Joint multi-frequency CG accepts attenuation + TV regularization."""
    import dataclasses

    from waveforminversionust_tpu import AcquisitionConfig, FWIConfig
    from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
    from waveforminversionust_tpu.fwi.multifreq import (nonlinear_cg_multifreq,
                                                        stack_frequencies)
    from waveforminversionust_tpu.fwi.objective import build_fwi_data
    from waveforminversionust_tpu.models.acquisition import (
        build_ring_acquisition, ring_positions, snap_to_grid)
    from waveforminversionust_tpu.models.phantom import smooth_blob_phantom

    fine = Grid2D.centered(24e-3, 0.4e-3)
    coarse = Grid2D.centered(24e-3, 0.8e-3)
    acq_cfg = AcquisitionConfig(num_elements=24, radius=9e-3,
                                num_excluded_each_side=3)
    xe, ye = ring_positions(acq_cfg.num_elements, acq_cfg.radius)
    xi, yi = snap_to_grid(coarse, xe, ye)
    solver = SolverConfig(pml=PMLConfig(l_pml=3.2e-3))
    vel_true = smooth_blob_phantom(fine, radius=6e-3, dc=30)
    alpha_f = np.full(fine.shape, 40.0, np.float32)
    alpha_c = np.full(coarse.shape, 40.0, np.float32)
    acq = None
    datas = []
    for f in (150e3, 200e3):
        ds = synthesize_ring_dataset(vel_true, fine, acq_cfg, f=f,
                                     solver=solver, seed=6,
                                     attenuation=alpha_f,
                                     x_elem=coarse.x[xi], y_elem=coarse.y[yi])
        if acq is None:
            acq = build_ring_acquisition(coarse, acq_cfg, x_elem=ds.x_circ,
                                         y_elem=ds.y_circ)
        datas.append(build_fwi_data(acq, ds.rec_data, f,
                                    attenuation=alpha_c))
    mdata = stack_frequencies(datas)
    fwi = FWIConfig(c_init=1500.0, num_iterations=4, reg_tv=0.2)
    vel0 = jnp.full(coarse.shape, 1500.0, jnp.float32)
    vel, metrics = nonlinear_cg_multifreq(vel0, mdata, coarse, solver, fwi)
    loss = np.asarray(metrics.loss)
    assert np.all(np.isfinite(loss))
    assert loss[-1] < 0.5 * loss[0]
    assert 1505.0 < float(np.max(np.asarray(vel)))


def test_lbfgs_attenuation_inversion_recovers_alpha(setup):
    """Turnkey alpha inversion (framework addition): with the velocity
    known, L-BFGS through the differentiable LOSSY solve recovers the
    absorber map from ring data — physics the reference cannot express
    (its solver is lossless)."""
    from waveforminversionust_tpu import AcquisitionConfig
    from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
    from waveforminversionust_tpu.fwi.lbfgs import run_lbfgs_attenuation
    from waveforminversionust_tpu.fwi.objective import build_fwi_data
    from waveforminversionust_tpu.models.acquisition import build_ring_acquisition

    grid, solver, vel, _ = setup
    acq_cfg = AcquisitionConfig(num_elements=12, radius=6e-3,
                                num_excluded_each_side=1)
    yy, xx = np.meshgrid(np.arange(grid.ny) - grid.ny / 2,
                         np.arange(grid.nx) - grid.nx / 2, indexing="ij")
    alpha_true = (90.0 * np.exp(-(yy ** 2 + xx ** 2) / 8.0 ** 2)
                  ).astype(np.float32)
    ds = synthesize_ring_dataset(vel, grid, acq_cfg, f=F, solver=solver,
                                 seed=2, attenuation=alpha_true)
    acq = build_ring_acquisition(grid, acq_cfg, x_elem=ds.x_circ,
                                 y_elem=ds.y_circ)
    data = build_fwi_data(acq, ds.rec_data, F)

    res = run_lbfgs_attenuation(vel, np.zeros(grid.shape, np.float32), data,
                                grid, solver, num_iterations=8,
                                alpha_scale=50.0)
    losses = np.asarray(res.loss_history)
    assert np.all(np.isfinite(losses))
    assert losses[-1] < 0.3 * losses[0], losses
    err0 = np.linalg.norm(alpha_true)
    err = np.linalg.norm(np.asarray(res.attenuation) - alpha_true)
    assert err < 0.8 * err0, (err, err0)


def test_lbfgs_joint_velocity_alpha_inversion(setup):
    """Joint (c, alpha) inversion: both maps move toward truth when both
    are unknown (invert_velocity=True optimizes the concatenated
    dimensionless parameters)."""
    from waveforminversionust_tpu import AcquisitionConfig
    from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
    from waveforminversionust_tpu.fwi.lbfgs import run_lbfgs_attenuation
    from waveforminversionust_tpu.fwi.objective import build_fwi_data
    from waveforminversionust_tpu.models.acquisition import build_ring_acquisition
    from waveforminversionust_tpu.models.phantom import smooth_blob_phantom

    grid, solver, vel0_bg, _ = setup
    acq_cfg = AcquisitionConfig(num_elements=12, radius=6e-3,
                                num_excluded_each_side=1)
    vel_true = np.asarray(smooth_blob_phantom(grid, radius=5e-3, dc=25,
                                              c_bkgnd=C0), np.float32)
    yy, xx = np.meshgrid(np.arange(grid.ny) - grid.ny / 2,
                         np.arange(grid.nx) - grid.nx / 2, indexing="ij")
    alpha_true = (70.0 * np.exp(-(yy ** 2 + xx ** 2) / 8.0 ** 2)
                  ).astype(np.float32)
    ds = synthesize_ring_dataset(vel_true, grid, acq_cfg, f=F, solver=solver,
                                 seed=4, attenuation=alpha_true)
    acq = build_ring_acquisition(grid, acq_cfg, x_elem=ds.x_circ,
                                 y_elem=ds.y_circ)
    data = build_fwi_data(acq, ds.rec_data, F)

    vel0 = np.full(grid.shape, C0, np.float32)
    res = run_lbfgs_attenuation(vel0, np.zeros(grid.shape, np.float32), data,
                                grid, solver, num_iterations=10,
                                invert_velocity=True, alpha_scale=50.0,
                                velocity_scale=0.01)
    losses = np.asarray(res.loss_history)
    assert np.all(np.isfinite(losses))
    assert losses[-1] < 0.5 * losses[0], losses
    verr0 = np.linalg.norm(vel0 - vel_true)
    verr = np.linalg.norm(np.asarray(res.velocity) - vel_true)
    aerr0 = np.linalg.norm(alpha_true)
    aerr = np.linalg.norm(np.asarray(res.attenuation) - alpha_true)
    assert verr < verr0, (verr, verr0)
    assert aerr < aerr0, (aerr, aerr0)
