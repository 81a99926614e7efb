"""3D FWI slice: adjoint-state gradient FD-checks in 3D and a tiny
volumetric inversion reduces the misfit (SURVEY.md section 5 'scaling
axes'; the reference is strictly 2D)."""

import jax.numpy as jnp
import numpy as np
import pytest

from waveforminversionust_tpu import FWIConfig, PMLConfig
from waveforminversionust_tpu.fwi.fwi3d import (FWIData3D, build_fwi_data_3d,
                                                nonlinear_cg_3d,
                                                objective_pieces_3d,
                                                sample_receivers_3d)
from waveforminversionust_tpu.models.acquisition3d import (
    build_acquisition3d, cylinder_positions, hemisphere_positions,
    source_fields_3d)
from waveforminversionust_tpu.models.grid3d import Grid3D
from waveforminversionust_tpu.ops import cpx
from waveforminversionust_tpu.ops.born3d import born_series_solve_3d

F = 200e3
C0 = 1500.0
PML = PMLConfig(a0=20.0, l_pml=6e-3)
ITER_CAP = 500


def _blob(grid: Grid3D, dc=40.0, radius=4e-3):
    z = grid.z0 + grid.dz * jnp.arange(grid.nz)
    y = grid.y0 + grid.dy * jnp.arange(grid.ny)
    x = grid.x0 + grid.dx * jnp.arange(grid.nx)
    r2 = (z[:, None, None] ** 2 + y[None, :, None] ** 2
          + x[None, None, :] ** 2)
    return (C0 + dc * jnp.exp(-r2 / radius ** 2)).astype(jnp.float32)


def _problem(n_elem=8):
    grid = Grid3D.centered(12e-3, 1.0e-3)
    pos = cylinder_positions(1, n_elem, 8e-3, 0.0)
    acq = build_acquisition3d(grid, pos, min_angle=0.8)
    vel_true = _blob(grid)
    src = source_fields_3d(acq, grid)
    wv, _ = born_series_solve_3d(vel_true, src, F, grid, PML,
                                 iter_cap=ITER_CAP)
    rec_obs = sample_receivers_3d(wv, jnp.asarray(acq.rx_idx))
    data = build_fwi_data_3d(acq, rec_obs, F, grid)
    return grid, acq, vel_true, data


def test_hemisphere_positions_on_sphere():
    pos = hemisphere_positions(64, 10e-3)
    r = np.linalg.norm(pos, axis=1)
    np.testing.assert_allclose(r, 10e-3, rtol=1e-6)
    assert (pos[:, 2] <= 0).all()


def test_acquisition3d_masks_small_angles():
    grid = Grid3D.centered(12e-3, 1.0e-3)
    pos = cylinder_positions(2, 8, 8e-3, 6e-3)
    acq = build_acquisition3d(grid, pos, min_angle=0.8)
    assert acq.rx_idx.shape[0] == 16
    # no transmitter receives on itself or a near-angle neighbor
    unit = pos / np.linalg.norm(pos, axis=1, keepdims=True)
    for t in range(16):
        rx_vox = np.asarray(acq.rx_idx[t])
        own = np.asarray(acq.src_idx[t])
        assert not (rx_vox == own).all(axis=1).any()


def test_gradient_matches_finite_differences():
    """The 3D adjoint-state gradient (hand identity, two CBS solves)
    matches central finite differences of the misfit."""
    grid, acq, vel_true, data = _problem()
    vel = jnp.full(grid.shape, C0, jnp.float32)
    slow = 1.0 / vel

    import jax

    def loss_of_slow(s):
        v = 1.0 / s
        wv, _ = born_series_solve_3d(v, data.src, data.f, grid, PML,
                                     iter_cap=ITER_CAP)
        rec = sample_receivers_3d(wv, data.rx_idx)
        d = rec - data.rec_obs
        return 0.5 * jnp.sum(d.re ** 2 + d.im ** 2)

    loss, grad, _, _ = objective_pieces_3d(vel, slow, data, grid, PML,
                                           ITER_CAP, estimate_source=False)
    loss_fn = jax.jit(loss_of_slow)
    assert float(loss) == pytest.approx(float(loss_fn(slow)), rel=1e-5)

    nz, ny, nx = grid.shape
    probes = [(nz // 2, ny // 2, nx // 2), (nz // 2, ny // 2 + 2, nx // 2),
              (nz // 2 - 2, ny // 2, nx // 2 + 3)]
    eps = 1e-3 / C0  # ~0.1% of the slowness scale
    for p in probes:
        sp = slow.at[p].add(eps)
        sm = slow.at[p].add(-eps)
        fd = (float(loss_fn(sp)) - float(loss_fn(sm))) / (2 * eps)
        an = float(grad[p])
        assert an == pytest.approx(fd, rel=7e-2, abs=1e-12 + 0.02 * abs(fd)), p


def test_3d_lossy_forward_attenuates():
    """3D CBS with an attenuation map: a uniform lossy medium damps the
    transmitted field relative to lossless, the damping grows with alpha,
    and the lossless limit alpha=0 is exact (mirrors the 2D attenuation
    tests; k = omega/c + i*sgn*alpha is engine-agnostic)."""
    grid, acq, vel_true, data = _problem()
    vel = jnp.full(grid.shape, C0, jnp.float32)
    src = data.src
    u0, _ = born_series_solve_3d(vel, src, F, grid, PML, iter_cap=ITER_CAP)
    uz, _ = born_series_solve_3d(vel, src, F, grid, PML, iter_cap=ITER_CAP,
                                 attenuation=jnp.zeros(grid.shape))
    np.testing.assert_allclose(cpx.to_numpy(uz), cpx.to_numpy(u0),
                               rtol=0, atol=1e-7)
    amps = []
    for alpha in (20.0, 60.0):
        ua, _ = born_series_solve_3d(vel, src, F, grid, PML,
                                     iter_cap=ITER_CAP,
                                     attenuation=jnp.full(grid.shape, alpha))
        rec = sample_receivers_3d(ua, data.rx_idx)
        amps.append(float(np.mean(np.abs(cpx.to_numpy(rec)))))
    rec0 = sample_receivers_3d(u0, data.rx_idx)
    a0 = float(np.mean(np.abs(cpx.to_numpy(rec0))))
    assert amps[0] < 0.9 * a0, (amps, a0)
    assert amps[1] < amps[0], (amps, a0)


def test_3d_lossy_gradient_matches_finite_differences():
    """The lossy 3D Frechet factor (2 omega^2 slow + 2 i omega sgn alpha)
    gives an adjoint-state gradient matching finite differences in a fixed
    attenuating medium."""
    import jax

    grid, acq, vel_true, data0 = _problem()
    alpha = jnp.full(grid.shape, 30.0, jnp.float32)
    # observed data in the lossy medium at the true model
    src = data0.src
    wv, _ = born_series_solve_3d(vel_true, src, F, grid, PML,
                                 iter_cap=ITER_CAP, attenuation=alpha)
    rec_obs = sample_receivers_3d(wv, data0.rx_idx)
    data = FWIData3D(src=src, rec_obs=rec_obs, rx_idx=data0.rx_idx,
                     f=data0.f, attenuation=alpha)
    vel = jnp.full(grid.shape, C0, jnp.float32)
    slow = 1.0 / vel

    def loss_of_slow(s):
        v = 1.0 / s
        u, _ = born_series_solve_3d(v, src, data.f, grid, PML,
                                    iter_cap=ITER_CAP, attenuation=alpha)
        rec = sample_receivers_3d(u, data.rx_idx)
        d = rec - data.rec_obs
        return 0.5 * jnp.sum(d.re ** 2 + d.im ** 2)

    loss, grad, _, _ = objective_pieces_3d(vel, slow, data, grid, PML,
                                           ITER_CAP, estimate_source=False)
    loss_fn = jax.jit(loss_of_slow)
    assert float(loss) == pytest.approx(float(loss_fn(slow)), rel=1e-5)
    nz, ny, nx = grid.shape
    eps = 1e-3 / C0
    for p in [(nz // 2, ny // 2, nx // 2), (nz // 2, ny // 2 + 2, nx // 2)]:
        sp = slow.at[p].add(eps)
        sm = slow.at[p].add(-eps)
        fd = (float(loss_fn(sp)) - float(loss_fn(sm))) / (2 * eps)
        an = float(grad[p])
        assert an == pytest.approx(fd, rel=7e-2, abs=1e-12 + 0.02 * abs(fd)), p


def test_3d_all_momentum_and_step_formulas_run():
    """The full 5x3 momentum x step-size matrix runs in the 3D CG loop
    (mirrors test_fwi.py::test_all_momentum_formulas_run; reference matrix:
    FrequencyDomainFWI.m:36-45)."""
    from waveforminversionust_tpu.config import MomentumFormula, StepSizeFormula

    grid, acq, vel_true, data = _problem()
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    for mom in MomentumFormula:
        for stp in StepSizeFormula:
            fwi = FWIConfig(num_iterations=1, momentum=mom, step_size=stp,
                            estimate_source_strength=False,
                            clip_velocity=(C0 - 100.0, C0 + 100.0))
            vel, metrics = nonlinear_cg_3d(vel0, data, grid, fwi, pml=PML,
                                           iter_cap=120)
            assert np.all(np.isfinite(np.asarray(metrics.loss))), (mom, stp)
            assert np.all(np.isfinite(np.asarray(vel))), (mom, stp)


def test_tiny_3d_inversion_reduces_misfit():
    grid, acq, vel_true, data = _problem()
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    fwi = FWIConfig(num_iterations=3, estimate_source_strength=False,
                    clip_velocity=(C0 - 100.0, C0 + 100.0))
    vel, metrics = nonlinear_cg_3d(vel0, data, grid, fwi, pml=PML,
                                   iter_cap=ITER_CAP)
    losses = np.asarray(metrics.loss)
    assert np.all(np.isfinite(losses))
    assert losses[-1] < 0.7 * losses[0], losses
    # the update moves toward the true blob (positive dc at the center)
    c = tuple(s // 2 for s in grid.shape)
    assert float(vel[c]) > C0


def test_tiny_3d_preconditioned_inversion_reduces_misfit():
    """FWIConfig.precondition="illumination" in the 3D loop (2D-parity
    feature; same diagonal pseudo-Hessian scaling, illumination summed
    over the transmit batch)."""
    grid, acq, vel_true, data = _problem()
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    fwi = FWIConfig(num_iterations=3, estimate_source_strength=False,
                    clip_velocity=(C0 - 100.0, C0 + 100.0),
                    precondition="illumination")
    vel, metrics = nonlinear_cg_3d(vel0, data, grid, fwi, pml=PML,
                                   iter_cap=ITER_CAP)
    losses = np.asarray(metrics.loss)
    assert np.all(np.isfinite(losses))
    assert losses[-1] < 0.7 * losses[0], losses
    c = tuple(s // 2 for s in grid.shape)
    assert float(vel[c]) > C0


def test_tiny_3d_gmres_inversion_reduces_misfit():
    """solver3d="gmres" (Krylov-accelerated CBS in every solve of the 3D
    CG loop) inverts the tiny problem: finite, decreasing misfit and the
    update moves toward the true blob. (No trajectory-match assertion:
    at this one-hot scale ~half the initial misfit is solver truncation
    noise — rec_obs carries the fixed-point CBS's residual — so CBS- and
    GMRES-driven trajectories legitimately diverge; solution-level solver
    agreement is covered in tests/test_born3d.py.)"""
    grid, acq, vel_true, data = _problem()
    # Keep |rhs|^2 in f32's normal range (exact: the problem is linear in
    # the source) — at the one-hot test scale the adjoint-source norm is
    # ~1e-36, under GMRES's f32 floor (see tests/test_fft3d.py on the
    # denormal pitfall).
    data = data._replace(src=cpx.scale(data.src, 1e6),
                         rec_obs=cpx.scale(data.rec_obs, 1e6))
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    fwi = FWIConfig(num_iterations=2, estimate_source_strength=False,
                    clip_velocity=(C0 - 100.0, C0 + 100.0))
    v_gm, m_gm = nonlinear_cg_3d(vel0, data, grid, fwi, pml=PML,
                                 iter_cap=ITER_CAP, solver3d="gmres",
                                 gmres_tol=1e-4)
    l_gm = np.asarray(m_gm.loss)
    assert np.all(np.isfinite(l_gm))
    assert l_gm[-1] < 0.9 * l_gm[0], l_gm
    c = tuple(s // 2 for s in grid.shape)
    assert float(v_gm[c]) > C0


def test_tiny_3d_gmres_warm_start_matches_cold():
    """warm_start carries each solve's field into the next iteration's
    GMRES as x0 (RHS-normalized). The solves still converge to the same
    gmres_tol, so the trajectory is tolerance-equivalent to cold starts:
    finite, comparably decreasing loss and a matching final model. Also
    pins the chunked path (the warm carries thread through the chunk
    boundary inside the scan state) and the validation errors."""
    grid, acq, vel_true, data = _problem()
    data = data._replace(src=cpx.scale(data.src, 1e6),
                         rec_obs=cpx.scale(data.rec_obs, 1e6))
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    fwi = FWIConfig(num_iterations=4, estimate_source_strength=False,
                    clip_velocity=(C0 - 100.0, C0 + 100.0))
    kw = dict(pml=PML, iter_cap=ITER_CAP, solver3d="gmres", gmres_tol=1e-4)
    v_cold, m_cold = nonlinear_cg_3d(vel0, data, grid, fwi,
                                     warm_start=False, **kw)
    v_warm, m_warm = nonlinear_cg_3d(vel0, data, grid, fwi,
                                     warm_start=True, **kw)
    l_cold, l_warm = np.asarray(m_cold.loss), np.asarray(m_warm.loss)
    assert np.all(np.isfinite(l_warm))
    assert l_warm[-1] < 0.7 * l_warm[0], l_warm
    # tolerance-equivalent, not bit-identical: same loss scale throughout
    np.testing.assert_allclose(l_warm, l_cold, rtol=0.15)
    err = np.abs(np.asarray(v_warm) - np.asarray(v_cold)).max()
    assert err < 1.0, err  # m/s, on a 40 m/s anomaly
    # chunked run threads the warm carries exactly through the boundary
    v_ch, m_ch = nonlinear_cg_3d(vel0, data, grid, fwi, warm_start=True,
                                 chunk_iterations=2, **kw)
    np.testing.assert_allclose(np.asarray(m_ch.loss), l_warm, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(v_ch), np.asarray(v_warm),
                               atol=1e-2)
    # invalid combinations are rejected eagerly
    with pytest.raises(ValueError, match="gmres"):
        nonlinear_cg_3d(vel0, data, grid, fwi, pml=PML, iter_cap=50,
                        warm_start=True)
    with pytest.raises(ValueError, match="encode"):
        nonlinear_cg_3d(vel0, data, grid, fwi, warm_start=True,
                        encode=2, **kw)


def test_3d_custom_vjp_gradient_matches_fd():
    """jax.grad through the differentiable 3D Born solve
    (ops.born3d.born_solve_3d_diff custom VJP = one adjoint solve) matches
    a central finite-difference directional derivative of the misfit.

    Two conditions make FD meaningful here (both learned the hard way):
    the solve must be CONVERGED (GMRES tol=1e-5 — the Born-series heuristic
    count leaves ~2% truncation on this problem, and FD of the truncated map
    is 2x off the idealized-inverse gradient the VJP implements), and the
    absorbing shell must be frozen via ``shell_k0`` (it is discretization,
    not physics, so the VJP deliberately does not differentiate it)."""
    import jax

    from waveforminversionust_tpu.fwi.lbfgs import fwi_loss_3d

    grid, acq, vel_true, data = _problem()
    data = data._replace(src=cpx.scale(data.src, 1e6),
                         rec_obs=cpx.scale(data.rec_obs, 1e6))
    slow = jnp.full((grid.nz * grid.ny * grid.nx,), 1.0 / C0, jnp.float32)
    k0_bg = 2.0 * np.pi * F / C0

    def loss_fn(s):
        return fwi_loss_3d(s, data, grid, PML, iter_cap=2000,
                           use_gmres=True, tol=1e-5, restart=16,
                           estimate_sources=False, shell_k0=k0_bg)

    loss_fn = jax.jit(loss_fn)
    grad = jax.jit(jax.grad(loss_fn))(slow)
    assert np.all(np.isfinite(np.asarray(grad)))

    # Interior-masked random directions (the shell region is frozen physics).
    rng = np.random.default_rng(3)
    mask = np.zeros(grid.shape, np.float32)
    mask[3:-3, 3:-3, 3:-3] = 1.0
    for seed in range(2):
        ds = rng.standard_normal(slow.shape[0]).astype(np.float32)
        ds = jnp.asarray(ds * mask.ravel()) * (1.0 / C0)
        eps = 3e-3
        fd = (float(loss_fn(slow + eps * ds))
              - float(loss_fn(slow - eps * ds))) / (2 * eps)
        an = float(jnp.vdot(grad, ds))
        assert an == pytest.approx(fd, rel=5e-2), seed


def test_3d_lossy_vjp_gradients_match_fd():
    """The lossy 3D custom VJP (_born3d_diff_lossy): gradients w.r.t. BOTH
    slowness and the attenuation map match directional FD of the lossy
    misfit (converged GMRES, frozen shell — same conditions as the
    lossless FD test; measured ratios 1.001 / 0.96)."""
    import jax

    from waveforminversionust_tpu.fwi.lbfgs import fwi_loss_3d

    grid, acq, vel_true, data = _problem()
    data = data._replace(src=cpx.scale(data.src, 1e6),
                         rec_obs=cpx.scale(data.rec_obs, 1e6))
    slow = jnp.full((grid.nz * grid.ny * grid.nx,), 1.0 / C0, jnp.float32)
    alpha0 = jnp.full(grid.shape, 10.0, jnp.float32)
    k0_bg = 2.0 * np.pi * F / C0

    def loss_fn(s, a):
        d = data._replace(attenuation=a)
        return fwi_loss_3d(s, d, grid, PML, iter_cap=2000, use_gmres=True,
                           tol=1e-5, restart=16, estimate_sources=False,
                           shell_k0=k0_bg)

    loss_fn = jax.jit(loss_fn)
    gs, ga = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))(slow, alpha0)
    assert np.all(np.isfinite(np.asarray(gs)))
    assert np.all(np.isfinite(np.asarray(ga)))

    rng = np.random.default_rng(3)
    mask = np.zeros(grid.shape, np.float32)
    mask[3:-3, 3:-3, 3:-3] = 1.0
    ds = jnp.asarray(rng.standard_normal(slow.shape[0]).astype(np.float32)
                     * mask.ravel()) * (1.0 / C0)
    da = jnp.asarray(rng.standard_normal(grid.shape).astype(np.float32)
                     * mask) * 5.0
    eps = 3e-3
    # alpha sensitivity is ~50x weaker than slowness here: a larger step
    # keeps the f32 loss difference above the GMRES tol-floor noise.
    eps_a = 1e-1
    fd_s = (float(loss_fn(slow + eps * ds, alpha0))
            - float(loss_fn(slow - eps * ds, alpha0))) / (2 * eps)
    fd_a = (float(loss_fn(slow, alpha0 + eps_a * da))
            - float(loss_fn(slow, alpha0 - eps_a * da))) / (2 * eps_a)
    assert float(jnp.vdot(gs, ds)) == pytest.approx(fd_s, rel=5e-2)
    assert float(jnp.vdot(ga, da)) == pytest.approx(fd_a, rel=1e-1)


@pytest.mark.slow
def test_tiny_3d_attenuation_inversion_recovers_absorber():
    """run_lbfgs_attenuation_3d: recovers a volumetric Gaussian absorber
    from ring data in a known homogeneous velocity medium (the 3D analog
    of test_attenuation.py::test_lbfgs_attenuation_inversion_recovers_alpha).

    Checks are loss decrease + localization (center hot, edge clean): with
    8 elements on a single ring at one frequency the 3D problem is too
    under-determined for a voxel-norm error bound (measured: loss /14,
    center 51 vs true 40, edge 0 — but ||a - a_true|| slightly above
    ||a_true|| from blob misshaping)."""
    from waveforminversionust_tpu.fwi.fwi3d import (build_fwi_data_3d,
                                                    sample_receivers_3d)
    from waveforminversionust_tpu.fwi.lbfgs import run_lbfgs_attenuation_3d
    from waveforminversionust_tpu.models.acquisition3d import (
        build_acquisition3d, cylinder_positions, source_fields_3d)

    grid = Grid3D.centered(12e-3, 1.0e-3)
    nz, ny, nx = grid.shape
    pos = cylinder_positions(1, 8, 8e-3, 0.0)
    acq = build_acquisition3d(grid, pos, min_angle=0.8)
    z = grid.z0 + grid.dz * np.arange(nz)
    y = grid.y0 + grid.dy * np.arange(ny)
    x = grid.x0 + grid.dx * np.arange(nx)
    r2 = (z[:, None, None] ** 2 + y[None, :, None] ** 2
          + x[None, None, :] ** 2)
    alpha_true = (40.0 * np.exp(-r2 / 3e-3 ** 2)).astype(np.float32)
    vel_true = jnp.full(grid.shape, C0, jnp.float32)

    src = source_fields_3d(acq, grid)
    wv, _ = born_series_solve_3d(vel_true, src, F, grid, PML, iter_cap=500,
                                 attenuation=jnp.asarray(alpha_true))
    rec_obs = sample_receivers_3d(wv, jnp.asarray(acq.rx_idx))
    data = build_fwi_data_3d(acq, rec_obs, F, grid)
    data = data._replace(src=cpx.scale(data.src, 1e6),
                         rec_obs=cpx.scale(data.rec_obs, 1e6))

    res = run_lbfgs_attenuation_3d(vel_true,
                                   jnp.zeros(grid.shape, jnp.float32),
                                   data, grid, PML, iter_cap=ITER_CAP,
                                   use_gmres=True, num_iterations=6,
                                   estimate_sources=False, alpha_scale=40.0)
    losses = np.asarray(res.loss_history)
    assert np.all(np.isfinite(losses))
    assert losses[-1] < 0.2 * losses[0], losses
    c = (nz // 2, ny // 2, nx // 2)
    assert float(res.attenuation[c]) > 20.0      # true 40, measured ~51
    assert float(res.attenuation[3, 3, 3]) < 10.0  # edge stays clean


def test_tiny_3d_lbfgs_reduces_misfit():
    """run_lbfgs_3d (autodiff second path, 3D): loss decreases and the
    update moves toward the true blob."""
    from waveforminversionust_tpu.fwi.lbfgs import run_lbfgs_3d

    grid, acq, vel_true, data = _problem()
    data = data._replace(src=cpx.scale(data.src, 1e6),
                         rec_obs=cpx.scale(data.rec_obs, 1e6))
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    res = run_lbfgs_3d(vel0, data, grid, PML, iter_cap=ITER_CAP,
                       use_gmres=False, num_iterations=4,
                       estimate_sources=False)
    losses = np.asarray(res.loss_history)
    assert np.all(np.isfinite(losses))
    assert losses[-1] < 0.7 * losses[0], losses
    c = tuple(s // 2 for s in grid.shape)
    assert float(res.velocity[c]) > C0


# ---------------------------------------------------------------------------
# Random source encoding (beyond-reference; fwi3d.encode_supershots)
# ---------------------------------------------------------------------------

def _problem_full_aperture(n_elem=8):
    """Full-aperture acquisition (min_angle=0.0): every transmitter shares
    ONE canonical receiver ordering — the geometry encoding requires."""
    grid = Grid3D.centered(12e-3, 1.0e-3)
    pos = cylinder_positions(1, n_elem, 8e-3, 0.0)
    acq = build_acquisition3d(grid, pos, min_angle=0.0)
    vel_true = _blob(grid)
    src = source_fields_3d(acq, grid)
    wv, _ = born_series_solve_3d(vel_true, src, F, grid, PML,
                                 iter_cap=ITER_CAP)
    rec_obs = sample_receivers_3d(wv, jnp.asarray(acq.rx_idx))
    data = build_fwi_data_3d(acq, rec_obs, F, grid)
    # One-hot-source rescale into f32's normal range (the denormal-scale
    # pitfall on tiny 3D problems, see tests/test_fft3d.py).
    data = data._replace(src=cpx.scale(data.src, 1e6),
                         rec_obs=cpx.scale(data.rec_obs, 1e6))
    return grid, acq, vel_true, data


def test_encode_supershots_linearity():
    """u(S @ code) == u(S) @ code: the encoded forward field is the code
    combination of the per-transmitter fields (Helmholtz linearity — the
    identity source encoding rests on), and the encoded observations are
    the same combination of the raw gathers."""
    from waveforminversionust_tpu.fwi.fwi3d import encode_supershots

    grid, acq, vel_true, data = _problem_full_aperture()
    rng = np.random.default_rng(0)
    code = jnp.asarray(rng.choice([-1.0, 1.0], size=(8, 3)), jnp.float32)
    enc = encode_supershots(data, code)
    assert enc.src.re.shape[0] == 3
    assert enc.rx_idx.shape == (3,) + data.rx_idx.shape[1:]
    np.testing.assert_array_equal(
        np.asarray(enc.rx_idx),
        np.broadcast_to(np.asarray(data.rx_idx[:1]), enc.rx_idx.shape))

    vel = jnp.full(grid.shape, C0, jnp.float32)
    wv_t, _ = born_series_solve_3d(vel, data.src, F, grid, PML,
                                   iter_cap=ITER_CAP)
    wv_e, _ = born_series_solve_3d(vel, enc.src, F, grid, PML,
                                   iter_cap=ITER_CAP)
    comb_re = jnp.einsum("t...,tm->m...", wv_t.re, code)
    comb_im = jnp.einsum("t...,tm->m...", wv_t.im, code)
    scale = float(jnp.max(jnp.abs(comb_re)))
    np.testing.assert_allclose(np.asarray(wv_e.re), np.asarray(comb_re),
                               atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(wv_e.im), np.asarray(comb_im),
                               atol=2e-4 * scale)
    np.testing.assert_allclose(
        np.asarray(enc.rec_obs.re),
        np.asarray(code.T @ data.rec_obs.re), rtol=1e-5)


def test_encoded_cg_matches_manually_encoded_data():
    """One CG iteration with encode=m equals running the plain loop on
    data encoded with the SAME code (deterministic wiring check: the
    in-loop code draw is fold_in(PRNGKey(seed), iteration))."""
    import jax

    from waveforminversionust_tpu.fwi.fwi3d import encode_supershots

    grid, acq, vel_true, data = _problem_full_aperture()
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    fwi = FWIConfig(num_iterations=1, estimate_source_strength=False,
                    clip_velocity=(C0 - 100.0, C0 + 100.0))
    m, seed = 4, 7
    code = jax.random.rademacher(
        jax.random.fold_in(jax.random.PRNGKey(seed), 0), (8, m),
        jnp.float32)
    v_enc, m_enc = nonlinear_cg_3d(vel0, data, grid, fwi, pml=PML,
                                   iter_cap=ITER_CAP, encode=m,
                                   encode_seed=seed)
    v_man, m_man = nonlinear_cg_3d(vel0, encode_supershots(data, code),
                                   grid, fwi, pml=PML, iter_cap=ITER_CAP)
    np.testing.assert_allclose(np.asarray(v_enc), np.asarray(v_man),
                               rtol=1e-5, atol=1e-4)
    assert float(m_enc.loss[0]) == pytest.approx(float(m_man.loss[0]),
                                                 rel=1e-5)


def test_encoded_cg_reduces_true_misfit():
    """Encoded CG (8 tx -> 3 supershots, redrawn per iteration) still
    drives down the TRUE full-batch misfit — the stochastic-gradient
    property the ntx/m per-iteration saving rests on."""
    grid, acq, vel_true, data = _problem_full_aperture()
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    fwi = FWIConfig(num_iterations=4, estimate_source_strength=False,
                    clip_velocity=(C0 - 100.0, C0 + 100.0))
    vel, metrics = nonlinear_cg_3d(vel0, data, grid, fwi, pml=PML,
                                   iter_cap=ITER_CAP, encode=3)
    slow0, slow1 = 1.0 / vel0, 1.0 / vel
    loss0, _, _, _ = objective_pieces_3d(vel0, slow0, data, grid, PML,
                                         ITER_CAP, estimate_source=False)
    loss1, _, _, _ = objective_pieces_3d(vel, slow1, data, grid, PML,
                                         ITER_CAP, estimate_source=False)
    assert np.all(np.isfinite(np.asarray(metrics.loss)))
    assert float(loss1) < 0.7 * float(loss0), (float(loss0), float(loss1))
    c = tuple(s // 2 for s in grid.shape)
    assert float(vel[c]) > C0


def test_encode_rejects_per_tx_masks():
    """The masked-acquisition bias is refused, not silently absorbed: with
    per-tx acceptance masks the encoded crosstalk no longer cancels in
    expectation (encode_supershots docstring)."""
    grid, acq, vel_true, data = _problem()   # min_angle=0.8: per-tx masks
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    with pytest.raises(ValueError, match="shared receiver ordering"):
        nonlinear_cg_3d(vel0, data, grid, FWIConfig(num_iterations=1),
                        pml=PML, iter_cap=50, encode=2)


def test_tiny_3d_gauss_newton_inverts():
    """run_gauss_newton_3d (the volumetric second-order optimizer): loss
    monotone non-increasing (backtracking globalization), strictly lower
    at the end, update moves toward the true blob. GN normalizes the data
    internally, so the one-hot denormal rescale is not needed here."""
    from waveforminversionust_tpu.fwi.newton import run_gauss_newton_3d

    grid, acq, vel_true, data = _problem()
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    fwi = FWIConfig(estimate_source_strength=False,
                    clip_velocity=(C0 - 100.0, C0 + 100.0))
    vel, m = run_gauss_newton_3d(vel0, data, grid, fwi, num_iterations=2,
                                 cg_iters=4, pml=PML, iter_cap=ITER_CAP)
    loss = np.asarray(m.loss)
    assert np.all(np.isfinite(loss))
    assert np.all(np.diff(loss) <= 1e-6 * loss[0])
    assert np.all(np.isfinite(np.asarray(vel)))
    c = tuple(s // 2 for s in grid.shape)
    assert float(vel[c]) > C0


def test_3d_gauss_newton_composes_with_encoding():
    """Feature composition: a FIXED Rademacher code pre-encodes the data
    (encode_supershots) and GN runs on the m supershots — GN linearizes per
    outer iteration, so a static code is a well-posed (smaller) least-
    squares problem; the per-iteration redraw CG uses is only for crosstalk
    averaging. Full aperture required, as for encoded CG."""
    import jax
    from waveforminversionust_tpu.fwi.fwi3d import encode_supershots
    from waveforminversionust_tpu.fwi.newton import run_gauss_newton_3d

    grid = Grid3D.centered(12e-3, 1.0e-3)
    pos = cylinder_positions(1, 8, 8e-3, 0.0)
    acq = build_acquisition3d(grid, pos, min_angle=0.0)  # full aperture
    vel_true = _blob(grid)
    src = source_fields_3d(acq, grid)
    wv, _ = born_series_solve_3d(vel_true, src, F, grid, PML,
                                 iter_cap=ITER_CAP)
    rec_obs = sample_receivers_3d(wv, jnp.asarray(acq.rx_idx))
    data = build_fwi_data_3d(acq, rec_obs, F, grid)
    code = jax.random.rademacher(jax.random.PRNGKey(3), (8, 4), jnp.float32)
    enc = encode_supershots(data, code)

    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    fwi = FWIConfig(estimate_source_strength=False,
                    clip_velocity=(C0 - 100.0, C0 + 100.0))
    vel, m = run_gauss_newton_3d(vel0, enc, grid, fwi, num_iterations=2,
                                 cg_iters=3, pml=PML, iter_cap=ITER_CAP)
    loss = np.asarray(m.loss)
    assert np.all(np.isfinite(loss))
    assert np.all(np.diff(loss) <= 1e-6 * loss[0])
    c = tuple(s // 2 for s in grid.shape)
    assert float(vel[c]) > C0


def test_scattered_field_encoding_converges_where_total_stalls():
    """scattered_data_3d: background subtraction makes random source
    encoding usable at weak contrast. Encoded-TOTAL crosstalk noise rides
    the direct-arrival amplitude while the gradient signal rides the
    (1.4%-RMS) scattering, so the total-field encoded inversion does not
    improve; the scattered-field one converges (measured here and, at
    128^3, in PERF_NOTES). Also pins the calibration: at zero contrast
    the scattered observations vanish to solver tolerance."""
    from waveforminversionust_tpu.fwi.fwi3d import (encode_supershots,
                                                    scattered_data_3d)
    from waveforminversionust_tpu.ops.born3d import born_gmres_solve_3d
    from waveforminversionust_tpu.ops.cpx import Cpx

    f = 250e3
    grid = Grid3D.centered(12e-3, 1.0e-3)
    pos = cylinder_positions(2, 8, 8e-3, 6e-3)
    acq = build_acquisition3d(grid, pos, min_angle=0.0)  # encode needs this
    z = grid.z0 + grid.dz * jnp.arange(grid.nz)
    y = grid.y0 + grid.dy * jnp.arange(grid.ny)
    x = grid.x0 + grid.dx * jnp.arange(grid.nx)
    r2 = (z[:, None, None] ** 2 + (y[None, :, None] - 1e-3) ** 2
          + x[None, None, :] ** 2)
    vel_true = (C0 + 80.0 * jnp.exp(-r2 / (2 * 3e-3 ** 2))
                ).astype(jnp.float32)

    # unknown per-element complex amplitudes exercise the calibration
    rng = np.random.default_rng(0)
    amps = (rng.standard_normal(16)
            + 1j * rng.standard_normal(16)).astype(np.complex64)
    src_unit = cpx.scale(source_fields_3d(acq, grid), 1e6)
    src_amp = cpx.mul(src_unit,
                      Cpx(jnp.asarray(amps.real)[:, None, None, None],
                          jnp.asarray(amps.imag)[:, None, None, None]))
    wv, _ = born_gmres_solve_3d(vel_true, src_amp, f, grid, PML, tol=1e-6)
    rec_obs = sample_receivers_3d(wv, jnp.asarray(acq.rx_idx))
    data = build_fwi_data_3d(acq, rec_obs, f, grid)._replace(src=src_unit)

    dscat = scattered_data_3d(data, grid, c_ref=C0, pml=PML, gmres_tol=1e-6)
    sig = float(np.sqrt(np.mean(np.asarray(dscat.rec_obs.re) ** 2
                                + np.asarray(dscat.rec_obs.im) ** 2)))
    ref = float(np.sqrt(np.mean(np.asarray(dscat.rec_ref.re) ** 2
                                + np.asarray(dscat.rec_ref.im) ** 2)))
    assert 1e-3 < sig / ref < 0.1, sig / ref    # weak-scattering regime

    # zero contrast -> scattered observations ~ 0 (calibration exact)
    wv0, _ = born_gmres_solve_3d(jnp.full(grid.shape, C0), src_amp, f,
                                 grid, PML, tol=1e-6)
    d0 = build_fwi_data_3d(
        acq, sample_receivers_3d(wv0, jnp.asarray(acq.rx_idx)), f,
        grid)._replace(src=src_unit)
    ds0 = scattered_data_3d(d0, grid, c_ref=C0, pml=PML, gmres_tol=1e-6)
    r0 = float(np.sqrt(np.mean(np.asarray(ds0.rec_obs.re) ** 2
                               + np.asarray(ds0.rec_obs.im) ** 2)))
    assert r0 < 1e-4 * ref, (r0, ref)

    # encode_supershots carries the reference gather
    code = jnp.ones((16, 4), jnp.float32)
    enc = encode_supershots(dscat, code)
    assert enc.rec_ref.re.shape == (4,) + dscat.rec_ref.re.shape[1:]

    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    fwi = FWIConfig(num_iterations=5, clip_velocity=(C0 - 120, C0 + 120))
    rmse = lambda v: float(jnp.sqrt(jnp.mean((v - vel_true) ** 2)))
    kw = dict(pml=PML, iter_cap=600, solver3d="gmres", gmres_tol=1e-6,
              encode=4)
    v_tot, _ = nonlinear_cg_3d(vel0, data, grid, fwi, **kw)
    v_sc, m_sc = nonlinear_cg_3d(vel0, dscat, grid, fwi, **kw)
    r_init, r_tot, r_sc = rmse(vel0), rmse(v_tot), rmse(v_sc)
    assert r_sc < 0.8 * r_init, (r_init, r_sc)      # measured 7.85 -> 5.60
    assert r_tot > r_sc, (r_tot, r_sc)              # measured 61.6
    assert np.all(np.isfinite(np.asarray(m_sc.loss)))


def test_chunked_cg_matches_single_scan():
    """chunk_iterations runs the CG scan as several jitted programs with
    exact carry passthrough — identical trajectory to the single scan
    (the per-program device-time workaround for the relay, PERF_NOTES),
    including the momentum it=0 branch and per-iteration encode redraws
    (global iteration indices thread through)."""
    grid, acq, vel_true, data = _problem()
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    fwi = FWIConfig(num_iterations=4, estimate_source_strength=False,
                    clip_velocity=(C0 - 100.0, C0 + 100.0))
    v_ref, m_ref = nonlinear_cg_3d(vel0, data, grid, fwi, pml=PML,
                                   iter_cap=ITER_CAP)
    v_ch, m_ch = nonlinear_cg_3d(vel0, data, grid, fwi, pml=PML,
                                 iter_cap=ITER_CAP, chunk_iterations=3)
    # Not bitwise: it0 is a traced input in the chunked program, so XLA
    # compiles (and rounds) slightly differently — measured 3.5e-6
    # relative at the last step.
    np.testing.assert_allclose(np.asarray(v_ch), np.asarray(v_ref),
                               rtol=0, atol=1e-4 * C0)
    np.testing.assert_allclose(np.asarray(m_ch.loss),
                               np.asarray(m_ref.loss), rtol=1e-4)
    # beta is NOT asserted: this toy converges to the f32 floor within 2
    # iterations, where the HS denominator is rounding noise (NaN in one
    # program, tiny in the other — both guarded by reject_nonfinite).


def test_tiny_3d_bb_step_reduces_misfit():
    """StepSizeFormula.BB in the 3D loop (skips the line-search GMRES
    solve on valid-curvature iterations; composes with the warm-start
    carry): finite, decreasing misfit from the correct background — BB's
    valid regime (PERF_NOTES round 5)."""
    from waveforminversionust_tpu.config import StepSizeFormula

    grid, acq, vel_true, data = _problem()
    # One-hot-scale denormal pitfall: keep |rhs|^2 in f32's normal range
    # (same scaling as test_tiny_3d_gmres_inversion_reduces_misfit).
    data = data._replace(src=cpx.scale(data.src, 1e6),
                         rec_obs=cpx.scale(data.rec_obs, 1e6))
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    fwi = FWIConfig(num_iterations=3, estimate_source_strength=False,
                    clip_velocity=(C0 - 100.0, C0 + 100.0),
                    step_size=StepSizeFormula.BB)
    vel, metrics = nonlinear_cg_3d(vel0, data, grid, fwi, pml=PML,
                                   iter_cap=120, solver3d="gmres",
                                   gmres_tol=1e-4)
    losses = np.asarray(metrics.loss)
    assert np.all(np.isfinite(losses))
    assert losses[-1] < 0.9 * losses[0], losses
    c = tuple(s // 2 for s in grid.shape)
    assert float(vel[c]) > C0


def test_3d_bb_rejects_encoding():
    from waveforminversionust_tpu.config import StepSizeFormula

    grid, acq, vel_true, data = _problem()
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    fwi = FWIConfig(num_iterations=1, step_size=StepSizeFormula.BB)
    with pytest.raises(ValueError, match="encode"):
        nonlinear_cg_3d(vel0, data, grid, fwi, pml=PML, iter_cap=60,
                        encode=2)


def test_3d_watchdog_neutral_when_clean():
    """FWIConfig.reject_increase: on a clean (monotone) run the watchdog
    never triggers and the trajectory is IDENTICAL to the unguarded run;
    composes with BB + warm start (PERF_NOTES round 5)."""
    from waveforminversionust_tpu.config import StepSizeFormula

    grid, acq, vel_true, data = _problem()
    data = data._replace(src=cpx.scale(data.src, 1e6),
                         rec_obs=cpx.scale(data.rec_obs, 1e6))
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    base = dict(num_iterations=3, estimate_source_strength=False,
                clip_velocity=(C0 - 100.0, C0 + 100.0))
    kw = dict(pml=PML, iter_cap=120, solver3d="gmres", gmres_tol=1e-4)
    v0_, m0 = nonlinear_cg_3d(vel0, data, grid, FWIConfig(**base), **kw)
    v1_, m1 = nonlinear_cg_3d(vel0, data, grid,
                              FWIConfig(**base, reject_increase=1.5), **kw)
    np.testing.assert_allclose(np.asarray(v1_), np.asarray(v0_), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1.loss), np.asarray(m0.loss),
                               rtol=1e-6)
    # BB + watchdog: runs, finite, and ends no worse than it started.
    vb, mb = nonlinear_cg_3d(
        vel0, data, grid,
        FWIConfig(**base, step_size=StepSizeFormula.BB,
                  reject_increase=1.5), **kw)
    lb = np.asarray(mb.loss)
    assert np.all(np.isfinite(lb))
    assert lb[-1] < lb[0], lb


def test_3d_watchdog_rejects_encoding_and_bad_ratio():
    grid, acq, vel_true, data = _problem()
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    with pytest.raises(ValueError, match="reject_increase must be > 1"):
        nonlinear_cg_3d(vel0, data, grid,
                        FWIConfig(num_iterations=1, reject_increase=1.0),
                        pml=PML, iter_cap=60)
    with pytest.raises(ValueError, match="incompatible with encode"):
        nonlinear_cg_3d(vel0, data, grid,
                        FWIConfig(num_iterations=1, reject_increase=1.5),
                        pml=PML, iter_cap=60, encode=2)
