"""Truncated Gauss-Newton FWI (inexact Newton-CG) — beyond the reference.

The reference ships first-order optimizers only: hand-derived nonlinear CG
(reference: nonlinearcg.py:71-169) and an L-BFGS wrapper whose gradient
path is broken (fwi_loss_function.py:106-132; SURVEY.md Appendix A). This
module adds second-order model updates from the same adjoint-state
identities the CG loop uses — no autodiff through the solve is needed,
because the Frechet derivative and its adjoint are each ONE Helmholtz
solve against the iteration's single factorization:

    J dm          = sample(H^-1 (-VIRT .* dm))                 (one solve)
    J^H r         = -sum_tx Re(conj(VIRT) .* H^-H scatter(r))  (one solve)
    GN-Hessian dm = J^H (J dm)                                 (two solves)

(VIRT = dk^2/dslowness * u, the virtual source of objective.virtual_source;
the identities are the reference's own gradient algebra, nonlinearcg.py:
118-127 / FrequencyDomainFWI.m:110-117, applied twice.)

Each outer iteration: forward + adjoint solve for (loss, gradient), then a
fixed-length inner linear CG on the Levenberg-Marquardt-damped normal
equations

    (J^H J + lam * diag(illum)) dm = -grad,

preconditioned by the illumination diagonal (objective.illumination_map —
the GN pseudo-Hessian diagonal surrogate), then the reference's linearized
exact step along dm, made monotone by halve-until-decrease backtracking
(each trial = one factorization + forward solve; zero trials on the
measured workloads). The 2 + 2*cg_iters gradient/Hvp solves of an outer
iteration reuse ONE banded factorization; on TPU that is the fused Pallas
factor + sweeps (ops/pallas_factor.py, ops/pallas_sweep.py), so an inner
Hvp costs two sweep passes, not a factorization.

Why it earns its place next to CG: the GN step solves the local quadratic
model instead of scaling a (preconditioned) gradient, which untangles the
cross-talk between model pixels that share receivers — fewer outer
iterations (= fewer factorizations) to a given misfit on hard contrasts.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import FWIConfig, SolverConfig
from ..models.grid import Grid2D
from ..ops import cpx
from ..ops.cpx import Cpx
from ..ops.solve import helmholtz_operator_solve, make_helmholtz_operator
from .objective import (FWIData, estimate_source_strengths, illumination_map,
                        mass_spread, misfit, sample_receivers,
                        scatter_to_fields, virtual_source)


class GNMetrics(NamedTuple):
    loss: jnp.ndarray        # (outer,) misfit BEFORE the iteration's update
    grad_norm: jnp.ndarray   # (outer,)
    step_size: jnp.ndarray   # (outer,) accepted step along dm (0 = rejected)
    cg_relres: jnp.ndarray   # (outer,) inner-CG relative residual at exit
    backtracks: jnp.ndarray  # (outer,) step halvings the globalization took


class GNResult(NamedTuple):
    velocity: jnp.ndarray    # (ny, nx)
    metrics: GNMetrics


def _mul_fields(fields, scalar_map):
    """fields * scalar_map[None] for complex64 or Cpx fields."""
    if isinstance(fields, Cpx):
        return cpx.scale(fields, scalar_map[None])
    return fields * scalar_map[None].astype(fields.dtype)


def _laplacian_ltl(m):
    """L^T L for first-order forward differences along every axis (the
    Hessian of regularization.tikhonov_value, dimension-generic). Operator
    inf-norm is 4 * ndim."""
    out = jnp.zeros_like(m)
    for ax in range(m.ndim):
        lo = tuple(slice(None, -1) if a == ax else slice(None)
                   for a in range(m.ndim))
        hi = tuple(slice(1, None) if a == ax else slice(None)
                   for a in range(m.ndim))
        d = m[hi] - m[lo]
        out = out.at[lo].add(-d)
        out = out.at[hi].add(d)
    return out


def _pcg(hvp, b, diag, cg_iters: int, cg_tol: float):
    """Fixed-length diagonally-preconditioned linear CG on the damped
    normal equations; converged iterations freeze (post-convergence
    updates run on subnormal residuals and can NaN — measured). Returns
    (x, relres)."""
    x = jnp.zeros_like(b)
    r = b
    z = r / diag
    p = z
    rz = jnp.sum(r * z)
    b2 = jnp.maximum(jnp.sum(b * b), 1e-38)
    tol2 = cg_tol ** 2 * b2

    def step(carry, _):
        x, r, p, rz = carry
        live = jnp.sum(r * r) > tol2
        ap = hvp(p)
        alpha = rz / jnp.maximum(jnp.sum(p * ap), 1e-38)
        x1 = x + alpha * p
        r1 = r - alpha * ap
        z1 = r1 / diag
        rz1 = jnp.sum(r1 * z1)
        p1 = z1 + (rz1 / jnp.maximum(rz, 1e-38)) * p
        new = tuple(jnp.where(live, a, b_)
                    for a, b_ in zip((x1, r1, p1, rz1), (x, r, p, rz)))
        return new, None

    (x, r, _, _), _ = jax.lax.scan(step, (x, r, p, rz), None,
                                   length=cg_iters)
    return x, jnp.sqrt(jnp.sum(r * r) / b2)


def _linearized_step(drec, residual):
    """The reference's RESIDUAL step formula along a direction whose
    receiver response is ``drec`` (nonlinearcg.py:22-32), nonfinite-safe."""
    if isinstance(drec, Cpx):
        num = -jnp.sum(drec.re * residual.re + drec.im * residual.im)
        den = jnp.sum(drec.re ** 2 + drec.im ** 2)
    else:
        num = -jnp.real(jnp.sum(jnp.conj(drec) * residual))
        den = jnp.real(jnp.sum(jnp.conj(drec) * drec))
    step = num / jnp.maximum(den, 1e-38)
    return jnp.where(jnp.isfinite(step), step, 0.0)


def _data_normalization(rec_obs):
    """O(1)-data scale factor (f32 conditioning; see run_gauss_newton)."""
    if isinstance(rec_obs, Cpx):
        d2 = jnp.mean(cpx.abs2(rec_obs))
    else:
        d2 = jnp.mean(jnp.abs(rec_obs) ** 2)
    return 1.0 / jnp.sqrt(jnp.maximum(d2, 1e-38))


def _grad_contract(virt, adj_wv):
    """-sum_tx Re(conj(VIRT) * adjoint field) — the adjoint-state gradient
    contraction (reference: nonlinearcg.py:126-127)."""
    if isinstance(virt, Cpx):
        return -jnp.sum(virt.re * adj_wv.re + virt.im * adj_wv.im, axis=0)
    return -jnp.sum(jnp.real(jnp.conj(virt) * adj_wv), axis=0)


def make_frechet_operators(op, data: FWIData, grid: Grid2D,
                           solver: SolverConfig, slow, wv,
                           exact: bool = True, mesh=None,
                           grid_axis: str = "grid"):
    """The Frechet derivative of the receiver data and its adjoint, each as
    ONE Helmholtz sweep against a prepared (factored) operator:

        j_apply(dm) = J dm        (ntx, n_active) receiver perturbation
        jt_apply(r) = Re(J^H r)   (ny, nx) real model cotangent

    ``wv`` is the forward wavefield at the linearization point (with any
    per-shot source scales already applied).

    ``exact=True`` differentiates the DISCRETE 9-point operator: the mass
    term rides all nine stencil legs weighted (1-d-e, d/4, e/4) and the PML
    field C (stencil.helmholtz_coefficients), and the Dirichlet border rows
    are model-independent — so the perturbation source is masked and spread
    with objective.mass_spread. ``exact=False`` is the classical lumped
    virtual source — the reference's published gradient formula
    (nonlinearcg.py:118-127), which on this discretization carries an
    eps-independent ~7% directional bias (measured, tests/test_newton.py);
    the CG loop keeps it for reference-trajectory parity."""
    from functools import partial as _partial

    alpha_signed = None
    if data.attenuation is not None:
        alpha_signed = (jnp.sign(jnp.float32(solver.pml.sign_convention))
                        * data.attenuation)
    virt = virtual_source(slow, wv, data.f, alpha_signed)
    solve = _partial(helmholtz_operator_solve, grid=grid, cfg=solver,
                     mesh=mesh, grid_axis=grid_axis)

    if exact:
        from ..ops.stencil import boundary_mask, stencil_params
        vel = 1.0 / slow
        _, d_w, e_w = stencil_params(jnp.min(vel), jnp.max(vel), data.f,
                                     jnp.float32(grid.h),
                                     jnp.float32(grid.aspect), solver.stencil)
        interior = 1.0 - boundary_mask(grid)
        if solver.split_complex:
            from ..ops.split_engine import pml_stretch_fields_cpx
            C = pml_stretch_fields_cpx(grid, data.f, solver.pml)[2]
        else:
            from ..ops.stencil import pml_stretch_fields
            C = pml_stretch_fields(grid, data.f, solver.pml)[2]
        # cvirt = C * virt: the mass rows carry C k^2, so dH/dslow does too
        if isinstance(virt, Cpx):
            cvirt = cpx.mul(Cpx(C.re[None], C.im[None]), virt) \
                if isinstance(C, Cpx) else cpx.scale(virt, C[None])
        else:
            cvirt = C[None] * virt

        def j_apply(dm):
            pert = mass_spread(_mul_fields(cvirt, dm), d_w, e_w)
            du = solve(op, src=_mul_fields(pert, -interior))
            return sample_receivers(du, data.rx_y, data.rx_x, data.rx_w)

        def jt_apply(r):
            a = solve(op, src=scatter_to_fields(r, data.rx_y, data.rx_x,
                                                grid.shape, data.rx_w),
                      adjoint=True)
            aw = mass_spread(_mul_fields(a, interior), d_w, e_w)
            return _grad_contract(cvirt, aw)

        return j_apply, jt_apply, virt

    def j_apply(dm):
        du = solve(op, src=_mul_fields(virt, -dm))
        return sample_receivers(du, data.rx_y, data.rx_x, data.rx_w)

    def jt_apply(r):
        a = solve(op, src=scatter_to_fields(r, data.rx_y, data.rx_x,
                                            grid.shape, data.rx_w),
                  adjoint=True)
        return _grad_contract(virt, a)

    return j_apply, jt_apply, virt


@partial(jax.jit, static_argnames=("grid", "solver", "fwi", "num_iterations",
                                   "cg_iters", "exact_frechet", "mesh",
                                   "grid_axis"))
def run_gauss_newton(vel_init, data: FWIData, grid: Grid2D,
                     solver: SolverConfig = SolverConfig(),
                     fwi: FWIConfig = FWIConfig(),
                     num_iterations: int = 5, cg_iters: int = 8,
                     lm_damping: float = 0.1,
                     reg_smooth: float = 1.0,
                     cg_tol: float = 1e-3,
                     exact_frechet: bool = True,
                     mesh=None, grid_axis: str = "grid") -> GNResult:
    """Truncated Gauss-Newton inversion as one compiled scan.

    Args:
        num_iterations: outer GN iterations (one factorization each).
        cg_iters: inner linear-CG iterations on the damped normal equations
            (each costs two Helmholtz sweeps against the outer factor).
        lm_damping: Levenberg-Marquardt damping as a fraction of the
            illumination diagonal — 0 trusts the (truncated) quadratic
            model fully; larger blends toward the preconditioned-gradient
            direction.
        cg_tol: inner-CG early-exit relative residual (iterations after
            convergence become no-ops inside the fixed-length scan).

    Respects ``fwi.estimate_source_strength`` (per-shot scales frozen per
    outer iteration — first-order variable projection, like the CG loop)
    and ``fwi.clip_velocity``; non-finite or non-decreasing steps are
    always rejected by the backtracking globalization (monotone by
    construction — see the in-body comment).

    ``mesh``/``grid_axis``: with ``solver.factorization == "spike"``, run
    every factorization/solve — forward, adjoint, all inner Hvps,
    backtracking trials — grid-sharded over the mesh axis (one y-slab per
    device; parallel.spike), exactly as in optimizers.nonlinear_cg. The
    shot axis needs no flag: shard the data (parallel.sharding.
    shard_fwi_data) and GSPMD distributes the whole Newton-CG.
    """
    vel0 = jnp.asarray(vel_init, jnp.float32)
    slow0 = 1.0 / vel0

    # f32 conditioning: normalize the DATA to O(1) (the same medicine
    # run_lbfgs documents for its loss). Unit-amplitude ring data is
    # O(1e-10), so normal-equation products (|J dm|^2 ~ |rec|^2-scale
    # squared) underflow f32 denormals and the linearized step becomes
    # inf (measured: every GN step rejected, t=inf, den flushed to 0).
    # Scaling src AND rec_obs by the same factor is an exactly equivalent
    # problem: rec_sim is linear in src, source estimation is scale-free,
    # and the reported loss is un-scaled back below.
    s_d = _data_normalization(data.rec_obs)

    def _sc(x):
        return cpx.scale(x, s_d) if isinstance(x, Cpx) else x * s_d

    data = data._replace(src=_sc(data.src), rec_obs=_sc(data.rec_obs))
    loss_unscale = 1.0 / (s_d * s_d)

    if solver.split_complex:
        from ..ops.split_engine import pml_stretch_fields_cpx
        pml_fields = pml_stretch_fields_cpx(grid, data.f, solver.pml)
    else:
        from ..ops.stencil import pml_stretch_fields
        pml_fields = pml_stretch_fields(grid, data.f, solver.pml)

    def project(slow_x):
        """Clip-to-bounds in velocity space (fwi.clip_velocity guard)."""
        if fwi.clip_velocity is None:
            return slow_x
        lo, hi = fwi.clip_velocity
        return 1.0 / jnp.clip(1.0 / slow_x, lo, hi)

    def forward(slow_x):
        """Operator build + forward solve + (frozen) source scales + misfit
        at a model point — shared by the outer iteration and the
        backtracking trials."""
        op_x = make_helmholtz_operator(1.0 / slow_x, data.f, grid, solver,
                                       attenuation=data.attenuation,
                                       pml_fields=pml_fields, mesh=mesh,
                                       grid_axis=grid_axis)
        wv_x = helmholtz_operator_solve(op_x, data.src, grid, solver,
                                        mesh=mesh, grid_axis=grid_axis)
        rec_x = sample_receivers(wv_x, data.rx_y, data.rx_x, data.rx_w)
        if fwi.estimate_source_strength:
            s_est = estimate_source_strengths(rec_x, data.rec_obs)
            if isinstance(wv_x, Cpx):
                wv_x = cpx.mul(wv_x, s_est[:, None, None])
                rec_x = cpx.mul(rec_x, s_est[:, None])
            else:
                wv_x = wv_x * s_est[:, None, None]
                rec_x = rec_x * s_est[:, None]
        return op_x, wv_x, rec_x, misfit(rec_x, data.rec_obs)

    def forward_state(slow_x):
        return (slow_x,) + forward(slow_x)

    # The scan carry holds the FULL forward state (model, factored
    # operator, scaled wavefield, receiver data, misfit): the accepted
    # backtracking trial's evaluation IS the next iteration's forward
    # work, so nothing is recomputed — one factorization + forward solve
    # per accepted step, not two.
    def outer(carry, _):
        slow, op, wv, rec_sim, loss = carry
        residual = rec_sim - data.rec_obs

        j_apply, jt_apply, virt = make_frechet_operators(
            op, data, grid, solver, slow, wv, exact=exact_frechet,
            mesh=mesh, grid_axis=grid_axis)
        grad = jt_apply(residual)

        # Diagonal surrogate of J^H J: the Shin pseudo-Hessian
        # sum_tx |VIRT|^2 — illumination of the VIRTUAL SOURCE, not of the
        # wavefield. The (2 omega^2 slow)^2 factor matters: |u|^2-only
        # illumination is ~19 orders smaller than diag(J^H J) here, which
        # silently turns damping and smoothing into no-ops (measured: a
        # 100x reg_smooth ladder left loss AND model bit-identical).
        # Note the pseudo-Hessian's MAGNITUDE relative to diag(J^H J) is
        # geometry-dependent (it misses the receiver-side Green's factor),
        # so lm_damping/reg_smooth are per-problem knobs — as in every
        # Levenberg-Marquardt implementation. A Hutchinson-calibrated
        # variant (true-curvature scale) was measured and NOT adopted
        # here: it rescales the knobs per geometry but did not improve
        # (toy blob: best err 1.36 at rs=300 calibrated vs 0.85 at rs=1
        # raw; the reference-workload results in PERF_NOTES use the raw
        # scale). resolution.psf_probe DOES calibrate — appraisal needs
        # damping in true-curvature units.
        illum = illumination_map(virt)
        diag = illum + fwi.precondition_eps * jnp.max(illum)
        # Smoothing term in the CURVATURE only (Marquardt-style): within
        # data-fit-equivalent update directions the inner CG then picks the
        # smooth one — the single-frequency GN subproblem is rank-deficient
        # (anti-inverse-crime data contains components the coarse operator
        # cannot produce; undamped GN fits them with high-wavenumber model
        # artifacts: measured loss 40x below CG-3 while model error ROSE,
        # tests/test_newton.py). L^T L is the forward-difference Laplacian
        # of tikhonov_value; scaled by mean(diag)/8 so reg_smooth=1 weighs
        # it like the average data curvature. The objective (and the
        # backtracking guard) stays the pure misfit.
        s_reg = reg_smooth * jnp.mean(diag) / 8.0

        def hvp(dm):
            return (jt_apply(j_apply(dm)) + lm_damping * diag * dm
                    + s_reg * _laplacian_ltl(dm))

        # Inner preconditioned linear CG on (J^H J + lam diag) dm = -grad.
        dm, cg_relres = _pcg(hvp, -grad, diag, cg_iters, cg_tol)

        # Linearized exact step along dm (the reference's RESIDUAL formula,
        # nonlinearcg.py:22-32): corrects the truncated-CG scale.
        step = _linearized_step(j_apply(dm), residual)

        # Globalization: backtrack (halve the step) until the TRUE misfit
        # decreases — GN steps can overshoot where the Born linearization
        # is poor (strong scattering far from the optimum); the CG loop
        # never needs this because its gradient steps are small, but a
        # second-order method must be made monotone BY CONSTRUCTION. Each
        # trial costs one factorization + forward solve; the while_loop
        # only runs trials that are actually needed.
        max_bt = 4

        def bt_cond(st):
            k, _, cand = st
            l_new = cand[4]
            return jnp.logical_and(jnp.logical_or(~jnp.isfinite(l_new),
                                                  l_new >= loss), k < max_bt)

        def bt_body(st):
            k, t, _ = st
            t2 = 0.5 * t
            return (k + 1, t2, forward_state(project(slow + t2 * dm)))

        k_bt, t_eff, cand = jax.lax.while_loop(
            bt_cond, bt_body,
            (jnp.int32(0), step, forward_state(project(slow + step * dm))))
        ok = jnp.logical_and(jnp.isfinite(cand[4]), cand[4] < loss)
        new_carry = jax.tree.map(lambda n, o: jnp.where(ok, n, o),
                                 cand, carry)
        t_eff = jnp.where(ok, t_eff, 0.0)

        m = GNMetrics(loss=loss * loss_unscale,
                      grad_norm=jnp.linalg.norm(grad) * loss_unscale,
                      step_size=t_eff, cg_relres=cg_relres,
                      backtracks=k_bt)
        return new_carry, m

    carry, metrics = jax.lax.scan(outer, forward_state(slow0), None,
                                  length=num_iterations)
    return GNResult(velocity=1.0 / carry[0], metrics=metrics)


# ---------------------------------------------------------------------------
# 3D: the same inexact Newton-CG over the spectral (CBS/GMRES) solver.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("grid", "fwi", "num_iterations",
                                   "cg_iters", "pml", "iter_cap", "solver3d",
                                   "gmres_tol", "gmres_restart", "spectral"))
def run_gauss_newton_3d(vel_init, data, grid, fwi: FWIConfig = FWIConfig(),
                        num_iterations: int = 5, cg_iters: int = 6,
                        lm_damping: float = 0.1, reg_smooth: float = 1.0,
                        cg_tol: float = 1e-3, pml=None, iter_cap: int = 600,
                        solver3d: str = "gmres", gmres_tol: float = 2e-3,
                        gmres_restart: int = 8, spectral: str = "auto"):
    """Truncated Gauss-Newton over the 3D spectral solver — the volumetric
    member of the optimizer family (CG: fwi3d.nonlinear_cg_3d; L-BFGS:
    lbfgs.run_lbfgs_3d; this: second order).

    Same scheme as :func:`run_gauss_newton`: per outer iteration one
    forward + one adjoint solve give (loss, gradient); ``cg_iters`` of
    pseudo-Hessian-preconditioned linear CG on the LM-damped + smoothed
    normal equations give the update; the linearized exact step +
    halve-until-decrease backtracking keep it monotone. Unlike 2D there is
    no factorization to amortize — every J/J^H application is a full
    CBS/GMRES solve — so ``cg_iters`` is the cost knob: an outer iteration
    costs (3 + 2*cg_iters + backtracks) solves. For large transmit counts
    pre-encode the data into supershots (fwi3d.encode_supershots with a
    FIXED code — GN linearizes per outer iteration, so a per-iteration
    redraw is not needed for correctness, only for crosstalk averaging).

    One simplification vs 2D: the CBS operator applies k^2 POINTWISE
    (ops/born3d.py — no 9-point mass distribution), so the classical
    virtual source IS the exact discrete Frechet here; there is no
    exact/lumped split.

    Args:
        data: :class:`~.fwi3d.FWIData3D`.
        pml: defaults to the 3D solvers' PMLConfig(a0=20, l_pml=12e-3).

    Returns:
        (velocity (nz, ny, nx), GNMetrics history).
    """
    from ..config import PMLConfig
    from .fwi3d import (_make_solve_3d, sample_receivers_3d,
                        scatter_to_volumes_3d)

    if pml is None:
        pml = PMLConfig(a0=20.0, l_pml=12e-3)
    solve = _make_solve_3d(grid, pml, iter_cap, solver3d=solver3d,
                           gmres_tol=gmres_tol, gmres_restart=gmres_restart,
                           spectral=spectral)

    vel0 = jnp.asarray(vel_init, jnp.float32)
    s_d = _data_normalization(data.rec_obs)
    data = data._replace(src=cpx.scale(data.src, s_d),
                         rec_obs=cpx.scale(data.rec_obs, s_d))
    loss_unscale = 1.0 / (s_d * s_d)

    def project(slow_x):
        if fwi.clip_velocity is None:
            return slow_x
        lo, hi = fwi.clip_velocity
        return 1.0 / jnp.clip(1.0 / slow_x, lo, hi)

    def forward(slow_x):
        wv_x, _ = solve(1.0 / slow_x, data.src, data.f,
                        attenuation=data.attenuation)
        rec_x = sample_receivers_3d(wv_x, data.rx_idx)
        if fwi.estimate_source_strength:
            s_est = estimate_source_strengths(rec_x, data.rec_obs)
            wv_x = cpx.mul(wv_x, Cpx(s_est.re[:, None, None, None],
                                     s_est.im[:, None, None, None]))
            rec_x = cpx.mul(rec_x, Cpx(s_est.re[:, None],
                                       s_est.im[:, None]))
        return wv_x, rec_x, misfit(rec_x, data.rec_obs)

    def forward_state(slow_x):
        return (slow_x,) + forward(slow_x)

    # Forward state rides the scan carry (cf. run_gauss_newton): the
    # accepted trial's volumetric solve IS the next iteration's forward —
    # one full CBS/GMRES solve saved per outer iteration.
    def outer(carry, _):
        slow, wv, rec_sim, loss = carry
        vel = 1.0 / slow
        residual = rec_sim - data.rec_obs

        # virtual_source / _grad_contract are dimension-generic ([None]
        # broadcast over the field axes) — shared with the 2D paths.
        alpha_signed = None
        if data.attenuation is not None:
            alpha_signed = (jnp.sign(jnp.float32(pml.sign_convention))
                            * data.attenuation)
        virt = virtual_source(slow, wv, data.f, alpha_signed)

        def j_apply(dm):
            du, _ = solve(vel, cpx.scale(virt, -dm[None]), data.f,
                          attenuation=data.attenuation)
            return sample_receivers_3d(du, data.rx_idx)

        def jt_apply(r):
            a, _ = solve(vel, scatter_to_volumes_3d(r, data.rx_idx,
                                                    grid.shape),
                         data.f, adjoint=True, attenuation=data.attenuation)
            return _grad_contract(virt, a)

        grad = jt_apply(residual)
        illum = illumination_map(virt)
        diag = illum + fwi.precondition_eps * jnp.max(illum)
        s_reg = reg_smooth * jnp.mean(diag) / 12.0  # ||L^T L||_inf = 4*ndim

        def hvp(dm):
            return (jt_apply(j_apply(dm)) + lm_damping * diag * dm
                    + s_reg * _laplacian_ltl(dm))

        dm, cg_relres = _pcg(hvp, -grad, diag, cg_iters, cg_tol)
        step = _linearized_step(j_apply(dm), residual)

        max_bt = 4

        def bt_cond(st):
            k, _, cand = st
            l_new = cand[3]
            return jnp.logical_and(jnp.logical_or(~jnp.isfinite(l_new),
                                                  l_new >= loss), k < max_bt)

        def bt_body(st):
            k, t, _ = st
            t2 = 0.5 * t
            return (k + 1, t2, forward_state(project(slow + t2 * dm)))

        k_bt, t_eff, cand = jax.lax.while_loop(
            bt_cond, bt_body,
            (jnp.int32(0), step, forward_state(project(slow + step * dm))))
        ok = jnp.logical_and(jnp.isfinite(cand[3]), cand[3] < loss)
        new_carry = jax.tree.map(lambda n, o: jnp.where(ok, n, o),
                                 cand, carry)
        t_eff = jnp.where(ok, t_eff, 0.0)

        m = GNMetrics(loss=loss * loss_unscale,
                      grad_norm=jnp.linalg.norm(grad) * loss_unscale,
                      step_size=t_eff, cg_relres=cg_relres,
                      backtracks=k_bt)
        return new_carry, m

    carry, metrics = jax.lax.scan(outer, forward_state(1.0 / vel0), None,
                                  length=num_iterations)
    return 1.0 / carry[0], metrics
