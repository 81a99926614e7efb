"""Nonlinear conjugate-gradient FWI — the reference's primary inversion path,
compiled to a single jitted ``lax.scan``.

Per iteration (reference: nonlinearcg.py:71-169, FrequencyDomainFWI.m:76-189):
  1. forward Helmholtz solve for all transmitters
  2. per-tx complex source-strength estimation
  3. adjoint sources from receiver residuals; adjoint Helmholtz solve
  4. gradient = -sum_tx Re(conj(VIRT) * adjoint field)
  5. CG momentum (5 selectable formulas) -> search direction
  6. forward-project the search direction (3rd Helmholtz solve)
  7. linearized line search (3 selectable step formulas); slowness update

TPU-native differences from the reference:
  * all three solves per iteration share ONE banded factorization (the
    reference host-factorizes 3x per iteration);
  * the full loop lives in one XLA program — no host round-trips
    (the reference crosses the device/host boundary 3x per iteration);
  * per-iteration scalars (loss, |grad|, beta, step) are returned as scan
    outputs instead of being lost (the reference records no loss history —
    SURVEY.md section 5);
  * momentum/step formulas are config enums: the reference's JAX port
    hardcodes Hestenes-Stiefel + formula 1 (nonlinearcg.py:129-159); the
    MATLAB original's 5x3 option matrix (FrequencyDomainFWI.m:36-45) is
    restored here.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import FWIConfig, MomentumFormula, SolverConfig, StepSizeFormula
from ..models.grid import Grid2D
from ..ops import cpx
from ..ops.cpx import Cpx
from ..ops.solve import helmholtz_operator_solve, make_helmholtz_operator
from ..utils.host import ComplexParts
from .objective import (FWIData, estimate_source_strengths, illumination_map,
                        misfit, precondition_gradient, sample_receivers,
                        scatter_to_fields, virtual_source)


class CGState(NamedTuple):
    velocity: jnp.ndarray       # (ny, nx) float32
    slowness: jnp.ndarray       # (ny, nx) float32
    search_dir: jnp.ndarray     # (ny, nx) float32
    grad_prev: jnp.ndarray      # (ny, nx) float32
    wavefield: jnp.ndarray      # (ntx, ny, nx) complex64 (latest)
    adjoint_field: jnp.ndarray  # (ntx, ny, nx) complex64 (latest)


class CGMetrics(NamedTuple):
    loss: jnp.ndarray
    grad_norm: jnp.ndarray
    beta: jnp.ndarray
    step_size: jnp.ndarray


class CGResult(NamedTuple):
    velocity: jnp.ndarray
    search_dir: jnp.ndarray
    gradient: jnp.ndarray
    adjoint_field: ComplexParts  # (ntx, ny, nx), last iteration
    wavefield: ComplexParts      # (ntx, ny, nx), last iteration
    metrics: CGMetrics           # per-iteration, leading axis = iterations
    # Fields are (real, imag) float32 pairs: jit outputs must be real on the
    # targeted TPU runtime (see utils.host.ComplexParts).


def _dot(a, b):
    return jnp.sum(a * b)


def _momentum(formula: MomentumFormula, it, grad, grad_prev, search_dir,
              eps: float):
    """CG momentum beta (reference: FrequencyDomainFWI.m:119-148). beta = 0 at
    the first iteration for every formula. ``formula`` is static config, so
    only the selected branch is traced."""
    dg = grad - grad_prev
    if formula == MomentumFormula.GRADIENT_DESCENT:
        return jnp.float32(0.0)
    if formula == MomentumFormula.FLETCHER_REEVES:
        beta = _dot(grad, grad) / (_dot(grad_prev, grad_prev) + eps)
    elif formula == MomentumFormula.POLAK_RIBIERE:
        beta = _dot(grad, dg) / (_dot(grad_prev, grad_prev) + eps)
    elif formula == MomentumFormula.PR_FR_CLAMPED:
        gp2 = _dot(grad_prev, grad_prev) + eps
        beta = jnp.clip(_dot(grad, dg) / gp2, 0.0, _dot(grad, grad) / gp2)
    elif formula == MomentumFormula.HESTENES_STIEFEL:
        beta = _dot(grad, dg) / (_dot(search_dir, dg) + eps)
    else:
        raise ValueError(f"unknown momentum formula {formula}")
    return jnp.where(it == 0, 0.0, beta)


def _re_inner(a, b):
    """sum Re(conj(a) * b), polymorphic over complex / Cpx."""
    if isinstance(a, Cpx):
        return jnp.sum(a.re * b.re + a.im * b.im)
    return jnp.real(jnp.sum(jnp.conj(a) * b))


def _step_size(formula: StepSizeFormula, drec, rec_obs, rec_sim, grad,
               search_dir, eps: float):
    """Linearized line-search step (reference: FrequencyDomainFWI.m:149-172,
    nonlinearcg.py:22-32)."""
    den = _re_inner(drec, drec) + eps
    if formula == StepSizeFormula.RESIDUAL:
        num = _re_inner(drec, rec_obs - rec_sim)
        return num / den
    if formula == StepSizeFormula.GRADIENT:
        return _dot(grad, grad) / den
    if formula == StepSizeFormula.GRADIENT_SD:
        return -_dot(grad, search_dir) / den
    raise ValueError(f"unknown step-size formula {formula}")


def _bb_step_size(slow, slow_prev, grad, gprev, sd_new, eps):
    """BB2 quadratic-model step alpha = -sigma <g,p>/<p,p> with
    sigma = <dm,dg>/<dg,dg>, and its validity predicate (shared by the
    2D and 3D CG loops; see config.StepSizeFormula.BB).

    ``num > 0`` alone covers the cold start and the post-watchdog-revert
    restart (both have dm = 0 -> num = 0 -> invalid -> line-search
    fallback), so chunked runs keep using BB across chunk boundaries."""
    dm = slow - slow_prev
    dg = grad - gprev
    num = jnp.sum(dm * dg)
    sigma = num / (jnp.sum(dg * dg) + eps)
    gp = jnp.sum(grad * sd_new)
    bb_sz = -sigma * gp / (jnp.sum(sd_new * sd_new) + eps)
    valid = (num > 0) & (gp < 0) & jnp.isfinite(bb_sz)
    return bb_sz, valid


def _watchdog_apply(ratio, loss, prev_loss, slow, slow_prev,
                    slow_new, vel_new):
    """Nonmonotone watchdog (FWIConfig.reject_increase), shared by the 2D
    and 3D CG loops: this iteration's loss (misfit at the CURRENT model)
    spiking past the baseline means the PREVIOUS update was a misstep —
    revert to the pre-misstep iterate, keep the pre-spike loss baseline,
    and flag a recurrence restart. With BB, the revert makes the next
    (dm, dg) zero, so the next step automatically takes the exact line
    search.

    Returns (bad, slow_new, vel_new, slow_next_prev, prev_loss_new)."""
    bad = loss > jnp.float32(ratio) * prev_loss
    slow_new = jnp.where(bad, slow_prev, slow_new)
    vel_new = jnp.where(bad, 1.0 / slow_prev, vel_new)
    slow_next_prev = jnp.where(bad, slow_prev, slow)
    prev_loss_new = jnp.where(bad, prev_loss, loss)
    return bad, slow_new, vel_new, slow_next_prev, prev_loss_new


def _validate_watchdog(fwi: FWIConfig):
    if fwi.reject_increase is not None and not fwi.reject_increase > 1.0:
        raise ValueError(
            f"reject_increase must be > 1 (a loss-RATIO threshold); "
            f"{fwi.reject_increase} would re-trigger forever after the "
            f"first revert (loss == baseline at the restored model) and "
            f"freeze the inversion at the initial iterate")


def make_cg_step(data: FWIData, grid: Grid2D, solver: SolverConfig,
                 fwi: FWIConfig, mesh=None, grid_axis: str = "grid"):
    """Build the jittable body of one CG iteration.

    ``mesh``/``grid_axis`` (with ``solver.factorization == "spike"``) run
    every Helmholtz factorization/solve grid-sharded over the mesh axis —
    one y-slab per device (see parallel.spike) — so the inversion scales to
    grids beyond one chip's HBM; the rest of the step (gathers, reductions,
    model update) stays global-view and GSPMD inserts the collectives.

    With ``solver.refactor_every == K > 1`` (frozen-factor CG) the scan
    carry additionally holds the banded factor: the factorization runs only
    when ``it % K == 0`` (and at the first iteration of every scan, so
    resumed chunks never run on the zero-initialized carry) and the whole
    stale factor (G blocks + its own sweep planes, a consistent stable
    elimination) is reused in between; the forward/adjoint solves take one
    refinement pass against the CURRENT operator on stale iterations when
    ``solver.stale_refine`` is set (refine_coeffs in ops.solve)."""
    from .regularization import make_cg_regularizer
    regularize = make_cg_regularizer(grid, fwi)

    K = solver.refactor_every
    frozen = K > 1
    if frozen:
        from ..config import SolverMethod
        if (not isinstance(data.src, Cpx) or solver.method != SolverMethod.BANDED
                or solver.factorization == "spike" or mesh is not None):
            raise ValueError(
                "refactor_every > 1 (frozen-factor CG) requires the "
                "split-complex banded method without spike/mesh sharding")
        from ..ops.solve import HelmholtzOperator, _factor_cpx
        from ..ops.split_engine import helmholtz_coefficients_cpx
        from ..ops.stencil import boundary_mask, dirichlet_scale
        scale = dirichlet_scale(grid)
        d_map = (1.0 + (scale - 1.0) * boundary_mask(grid)).astype(jnp.float32)

    # The PML stretch fields depend only on (grid, f, pml) — hoist them out
    # of the per-iteration operator rebuild (they'd otherwise be recomputed
    # inside the scan body every iteration; ~15 ms/iter at 301^2).
    split = isinstance(data.src, Cpx)
    if split:
        from ..ops.split_engine import pml_stretch_fields_cpx
        pml_fields = pml_stretch_fields_cpx(grid, data.f, solver.pml)
    else:
        from ..ops.stencil import pml_stretch_fields
        pml_fields = pml_stretch_fields(grid, data.f, solver.pml)

    # Barzilai-Borwein curvature-scalar step (StepSizeFormula.BB): skips
    # the third (linearized line-search) solve on iterations where the
    # BB2 curvature estimate is valid; carries the previous slowness for
    # the (dm, dg) increments. See config.StepSizeFormula.
    bb = fwi.step_size == StepSizeFormula.BB
    # Nonmonotone watchdog (FWIConfig.reject_increase): carries the
    # previous slowness (shared with BB), the loss baseline and a restart
    # flag; a loss spike reverts the model and restarts the recurrence.
    guard = fwi.reject_increase is not None
    _validate_watchdog(fwi)
    xtra = frozen or bb or guard  # carry is a tuple; xs carries local idx

    def step(carry, xs):
        factor_prev = slow_prev = prev_loss = restart_prev = None
        if xtra:
            it, local = xs
            parts = list(carry)
            state = parts.pop(0)
            if frozen:
                factor_prev = parts.pop(0)
            if bb or guard:
                slow_prev = parts.pop(0)
            if guard:
                prev_loss, restart_prev = parts.pop(0)
        else:
            state, it = carry, xs
        vel, slow, sd, gprev = (state.velocity, state.slowness,
                                state.search_dir, state.grad_prev)

        stale = None
        if frozen:
            # Frozen-factor path: rebuild the (cheap) coefficient planes
            # every iteration, run the (expensive) factorization only every
            # K-th. The factor stays FULLY stale in between (G panels and
            # sweep planes from the same factorization — a consistent,
            # stable elimination of the previous operator, M = H_prev^-1);
            # the refinement passes target the CURRENT planes via
            # refine_coeffs so stale solves correct toward H(vel). Mixing
            # stale G with current sweep planes is not a factorization of
            # anything: its row recurrences compound and overflow f32 at
            # 601 rows (measured, PERF_NOTES round 4).
            coeffs = helmholtz_coefficients_cpx(
                vel, grid, data.f, solver.pml, solver.stencil,
                attenuation=data.attenuation, pml_fields=pml_fields)
            do_factor = jnp.logical_or(local == 0, (it % K) == 0)
            factor = jax.lax.cond(do_factor,
                                  lambda: _factor_cpx(coeffs, solver),
                                  lambda: factor_prev)
            op = HelmholtzOperator(vel=vel,
                                   f=jnp.asarray(data.f, jnp.float32),
                                   coeffs=coeffs, precond=None,
                                   factor=factor, d_map=d_map)
            if solver.stale_refine:
                stale = jnp.logical_not(do_factor)
        else:
            # One operator build + factorization serves all 3 solves.
            op = make_helmholtz_operator(vel, data.f, grid, solver,
                                         attenuation=data.attenuation,
                                         pml_fields=pml_fields, mesh=mesh,
                                         grid_axis=grid_axis)
        solve = partial(helmholtz_operator_solve, mesh=mesh,
                        grid_axis=grid_axis)
        alpha_signed = None
        if data.attenuation is not None:
            alpha_signed = (jnp.sign(jnp.float32(solver.pml.sign_convention))
                            * data.attenuation)

        # Mixed-precision inner loop (SolverConfig.fast_*; measured
        # RMSE-neutral, PERF_NOTES round 3): DEFAULT-precision sweeps for
        # the solves whose outputs feed tolerant quantities.
        DEF = jax.lax.Precision.DEFAULT

        # (1) forward solve, all transmitters at once
        # (reference: nonlinearcg.py:76)
        wv = solve(op, data.src, grid, solver,
                   precision=DEF if solver.fast_forward else None,
                   extra_refine=stale)
        rec_sim = sample_receivers(wv, data.rx_y, data.rx_x, data.rx_w)

        # (2) source-strength estimation (reference: nonlinearcg.py:79-89)
        if fwi.estimate_source_strength:
            s_est = estimate_source_strengths(rec_sim, data.rec_obs)
            if isinstance(wv, Cpx):
                wv = cpx.mul(wv, s_est[:, None, None])
                rec_sim = cpx.mul(rec_sim, s_est[:, None])
            else:
                wv = wv * s_est[:, None, None]
                rec_sim = rec_sim * s_est[:, None]

        residual = rec_sim - data.rec_obs
        loss = misfit(rec_sim, data.rec_obs)

        # (3) adjoint solve on the scattered residuals
        # (reference: nonlinearcg.py:93-125)
        adj_src = scatter_to_fields(residual, data.rx_y, data.rx_x,
                                    grid.shape, data.rx_w)
        adj_wv = solve(op, adj_src, grid, solver, adjoint=True,
                       precision=DEF if solver.fast_adjoint else None,
                       extra_refine=stale)

        # (4) adjoint-state gradient (reference: nonlinearcg.py:118-127)
        virt = virtual_source(slow, wv, data.f, alpha_signed)
        if isinstance(virt, Cpx):
            grad = -jnp.sum(virt.re * adj_wv.re + virt.im * adj_wv.im, axis=0)
        else:
            grad = -jnp.sum(jnp.real(jnp.conj(virt) * adj_wv), axis=0)
        if fwi.precondition == "illumination":
            grad = precondition_gradient(grad, illumination_map(wv),
                                         fwi.precondition_eps)
        if regularize is not None:
            grad = grad + regularize(slow, grad)

        # (5) momentum & search direction (reference: nonlinearcg.py:129-138)
        beta = _momentum(fwi.momentum, it, grad, gprev, sd, fwi.eps_stabilizer)
        if guard:
            # A watchdog restart on the previous iteration invalidates the
            # carried recurrence: force a steepest-descent restart.
            beta = jnp.where(restart_prev, 0.0, beta)
        sd_new = beta * sd - grad

        # (6) forward-project the search direction
        # (reference: nonlinearcg.py:141-156)
        if isinstance(virt, Cpx):
            pert_src = cpx.scale(virt, -sd_new[None])
        else:
            pert_src = -virt * sd_new[None].astype(jnp.complex64)

        def _linearized_step():
            pert = solve(op, pert_src, grid, solver,
                         precision=DEF if solver.fast_linesearch else None)
            drec = sample_receivers(pert, data.rx_y, data.rx_x, data.rx_w)
            formula = (StepSizeFormula.RESIDUAL if bb else fwi.step_size)
            return _step_size(formula, drec, data.rec_obs, rec_sim,
                              grad, sd_new, fwi.eps_stabilizer)

        # (7) step size & slowness update (reference: nonlinearcg.py:159,
        # 22-32; slowness stays real throughout, matching the MATLAB
        # original's real() — FrequencyDomainFWI.m:173-174)
        if bb:
            # BB2 quadratic-model step (_bb_step_size). Falls back to the
            # RESIDUAL line search (one extra solve, under lax.cond so it
            # only RUNS on those iterations) whenever the estimate is
            # invalid (zero history, non-positive curvature, ascent
            # direction, non-finite) — e.g. right after a rejected step
            # or watchdog revert where dm=0.
            bb_sz, valid = _bb_step_size(slow, slow_prev, grad, gprev,
                                         sd_new, fwi.eps_stabilizer)
            step_sz = jax.lax.cond(valid, lambda: bb_sz, _linearized_step)
        else:
            step_sz = _linearized_step()
        slow_new = slow + step_sz * sd_new
        vel_new = 1.0 / slow_new

        # Failure guards (none exist in the reference — SURVEY.md section 5).
        if fwi.clip_velocity is not None:
            lo, hi = fwi.clip_velocity
            vel_new = jnp.clip(vel_new, lo, hi)
            slow_new = 1.0 / vel_new
        if fwi.reject_nonfinite:
            ok = (jnp.isfinite(step_sz) & jnp.isfinite(beta)
                  & jnp.all(jnp.isfinite(slow_new)))
            vel_new = jnp.where(ok, vel_new, vel)
            slow_new = jnp.where(ok, slow_new, slow)
            sd_new = jnp.where(ok, sd_new, sd)
            step_sz = jnp.where(ok, step_sz, 0.0)

        slow_next_prev = slow
        if guard:
            (bad, slow_new, vel_new, slow_next_prev,
             prev_loss_new) = _watchdog_apply(
                fwi.reject_increase, loss, prev_loss, slow, slow_prev,
                slow_new, vel_new)

        metrics = CGMetrics(loss=loss, grad_norm=jnp.linalg.norm(grad),
                            beta=beta, step_size=step_sz)
        new_state = CGState(vel_new, slow_new, sd_new, grad, wv, adj_wv)
        if not xtra:
            return new_state, metrics
        out = [new_state]
        if frozen:
            out.append(factor)
        if bb or guard:
            out.append(slow_next_prev)
        if guard:
            out.append((prev_loss_new, bad))
        return tuple(out), metrics

    return step


@partial(jax.jit, static_argnames=("grid", "solver", "fwi", "num_iterations",
                                   "mesh", "grid_axis"))
def nonlinear_cg(vel_init, data: FWIData, grid: Grid2D,
                 solver: SolverConfig = SolverConfig(),
                 fwi: FWIConfig = FWIConfig(),
                 num_iterations: int | None = None,
                 init_search_dir=None, init_grad_prev=None,
                 iteration_offset=0, mesh=None,
                 grid_axis: str = "grid") -> CGResult:
    """Run the full nonlinear-CG inversion as one compiled scan.

    Mirrors the reference entry point ``nonlinear_conjugate_gradient``
    (reference: nonlinearcg.py:41-180) with a metrics history added.

    Args:
        vel_init: (ny, nx) starting model [m/s] (reference uses a constant
            1480; pass ``fwi.c_init * jnp.ones(grid.shape)``).
        num_iterations: overrides ``fwi.num_iterations`` when given.
        init_search_dir / init_grad_prev: resume a previous run mid-stage —
            the CG carry saved at the interruption point. Defaults (zeros)
            start a fresh inversion.
        iteration_offset: global index of the first iteration executed, so
            a resumed run keeps the momentum semantics (beta = 0 only at the
            true first iteration). Pass a jnp scalar to reuse the compiled
            scan across resume chunks.
        mesh / grid_axis: with ``solver.factorization == "spike"``, run the
            whole inversion grid-sharded: every factorization/solve is the
            distributed SPIKE elimination over ``mesh[grid_axis]`` (one
            y-slab per device; see parallel.spike), so grids beyond one
            chip's HBM invert end to end. ``grid.ny`` must be divisible by
            the mesh axis size. Verified sharded == single-device in
            tests/test_spike.py.
    """
    n_iter = fwi.num_iterations if num_iterations is None else num_iterations
    vel0 = jnp.asarray(vel_init, jnp.float32)
    ntx = data.src.shape[0]
    split = isinstance(data.src, Cpx)
    zfield = (cpx.zeros((ntx,) + grid.shape) if split
              else jnp.zeros((ntx,) + grid.shape, jnp.complex64))
    zgrid = jnp.zeros(grid.shape, jnp.float32)
    state = CGState(
        velocity=vel0,
        slowness=1.0 / vel0,
        search_dir=(zgrid if init_search_dir is None
                    else jnp.asarray(init_search_dir, jnp.float32)),
        grad_prev=(zgrid if init_grad_prev is None
                   else jnp.asarray(init_grad_prev, jnp.float32)),
        wavefield=zfield,
        adjoint_field=zfield,
    )
    step = make_cg_step(data, grid, solver, fwi, mesh=mesh,
                        grid_axis=grid_axis)
    its = jnp.arange(n_iter) + jnp.asarray(iteration_offset, jnp.int32)
    aux = []
    if solver.refactor_every > 1:
        # Frozen-factor CG: the scan carry holds the banded factor. The
        # zero-initialized carry is never consumed — the step forces a
        # factorization at local index 0 (see make_cg_step).
        from ..ops.solve import _factor_cpx
        from ..ops.split_engine import helmholtz_coefficients_cpx

        def _mk_factor(v):
            c = helmholtz_coefficients_cpx(v, grid, data.f, solver.pml,
                                           solver.stencil,
                                           attenuation=data.attenuation)
            return _factor_cpx(c, solver)

        fshape = jax.eval_shape(_mk_factor, vel0)
        aux.append(jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                fshape))
    if (fwi.step_size == StepSizeFormula.BB
            or fwi.reject_increase is not None):
        # BB and the watchdog carry the previous slowness; the
        # zero-history first local iteration runs the linearized fallback
        # / cannot trigger the watchdog (see make_cg_step).
        aux.append(state.slowness)
    if fwi.reject_increase is not None:
        # (loss baseline, restart flag): +inf baseline means the first
        # iteration can never read as a spike.
        aux.append((jnp.float32(jnp.inf), jnp.asarray(False)))
    if aux:
        (final, *_), metrics = jax.lax.scan(
            step, (state, *aux), (its, jnp.arange(n_iter)))
    else:
        final, metrics = jax.lax.scan(step, state, its)
    def _parts(fld):
        if isinstance(fld, Cpx):
            return ComplexParts(fld.re, fld.im)
        return ComplexParts.of(fld)

    return CGResult(
        velocity=final.velocity,
        search_dir=final.search_dir,
        gradient=final.grad_prev,
        adjoint_field=_parts(final.adjoint_field),
        wavefield=_parts(final.wavefield),
        metrics=metrics,
    )
