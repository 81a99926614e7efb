"""Joint multi-frequency FWI: one inversion fitting several frequencies at
once (summed misfits, summed gradients).

This is the batched source x frequency workload of BASELINE.json config 3,
beyond both the reference (single frequency; SURVEY.md section 2 'Frequency
parallelism') and sequential continuation (:mod:`.runner`): every CG
iteration solves forward/adjoint/line-search systems at *all* schedule
frequencies and reduces over the frequency axis:

    loss  = sum_f 0.5 ||residual_f||^2
    grad  = sum_f grad_f                       (adjoint state per frequency)
    step  = sum_f Re<drec_f, -residual_f> / sum_f ||drec_f||^2

Each frequency needs its own operator/factorization, so frequencies are
mapped with ``lax.map`` (sequential per device — batched complex LU is not
available on the targeted TPU runtime) and shard naturally over a mesh
'freq' axis by running the map body under shot/freq sharding.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import FWIConfig, SolverConfig, StepSizeFormula
from ..models.grid import Grid2D
from ..ops import cpx
from ..ops.cpx import Cpx
from ..ops.solve import helmholtz_operator_solve, make_helmholtz_operator
from .objective import (FWIData, estimate_source_strengths, illumination_map,
                        misfit, precondition_gradient, sample_receivers,
                        scatter_to_fields, virtual_source)
from .optimizers import CGMetrics, _dot, _momentum, _re_inner


class MultiFreqData(NamedTuple):
    """Frequency-stacked inversion inputs.

    rec_obs has a leading frequency axis: (nf, ntx, n_active); src and the
    receiver stencils are frequency-independent. Build one FWIData per
    frequency with :func:`..objective.build_fwi_data` and stack with
    :func:`stack_frequencies`.
    """

    src: jnp.ndarray          # (ntx, ny, nx) or Cpx
    rec_obs: jnp.ndarray      # (nf, ntx, n_active) or Cpx
    rx_y: jnp.ndarray
    rx_x: jnp.ndarray
    freqs: jnp.ndarray        # (nf,)
    rx_w: jnp.ndarray | None = None
    # Known frequency-independent attenuation map alpha [Np/m], or None
    # (see objective.FWIData.attenuation).
    attenuation: jnp.ndarray | None = None


def stack_frequencies(datas: list[FWIData]) -> MultiFreqData:
    """Stack per-frequency FWIData (same acquisition) into MultiFreqData."""
    first = datas[0]
    if isinstance(first.rec_obs, Cpx):
        rec = cpx.stack([d.rec_obs for d in datas])
    else:
        rec = jnp.stack([d.rec_obs for d in datas])
    return MultiFreqData(
        src=first.src,
        rec_obs=rec,
        rx_y=first.rx_y,
        rx_x=first.rx_x,
        freqs=jnp.stack([d.f for d in datas]),
        rx_w=first.rx_w,
        attenuation=first.attenuation,
    )


def _step_size_reduced(formula: StepSizeFormula, drec, rec_obs, rec_sim,
                       grad, search_dir, eps: float, preduce):
    """:func:`..optimizers._step_size` with the receiver-space inner
    products reduced by ``preduce`` (a cross-device psum under shard_map;
    identity on one device). The grid-space products (grad, sd) act on
    already-reduced, replicated arrays."""
    den = preduce(_re_inner(drec, drec)) + eps
    if formula == StepSizeFormula.RESIDUAL:
        return preduce(_re_inner(drec, rec_obs - rec_sim)) / den
    if formula == StepSizeFormula.GRADIENT:
        return _dot(grad, grad) / den
    if formula == StepSizeFormula.GRADIENT_SD:
        return -_dot(grad, search_dir) / den
    raise ValueError(f"unknown step-size formula {formula}")


def _multifreq_cg(vel_init, data: MultiFreqData, grid: Grid2D,
                  solver: SolverConfig, fwi: FWIConfig,
                  n_iter: int, preduce=lambda x: x):
    """Core multi-frequency CG loop. ``data`` may hold device-local shards
    when run inside shard_map; every cross-(freq, shot) reduction goes
    through ``preduce``."""
    if fwi.step_size == StepSizeFormula.BB:
        raise ValueError(
            "step_size=BB is not supported by the joint multi-frequency "
            "CG loop (only the reference's three linearized formulas); "
            "use nonlinear_cg per frequency or a continuation schedule")
    if fwi.reject_increase is not None:
        raise ValueError(
            "reject_increase (the nonmonotone watchdog) is not wired into "
            "the joint multi-frequency CG loop; unset it (the single-"
            "frequency 2D and 3D loops support it)")
    vel0 = jnp.asarray(vel_init, jnp.float32)
    from .regularization import make_cg_regularizer
    regularize = make_cg_regularizer(grid, fwi)
    alpha_signed = None
    if data.attenuation is not None:
        alpha_signed = (jnp.sign(jnp.float32(solver.pml.sign_convention))
                        * data.attenuation)

    def per_freq_forward(vel, slow, f, rec_obs):
        """Forward solve + adjoint-state gradient pieces at one frequency."""
        op = make_helmholtz_operator(vel, f, grid, solver,
                                     attenuation=data.attenuation)
        DEF = jax.lax.Precision.DEFAULT
        wv = helmholtz_operator_solve(
            op, data.src, grid, solver,
            precision=DEF if solver.fast_forward else None)
        rec_sim = sample_receivers(wv, data.rx_y, data.rx_x, data.rx_w)
        if fwi.estimate_source_strength:
            s_est = estimate_source_strengths(rec_sim, rec_obs)
            if isinstance(wv, Cpx):
                wv = cpx.mul(wv, s_est[:, None, None])
                rec_sim = cpx.mul(rec_sim, s_est[:, None])
            else:
                wv = wv * s_est[:, None, None]
                rec_sim = rec_sim * s_est[:, None]
        residual = rec_sim - rec_obs
        loss = misfit(rec_sim, rec_obs)
        adj_src = scatter_to_fields(residual, data.rx_y, data.rx_x,
                                    grid.shape, data.rx_w)
        adj_wv = helmholtz_operator_solve(
            op, adj_src, grid, solver, adjoint=True,
            precision=DEF if solver.fast_adjoint else None)
        virt = virtual_source(slow, wv, f, alpha_signed)
        if isinstance(virt, Cpx):
            grad = -jnp.sum(virt.re * adj_wv.re + virt.im * adj_wv.im, axis=0)
        else:
            grad = -jnp.sum(jnp.real(jnp.conj(virt) * adj_wv), axis=0)
        illum = (illumination_map(wv)
                 if fwi.precondition == "illumination" else jnp.float32(0.0))
        return loss, grad, illum, virt, residual, rec_sim

    def per_freq_linesearch(vel, f, virt, sd):
        op = make_helmholtz_operator(vel, f, grid, solver,
                                     attenuation=data.attenuation)
        if isinstance(virt, Cpx):
            pert_src = cpx.scale(virt, -sd[None])
        else:
            pert_src = -virt * sd[None].astype(jnp.complex64)
        ls_prec = (jax.lax.Precision.DEFAULT
                   if solver.fast_linesearch else None)
        pert = helmholtz_operator_solve(op, pert_src, grid, solver,
                                        precision=ls_prec)
        return sample_receivers(pert, data.rx_y, data.rx_x, data.rx_w)

    def step(state, it):
        vel, slow, sd, gprev = state

        def fwd_f(f_and_rec):
            f, rec_obs = f_and_rec
            loss, grad, illum, virt, residual, rec_sim = per_freq_forward(
                vel, slow, f, rec_obs)
            return loss, grad, illum, virt, residual, rec_sim

        losses, grads, illums, virts, residuals, rec_sims = jax.lax.map(
            fwd_f, (data.freqs, data.rec_obs))
        loss = preduce(jnp.sum(losses))
        grad = preduce(jnp.sum(grads, axis=0))
        if fwi.precondition == "illumination":
            # Illumination summed over frequencies AND shots (across devices
            # under shard_map — same reduction tree as the gradient).
            grad = precondition_gradient(grad,
                                         preduce(jnp.sum(illums, axis=0)),
                                         fwi.precondition_eps)
        if regularize is not None:
            grad = grad + regularize(slow, grad)

        beta = _momentum(fwi.momentum, it, grad, gprev, sd, fwi.eps_stabilizer)
        sd_new = beta * sd - grad

        def ls_f(f_and_virt):
            f, virt = f_and_virt
            return per_freq_linesearch(vel, f, virt, sd_new)

        drecs = jax.lax.map(ls_f, (data.freqs, virts))

        # Frequency-summed line search (generalizes the single-frequency
        # formulas; the inner products reduce over the leading nf axis too,
        # and across devices under shard_map).
        step_sz = _step_size_reduced(fwi.step_size, drecs, data.rec_obs,
                                     rec_sims, grad, sd_new,
                                     fwi.eps_stabilizer, preduce)

        slow_new = slow + step_sz * sd_new
        vel_new = 1.0 / slow_new
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

        metrics = CGMetrics(loss=loss, grad_norm=jnp.linalg.norm(grad),
                            beta=beta, step_size=step_sz)
        return (vel_new, slow_new, sd_new, grad), metrics

    init = (vel0, 1.0 / vel0, jnp.zeros(grid.shape, jnp.float32),
            jnp.zeros(grid.shape, jnp.float32))
    (vel, _, _, _), metrics = jax.lax.scan(step, init, jnp.arange(n_iter))
    return vel, metrics


@partial(jax.jit, static_argnames=("grid", "solver", "fwi", "num_iterations"))
def nonlinear_cg_multifreq(vel_init, data: MultiFreqData, grid: Grid2D,
                           solver: SolverConfig = SolverConfig(),
                           fwi: FWIConfig = FWIConfig(),
                           num_iterations: int | None = None):
    """Joint multi-frequency nonlinear-CG inversion (one jitted scan).

    Returns (velocity, CGMetrics history). Cost per iteration is nf
    single-frequency iterations (one factorization per frequency). For
    multi-device execution over a (shot, freq) mesh use
    :func:`nonlinear_cg_multifreq_sharded`.
    """
    n_iter = fwi.num_iterations if num_iterations is None else num_iterations
    return _multifreq_cg(vel_init, data, grid, solver, fwi, n_iter)


def nonlinear_cg_multifreq_sharded(vel_init, data: MultiFreqData, grid: Grid2D,
                                   mesh, solver: SolverConfig = SolverConfig(),
                                   fwi: FWIConfig = FWIConfig(),
                                   num_iterations: int | None = None,
                                   shot_axis: str = "shot",
                                   freq_axis: str = "freq"):
    """Multi-frequency CG executed across a (shot, freq) device mesh.

    Each device runs the factorizations/solves of its local (frequency x
    transmitter) block only — the sequential ``lax.map`` over frequencies
    shortens to nf / mesh.shape[freq_axis] entries per device — and the
    loss/gradient/line-search reductions ride the mesh as ``psum``
    collectives (shard_map; SURVEY.md section 2 'Frequency parallelism').
    The CG state (velocity, slowness, search direction) is replicated.

    ``data`` must be shardable: nf divisible by the freq axis size and ntx
    by the shot axis size (see :func:`~..parallel.sharding.
    shard_multifreq_data`). Verified sharded == serial in
    tests/test_parallel.py.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    n_iter = fwi.num_iterations if num_iterations is None else num_iterations
    axes = (freq_axis, shot_axis)

    def preduce(x):
        return jax.lax.psum(x, axes)

    rec_spec = (P(freq_axis, shot_axis) if not isinstance(data.rec_obs, Cpx)
                else Cpx(P(freq_axis, shot_axis), P(freq_axis, shot_axis)))
    shot_spec = lambda x: (P(shot_axis) if not isinstance(x, Cpx)
                           else Cpx(P(shot_axis), P(shot_axis)))
    data_specs = MultiFreqData(
        src=shot_spec(data.src),
        rec_obs=rec_spec,
        rx_y=P(shot_axis),
        rx_x=P(shot_axis),
        freqs=P(freq_axis),
        rx_w=None if data.rx_w is None else P(shot_axis),
        attenuation=None if data.attenuation is None else P(),
    )

    def run(vel0, local_data):
        vel, metrics = _multifreq_cg(vel0, local_data, grid, solver, fwi,
                                     n_iter, preduce=preduce)
        return vel, metrics

    fn = shard_map(run, mesh=mesh, in_specs=(P(), data_specs),
                   out_specs=(P(), CGMetrics(P(), P(), P(), P())),
                   check_vma=False)
    return jax.jit(fn)(jnp.asarray(vel_init, jnp.float32), data)

