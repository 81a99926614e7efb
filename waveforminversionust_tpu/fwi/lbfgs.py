"""L-BFGS FWI over the differentiable solve — the reference's second
inversion path, made real.

The reference wraps its loss in ``jaxopt.LBFGS`` (reference:
fwi_loss_function.py:106-132), but its gradient must flow through
``jax.pure_callback``, which has no VJP — the path cannot actually compute a
gradient (SURVEY.md Appendix A). Here the loss rides the custom-VJP solve
(:mod:`..ops.solve`), whose backward pass is one adjoint Helmholtz solve
reusing the forward factorization, so L-BFGS works end-to-end on device.

Optimization variable: flattened slowness (reference:
fwi_loss_function.py:110-111 uses 1/c_init as init_params).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import FWIConfig, SolverConfig
from ..models.grid import Grid2D
from ..ops.solve import solve_helmholtz
from .objective import (FWIData, estimate_source_strengths, misfit,
                        sample_receivers)


class LBFGSResult(NamedTuple):
    velocity: jnp.ndarray   # (ny, nx)
    loss_history: jnp.ndarray  # (num_iterations,)


def fwi_loss(slowness_flat, data: FWIData, grid: Grid2D,
             solver: SolverConfig, estimate_sources: bool = True):
    """Masked L2 misfit with per-shot source-strength estimation
    (reference: fwi_loss_function.py:29-103).

    Args:
        slowness_flat: (ny*nx,) real slowness [s/m].
    """
    slowness = slowness_flat.reshape(grid.shape)
    vel = 1.0 / slowness
    u, _ = solve_helmholtz(vel, data.src, data.f, grid, solver,
                           attenuation=data.attenuation)
    rec_sim = sample_receivers(u, data.rx_y, data.rx_x, data.rx_w)
    if estimate_sources:
        s_est = estimate_source_strengths(rec_sim, data.rec_obs)
        rec_sim = rec_sim * s_est[:, None]
    return misfit(rec_sim, data.rec_obs)


@partial(jax.jit, static_argnames=("grid", "solver", "num_iterations",
                                   "memory_size", "estimate_sources", "fwi"))
def run_lbfgs(vel_init, data: FWIData, grid: Grid2D,
              solver: SolverConfig = SolverConfig(),
              num_iterations: int = 10, memory_size: int = 10,
              estimate_sources: bool = True,
              fwi: FWIConfig | None = None) -> LBFGSResult:
    """L-BFGS inversion (reference: fwi_loss_function.py:106-132) as one
    compiled scan; optax L-BFGS with zoom linesearch.

    The raw problem is catastrophically badly scaled for an f32 linesearch
    (slowness ~7e-4 s/m, misfit ~1e-16 for unit-amplitude sources), so we
    optimize dimensionless slowness (relative to the starting model) and a
    data-normalized misfit; both rescalings leave the minimizer unchanged.

    ``fwi`` (optional) supplies regularization weights: the exact penalized
    objective ``misfit/|d|^2 + lam * R(vel)/(ny*nx)`` is minimized (see
    fwi.regularization for the convention). The returned loss history is the
    un-normalized DATA term only, comparable to the unregularized run.
    """
    slow0 = (1.0 / jnp.asarray(vel_init, jnp.float32)).ravel()
    slow_ref = jnp.mean(slow0)
    from ..ops.cpx import Cpx, abs2
    if isinstance(data.rec_obs, Cpx):
        data_norm = 0.5 * jnp.sum(abs2(data.rec_obs))
    else:
        data_norm = 0.5 * jnp.sum(jnp.abs(data.rec_obs) ** 2)

    n_pix = grid.ny * grid.nx
    regularized = fwi is not None and (fwi.reg_tikhonov or fwi.reg_tv)

    def loss_fn(p):
        raw = fwi_loss(p * slow_ref, data, grid, solver, estimate_sources)
        total = raw / data_norm
        if regularized:
            from .regularization import penalty_value
            vel = 1.0 / (p * slow_ref).reshape(grid.shape)
            total = total + penalty_value(vel, grid, fwi) / n_pix
        return total

    params0 = slow0 / slow_ref
    opt = optax.lbfgs(memory_size=memory_size)
    opt_state0 = opt.init(params0)

    def step(carry, _):
        params, opt_state = carry
        loss, grad = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(
            grad, opt_state, params, value=loss, grad=grad, value_fn=loss_fn)
        data_term = loss
        if regularized:
            from .regularization import penalty_value
            vel = 1.0 / (params * slow_ref).reshape(grid.shape)
            data_term = loss - penalty_value(vel, grid, fwi) / n_pix
        params = optax.apply_updates(params, updates)
        return (params, opt_state), data_term * data_norm

    (params, _), losses = jax.lax.scan(step, (params0, opt_state0),
                                       None, length=num_iterations)
    vel = 1.0 / (params * slow_ref).reshape(grid.shape)
    return LBFGSResult(velocity=vel, loss_history=losses)


class AttenuationResult(NamedTuple):
    velocity: jnp.ndarray      # (ny, nx) [m/s]
    attenuation: jnp.ndarray   # (ny, nx) [Np/m]
    loss_history: jnp.ndarray  # (num_iterations,) data misfit


@partial(jax.jit, static_argnames=("grid", "solver", "num_iterations",
                                   "memory_size", "estimate_sources",
                                   "invert_velocity"))
def run_lbfgs_attenuation(vel_init, alpha_init, data: FWIData, grid: Grid2D,
                          solver: SolverConfig = SolverConfig(),
                          num_iterations: int = 10, memory_size: int = 10,
                          estimate_sources: bool = True,
                          invert_velocity: bool = False,
                          alpha_scale: float = 50.0,
                          velocity_scale: float = 0.01) -> AttenuationResult:
    """Turnkey attenuation inversion over the differentiable lossy solve.

    Recovers the alpha map [Np/m] (and, with ``invert_velocity=True``,
    jointly the sound speed) by L-BFGS through the custom-VJP Helmholtz
    solve with k = omega/c + i*sgn*alpha — the capability the framework's
    lossy physics enables and the reference cannot express at all (its
    solver is lossless; SURVEY.md preamble). Parameters are optimized in
    dimensionless form with a data-normalized misfit, for the same f32
    linesearch reasons as :func:`run_lbfgs`: alpha relative to
    ``alpha_scale`` [Np/m], and (joint mode) slowness as
    slow0 * (1 + velocity_scale * q) — ``velocity_scale`` sets the
    expected speed CONTRAST so the two parameter blocks see comparable
    gradient sensitivity (0.01 measured best on the ring fixture: both
    maps improve; larger values let velocity absorb alpha's data error) (the misfit's phase term is far more sensitive to
    slowness than its amplitude term is to alpha; an unscaled joint
    problem lets L-BFGS dump the whole data error into velocity
    crosstalk). Alpha is kept non-negative by a clip at evaluation
    (physically alpha >= 0; clipping keeps the objective piecewise-smooth
    and the optimizer stable at the boundary).
    """
    from ..ops.cpx import Cpx, abs2

    slow0 = (1.0 / jnp.asarray(vel_init, jnp.float32)).ravel()
    slow_ref = jnp.mean(slow0)
    alpha0 = jnp.asarray(alpha_init, jnp.float32).ravel()
    a_ref = jnp.float32(alpha_scale)
    if isinstance(data.rec_obs, Cpx):
        data_norm = 0.5 * jnp.sum(abs2(data.rec_obs))
    else:
        data_norm = 0.5 * jnp.sum(jnp.abs(data.rec_obs) ** 2)
    data_norm = jax.lax.stop_gradient(data_norm)

    n_pix = slow0.size

    vs = jnp.float32(velocity_scale)

    def unpack(p):
        slow = (slow0 * (1.0 + vs * p[:n_pix]) if invert_velocity else slow0)
        alpha = jnp.maximum(p[-n_pix:] * a_ref, 0.0)
        return slow.reshape(grid.shape), alpha.reshape(grid.shape)

    def loss_fn(p):
        slow, alpha = unpack(p)
        d = data._replace(attenuation=alpha)
        raw = fwi_loss(slow.ravel(), d, grid, solver, estimate_sources)
        return raw / data_norm

    params0 = (jnp.concatenate([jnp.zeros_like(slow0), alpha0 / a_ref])
               if invert_velocity else alpha0 / a_ref)
    opt = optax.lbfgs(memory_size=memory_size)
    opt_state0 = opt.init(params0)

    def step(carry, _):
        params, opt_state = carry
        loss, grad = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(
            grad, opt_state, params, value=loss, grad=grad, value_fn=loss_fn)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss * data_norm

    (params, _), losses = jax.lax.scan(step, (params0, opt_state0),
                                       None, length=num_iterations)
    slow, alpha = unpack(params)
    return AttenuationResult(velocity=1.0 / slow, attenuation=alpha,
                             loss_history=losses)


# ---------------------------------------------------------------------------
# 3D: L-BFGS over the differentiable CBS solve (2D-parity second path)
# ---------------------------------------------------------------------------

class LBFGS3DResult(NamedTuple):
    velocity: jnp.ndarray      # (nz, ny, nx)
    loss_history: jnp.ndarray  # (num_iterations,)


def fwi_loss_3d(slowness_flat, data, grid, pml, iter_cap: int = 600,
                spectral: str = "auto", use_gmres: bool = True,
                tol: float = 2e-3, restart: int = 8,
                estimate_sources: bool = True, shell_k0=None):
    """Volumetric masked L2 misfit over the custom-VJP 3D Born solve
    (ops.born3d.born_solve_3d_diff) — the 3D analog of :func:`fwi_loss`.

    Args:
        slowness_flat: (nz*ny*nx,) real slowness [s/m].
        data: fwi.fwi3d.FWIData3D; a ``data.attenuation`` map makes the
            solve lossy AND differentiable in alpha (the lossy VJP).
    """
    from ..ops import cpx as cpxlib
    from ..ops.born3d import born_solve_3d_diff
    from ..ops.cpx import Cpx
    from .fwi3d import sample_receivers_3d

    slowness = slowness_flat.reshape(grid.shape)
    vel = 1.0 / slowness
    u = born_solve_3d_diff(vel, data.src, data.f, grid, pml, iter_cap,
                           spectral, use_gmres, tol, restart, False,
                           shell_k0, attenuation=data.attenuation)
    rec_sim = sample_receivers_3d(u, data.rx_idx)
    if data.rec_ref is not None:
        # Scattered-field mode (fwi3d.scattered_data_3d): scales are
        # already baked in, estimation would divide by the near-zero
        # scattered sim.
        rec_sim = rec_sim - jax.lax.stop_gradient(data.rec_ref)
        estimate_sources = False
    if estimate_sources:
        s_est = estimate_source_strengths(rec_sim, data.rec_obs)
        rec_sim = cpxlib.mul(rec_sim, Cpx(s_est.re[:, None],
                                          s_est.im[:, None]))
    return misfit(rec_sim, data.rec_obs)


@partial(jax.jit, static_argnames=("grid", "pml", "iter_cap", "spectral",
                                   "use_gmres", "tol", "restart",
                                   "num_iterations", "memory_size",
                                   "estimate_sources"))
def run_lbfgs_3d(vel_init, data, grid, pml, iter_cap: int = 600,
                 spectral: str = "auto", use_gmres: bool = True,
                 tol: float = 2e-3, restart: int = 8,
                 num_iterations: int = 10, memory_size: int = 10,
                 estimate_sources: bool = True) -> LBFGS3DResult:
    """3D L-BFGS inversion as one compiled scan (optax L-BFGS with zoom
    linesearch) — both reference inversion paths (hand-CG and autodiff
    L-BFGS, SURVEY.md sections 3.1/3.2) now exist in 3D too.

    Same conditioning treatment as the 2D :func:`run_lbfgs`: dimensionless
    slowness relative to the starting model and a data-normalized misfit
    (both rescalings leave the minimizer unchanged; raw slowness ~7e-4 and
    misfit magnitudes stall an f32 zoom linesearch).
    """
    from ..ops.cpx import Cpx, abs2

    slow0 = (1.0 / jnp.asarray(vel_init, jnp.float32)).ravel()
    slow_ref = jnp.mean(slow0)
    if isinstance(data.rec_obs, Cpx):
        data_norm = 0.5 * jnp.sum(abs2(data.rec_obs))
    else:
        data_norm = 0.5 * jnp.sum(jnp.abs(data.rec_obs) ** 2)
    data_norm = jnp.maximum(data_norm, 1e-38)

    def loss_fn(p):
        raw = fwi_loss_3d(p * slow_ref, data, grid, pml, iter_cap, spectral,
                          use_gmres, tol, restart, estimate_sources)
        return raw / data_norm

    params0 = slow0 / slow_ref
    opt = optax.lbfgs(memory_size=memory_size)
    opt_state0 = opt.init(params0)

    def step(carry, _):
        params, opt_state = carry
        loss, grad = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(
            grad, opt_state, params, value=loss, grad=grad, value_fn=loss_fn)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss * data_norm

    (params, _), losses = jax.lax.scan(step, (params0, opt_state0),
                                       None, length=num_iterations)
    vel = 1.0 / (params * slow_ref).reshape(grid.shape)
    return LBFGS3DResult(velocity=vel, loss_history=losses)


class Attenuation3DResult(NamedTuple):
    velocity: jnp.ndarray      # (nz, ny, nx) [m/s]
    attenuation: jnp.ndarray   # (nz, ny, nx) [Np/m]
    loss_history: jnp.ndarray  # (num_iterations,) data misfit


@partial(jax.jit, static_argnames=("grid", "pml", "iter_cap", "spectral",
                                   "use_gmres", "tol", "restart",
                                   "num_iterations", "memory_size",
                                   "estimate_sources", "invert_velocity"))
def run_lbfgs_attenuation_3d(vel_init, alpha_init, data, grid, pml,
                             iter_cap: int = 600, spectral: str = "auto",
                             use_gmres: bool = True, tol: float = 2e-3,
                             restart: int = 8, num_iterations: int = 10,
                             memory_size: int = 10,
                             estimate_sources: bool = True,
                             invert_velocity: bool = False,
                             alpha_scale: float = 50.0,
                             velocity_scale: float = 0.01
                             ) -> Attenuation3DResult:
    """Turnkey 3D attenuation inversion over the differentiable lossy CBS
    solve — the volumetric analog of :func:`run_lbfgs_attenuation`, same
    scaling rationale (alpha relative to ``alpha_scale`` [Np/m]; joint mode
    parameterizes slowness as slow0 * (1 + velocity_scale * q) so the two
    blocks see comparable gradient sensitivity; alpha clipped >= 0 at
    evaluation). The alpha gradient rides the lossy custom VJP
    (ops.born3d._born3d_diff_lossy_bwd): one adjoint solve per step.
    """
    from ..ops.cpx import Cpx, abs2

    slow0 = (1.0 / jnp.asarray(vel_init, jnp.float32)).ravel()
    alpha0 = jnp.asarray(alpha_init, jnp.float32).ravel()
    a_ref = jnp.float32(alpha_scale)
    if isinstance(data.rec_obs, Cpx):
        data_norm = 0.5 * jnp.sum(abs2(data.rec_obs))
    else:
        data_norm = 0.5 * jnp.sum(jnp.abs(data.rec_obs) ** 2)
    data_norm = jax.lax.stop_gradient(jnp.maximum(data_norm, 1e-38))

    n_pix = slow0.size
    vs = jnp.float32(velocity_scale)

    def unpack(p):
        slow = (slow0 * (1.0 + vs * p[:n_pix]) if invert_velocity else slow0)
        alpha = jnp.maximum(p[-n_pix:] * a_ref, 0.0)
        return slow, alpha.reshape(grid.shape)

    def loss_fn(p):
        slow, alpha = unpack(p)
        d = data._replace(attenuation=alpha)
        raw = fwi_loss_3d(slow, d, grid, pml, iter_cap, spectral,
                          use_gmres, tol, restart, estimate_sources)
        return raw / data_norm

    params0 = (jnp.concatenate([jnp.zeros_like(slow0), alpha0 / a_ref])
               if invert_velocity else alpha0 / a_ref)
    opt = optax.lbfgs(memory_size=memory_size)
    opt_state0 = opt.init(params0)

    def step(carry, _):
        params, opt_state = carry
        loss, grad = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(
            grad, opt_state, params, value=loss, grad=grad, value_fn=loss_fn)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss * data_norm

    (params, _), losses = jax.lax.scan(step, (params0, opt_state0),
                                       None, length=num_iterations)
    slow, alpha = unpack(params)
    return Attenuation3DResult(velocity=(1.0 / slow).reshape(grid.shape),
                               attenuation=alpha, loss_history=losses)
