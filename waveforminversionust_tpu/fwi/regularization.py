"""Model-space regularization: Tikhonov (first-order) and total variation.

The reference has no regularization (its single-frequency reconstructions
show the high-wavenumber element-ring artifacts this suppresses; reference:
FrequencyDomainFWI.m updates raw slowness with no penalty term). Both terms
are defined on the VELOCITY map [m/s] and differentiated with ``jax.grad``
(they chain through ``vel = 1/slow`` automatically when evaluated on
slowness).

Weighting conventions (deliberately different per optimizer):

* **Nonlinear CG** (:mod:`.optimizers`): the data misfit has arbitrary
  absolute scale (raw |residual|^2 of O(1e-15) on real ring data), and the
  CG step size is computed from the data term alone, so a fixed penalty
  weight is unusable. Instead each regularizer's gradient is rescaled to the
  CURRENT data-gradient norm: ``grad += lam * |g_data| * g_reg / |g_reg|``.
  ``lam = 1`` pushes exactly as hard as the data; useful values are
  0.01-0.3. The reported loss stays the pure data misfit.
* **L-BFGS** (:mod:`.lbfgs`): the loss there is data-normalized (O(1) at
  the start), so the exact penalized objective is used:
  ``loss += lam * R(vel) / (ny * nx)`` — a consistent functional, as the
  zoom linesearch requires.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import FWIConfig
from ..models.grid import Grid2D


def tikhonov_value(vel, grid: Grid2D):
    """First-order Tikhonov energy 0.5 * sum |grad v|^2 (per-pixel finite
    differences; units (m/s)^2 — the grid spacing is left out so the weight
    is resolution-independent)."""
    vel = jnp.asarray(vel, jnp.float32)
    dx = vel[:, 1:] - vel[:, :-1]
    dy = vel[1:, :] - vel[:-1, :]
    return 0.5 * (jnp.sum(dx * dx) + jnp.sum(dy * dy))


def tv_value(vel, grid: Grid2D, eps: float = 1.0):
    """Smoothed isotropic total variation sum sqrt(|grad v|^2 + eps^2) - eps.

    ``eps`` [m/s per pixel] rounds the kink at zero gradient so the term is
    differentiable; subtracting eps per pixel makes a constant model cost
    exactly zero. Forward differences with a zero-flux last row/column.
    """
    vel = jnp.asarray(vel, jnp.float32)
    dx = jnp.diff(vel, axis=1, append=vel[:, -1:])
    dy = jnp.diff(vel, axis=0, append=vel[-1:, :])
    mag = jnp.sqrt(dx * dx + dy * dy + jnp.float32(eps) ** 2)
    return jnp.sum(mag - jnp.float32(eps))


def penalty_value(vel, grid: Grid2D, fwi: FWIConfig):
    """lam_tik * Tikhonov + lam_tv * TV (the exact functional; used by
    L-BFGS and available for reporting)."""
    val = jnp.float32(0.0)
    if fwi.reg_tikhonov:
        val = val + fwi.reg_tikhonov * tikhonov_value(vel, grid)
    if fwi.reg_tv:
        val = val + fwi.reg_tv * tv_value(vel, grid, fwi.reg_tv_eps)
    return val


def make_cg_regularizer(grid: Grid2D, fwi: FWIConfig):
    """Gradient-relative regularizer for the CG loop, or None when off.

    Returns ``fn(slowness, data_grad) -> extra_grad`` where ``extra_grad``
    is the regularization push in SLOWNESS space (the CG update variable),
    rescaled so that ``lam = 1`` matches the data-gradient norm. A zero
    regularization gradient (e.g. the constant starting model) contributes
    exactly zero rather than 0/0.
    """
    if not (fwi.reg_tikhonov or fwi.reg_tv):
        return None

    def fn(slow, data_grad):
        gnorm = jnp.linalg.norm(data_grad)
        extra = jnp.zeros_like(slow)
        for lam, value in ((fwi.reg_tikhonov,
                            lambda v: tikhonov_value(v, grid)),
                           (fwi.reg_tv,
                            lambda v: tv_value(v, grid, fwi.reg_tv_eps))):
            if not lam:
                continue
            g = jax.grad(lambda s: value(1.0 / s))(slow)
            rnorm = jnp.linalg.norm(g)
            scale = jnp.where(rnorm > 0, lam * gnorm / jnp.maximum(rnorm, 1e-30),
                              0.0)
            extra = extra + scale * g
        return extra

    return fn
