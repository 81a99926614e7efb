"""Resolution and uncertainty analysis — beyond the reference.

The reference validates its reconstructions visually (SURVEY.md section 4:
"no RMSE published"). With the adjoint-state Frechet pair
(:func:`.newton.make_frechet_operators`: J and J^H are one fused sweep
each against one factorization) the standard model-appraisal tools of FWI
become a few solves each:

* :func:`psf_probe` — the point-spread function R delta = (J^H J + reg)^-1
  J^H J delta: how a unit model perturbation at a pixel is smeared by the
  acquisition. Columns of the model resolution matrix, computed exactly
  (not a paraxial approximation) for any probe location.
* :func:`hessian_diag_probe` — a Hutchinson estimate of diag(J^H J), the
  data-constraint density per pixel (the exact counterpart of the Shin
  pseudo-Hessian surrogate used for preconditioning). Its reciprocal is
  the usual first-order relative-uncertainty proxy.

Everything is jitted end to end; cost per PSF = (2 + 2 * cg_iters)
Helmholtz sweeps; per Hutchinson probe = 2 sweeps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import FWIConfig, SolverConfig
from ..models.grid import Grid2D
from ..ops import cpx
from ..ops.cpx import Cpx
from ..ops.solve import helmholtz_operator_solve, make_helmholtz_operator
from .newton import make_frechet_operators
from .objective import FWIData, estimate_source_strengths, illumination_map, \
    sample_receivers


def _prepare(data: FWIData, grid: Grid2D, solver: SolverConfig, vel,
             estimate_sources: bool = True, exact: bool = True):
    """Operator + scaled wavefield + Frechet pair at a model point.

    Returns (j_apply, jt_apply, virt, s_d) where ``s_d`` is the O(1) data
    normalization applied to src/rec_obs — the same f32 conditioning as
    run_gauss_newton (unit-amplitude ring data underflows the
    normal-equation products otherwise; PSFs are invariant to it, the raw
    diag(J^H J) scales by s_d^2)."""
    from .newton import _data_normalization

    s_d = _data_normalization(data.rec_obs)

    def _sc(x):
        return cpx.scale(x, s_d) if isinstance(x, Cpx) else x * s_d

    data = data._replace(src=_sc(data.src), rec_obs=_sc(data.rec_obs))
    vel = jnp.asarray(vel, jnp.float32)
    slow = 1.0 / vel
    op = make_helmholtz_operator(vel, data.f, grid, solver,
                                 attenuation=data.attenuation)
    wv = helmholtz_operator_solve(op, data.src, grid, solver)
    if estimate_sources:
        rec = sample_receivers(wv, data.rx_y, data.rx_x, data.rx_w)
        s_est = estimate_source_strengths(rec, data.rec_obs)
        wv = (cpx.mul(wv, s_est[:, None, None]) if isinstance(wv, Cpx)
              else wv * s_est[:, None, None])
    j_apply, jt_apply, virt = make_frechet_operators(op, data, grid, solver,
                                                     slow, wv, exact=exact)
    return j_apply, jt_apply, virt, s_d


@partial(jax.jit, static_argnames=("grid", "solver", "cg_iters",
                                   "estimate_sources"))
def psf_probe(vel, data: FWIData, grid: Grid2D,
              solver: SolverConfig = SolverConfig(),
              probes=None, cg_iters: int = 12, lm_damping: float = 0.1,
              precondition_eps: float = 1e-2,
              estimate_sources: bool = True):
    """Point-spread functions of the (damped) Gauss-Newton inverse.

    Args:
        vel: (ny, nx) model at which to linearize (e.g. a reconstruction).
        probes: (np, ny, nx) model-space probe fields (e.g. one-hot pixels
            or Gaussian bumps). Each is pushed through J^H J and pulled
            back through the damped normal equations by ``cg_iters`` of
            preconditioned linear CG — the same inner solver as
            :func:`.newton.run_gauss_newton`.

    Returns:
        (np, ny, nx) PSFs. A perfectly resolved pixel returns its probe;
        acquisition null-space components vanish; the smearing pattern is
        the local resolution kernel.
    """
    if probes is None:
        raise ValueError("psf_probe needs explicit model-space probes "
                         "(np, ny, nx) — e.g. one-hot pixels or Gaussian "
                         "bumps at the locations to appraise")
    j_apply, jt_apply, virt, _ = _prepare(data, grid, solver, vel,
                                          estimate_sources)
    # pseudo-Hessian shape, Hutchinson-calibrated magnitude (see
    # newton.run_gauss_newton: the raw pseudo-Hessian scale is
    # geometry-dependent by many orders of magnitude)
    illum = illumination_map(virt)
    z0 = jax.random.rademacher(jax.random.PRNGKey(0), (grid.ny, grid.nx),
                               dtype=jnp.float32)
    scale = (jnp.maximum(jnp.sum(z0 * jt_apply(j_apply(z0))), 0.0)
             / jnp.maximum(jnp.sum(illum), 1e-38))
    illum = illum * scale
    diag = illum + precondition_eps * jnp.max(illum)

    def hvp(dm):
        return jt_apply(j_apply(dm)) + lm_damping * diag * dm

    def solve_normal(b):
        from .newton import _pcg
        return _pcg(hvp, b, diag, cg_iters, 1e-6)[0]

    probes = jnp.asarray(probes, jnp.float32)

    def one(probe):
        return solve_normal(jt_apply(j_apply(probe)))

    # sequential scan, not vmap: each probe already batches all
    # transmitters through the solver; vmap would multiply peak memory.
    _, psfs = jax.lax.scan(lambda c, p: (c, one(p)), None, probes)
    return psfs


@partial(jax.jit, static_argnames=("grid", "solver", "num_probes",
                                   "estimate_sources"))
def hessian_diag_probe(vel, data: FWIData, grid: Grid2D,
                       solver: SolverConfig = SolverConfig(),
                       num_probes: int = 8, seed: int = 0,
                       estimate_sources: bool = True):
    """Hutchinson estimate of diag(J^H J): E[z * (J^H J z)] over Rademacher
    z. The exact data-constraint density the Shin pseudo-Hessian
    (sum |VIRT|^2) approximates; 2 Helmholtz sweeps per probe.

    Returns (ny, nx) float32; larger = better constrained by the data.
    """
    j_apply, jt_apply, _, s_d = _prepare(data, grid, solver, vel,
                                         estimate_sources)
    keys = jax.random.split(jax.random.PRNGKey(seed), num_probes)

    def one(_, key):
        z = jax.random.rademacher(key, (grid.ny, grid.nx),
                                  dtype=jnp.float32)
        return None, z * jt_apply(j_apply(z))

    _, samples = jax.lax.scan(one, None, keys)
    # undo the internal data normalization (J scaled by s_d => J^H J by
    # s_d^2) so the density is in the problem's own units
    return jnp.mean(samples, axis=0) / (s_d * s_d)
