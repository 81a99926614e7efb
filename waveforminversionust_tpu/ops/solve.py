"""Unified on-device Helmholtz solve with an exact adjoint (custom VJP).

Public entry point: :func:`solve_helmholtz` — the same stable signature the
reference exposes across its four implementations (reference:
solve_helmholtz.py:22, solveHelmholtz.m:1): one call solves all sources at
once; ``adjoint=True`` solves the conjugate-transpose system H^H u = s
(reference: solveHelmholtz.m:131-135).

Differentiation: the reference's autodiff path is broken because
``jax.pure_callback`` has no VJP (reference: fwi_loss_function.py:128 +
solve_helmholtz.py:85-93). Here the solve carries a ``jax.custom_vjp`` whose
backward pass is itself a Helmholtz solve with the adjoint operator — the
adjoint-state identity the reference hand-codes in its CG loop (reference:
nonlinearcg.py:118-127) — which makes gradient-based inversion (CG and
L-BFGS alike) work end-to-end on device.

For the FD methods the VJP is exact for the *discrete* system. JAX complex
VJPs are pure linear transposes (conjugation is handled by ``grad`` at the
real-loss boundary), so with cotangent u_bar:
      lam      = H^-T u_bar          (one transpose solve)
      s_bar    = lam
      coeffs_bar[slot] = -sum_batch lam * shift(u, offset_slot)
and d(coeffs)/d(vel) chains through :func:`helmholtz_coefficients` by ordinary
autodiff. For the Born method the VJP uses the continuous adjoint-state rule.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SolverConfig, SolverMethod
from ..models.grid import Grid2D
from . import apply
from .banded import BandedFactor, banded_factor, banded_solve
from .krylov import gmres, gmres_cpx
from .born import born_gmres_solve, born_series_solve
from .cpx import Cpx
from .cyclic import CRFactor, cr_factor_cpx, cr_solve_cpx
from .twisted import TwistedFactorCpx, twisted_factor_cpx, twisted_solve_cpx
from .preconditioner import (PrecondParams, make_fft_preconditioner,
                             make_fft_preconditioner_cpx, shifted_k2,
                             shifted_k2_cpx)
from .split_engine import (adjoint_coefficients_cpx,
                           banded_factor_cpx, banded_solve_cpx,
                           born_series_solve_cpx, h_apply_adjoint_cpx,
                           h_apply_cpx, helmholtz_coefficients_cpx)
from .stencil import (STENCIL_OFFSETS, boundary_mask, dirichlet_scale,
                      helmholtz_coefficients, stencil_params)
from . import cpx as cpxlib


class SolveInfo(NamedTuple):
    rel_residual: jnp.ndarray  # (batch,) final relative residual (0 for Born)
    iterations: jnp.ndarray    # scalar int32


def _shift(u, dy, dx):
    return apply._shift(u, dy, dx)


# ---------------------------------------------------------------------------
# FD path: direct (banded) or GMRES solve of the exact 9-point system
# ---------------------------------------------------------------------------

def _banded_solve_refined(factor: BandedFactor, rhs, cfg: SolverConfig,
                          adjoint: bool):
    """Direct solve + optional iterative-refinement passes (f32 cleanup)."""
    op = (lambda v: apply.h_apply_adjoint(factor.coeffs, v)) if adjoint \
        else (lambda v: apply.h_apply(factor.coeffs, v))
    x = banded_solve(factor, rhs, adjoint=adjoint)
    for _ in range(cfg.refine):
        r = rhs - op(x)
        x = x + banded_solve(factor, r, adjoint=adjoint)
    return x


def _fd_solve_impl(coeffs, rhs, precond, grid, cfg, adjoint_precond, x0=None,
                   factor: BandedFactor | None = None):
    """Primal FD solve. ``adjoint_precond`` marks that ``coeffs`` describe an
    adjoint operator (flips the preconditioner shift / reuses the factor's
    adjoint sweeps).

    Balance note for GMRES systems. The stock planes H_s = D H rescale the
    unit Dirichlet border rows of H up to the O(1e6) interior row magnitude.
    Under (conjugate) transposition the SAME property holds: H_s^H = H^H D
    and H_s^T = H^T D only rescale the UNIT border columns/rows of H^H /
    H^T up to the interior magnitude — they remain the well-conditioned
    forms and must be solved directly (then u = D w recovers the border
    values exactly: the border unknown w_j = u_j / s appears with column
    weight s, so GMRES resolves it to ~tol * ||rhs|| / s absolute error).
    The seemingly natural u-space form H^H u = s is the BROKEN one: its
    border unknowns carry unit column weight inside an O(1e6) operator —
    condition ~1e6 — and f32 GMRES stalls with the entire O(1) border
    solution mass unresolved (the adjoint identity <H^-1 a, b> == <a,
    H^-H b> fails by 100% in u-space and holds to ~5e-7 in w-space).

    Accuracy model of the w-space GMRES adjoint: interior values are
    residual-accurate; the 1-px Dirichlet closure ring (outside the PML,
    physically meaningless) is accurate to ~tol_eff * ||rhs|| ABSOLUTE —
    when the adjoint solution sits far below the rhs scale (delta adjoint
    sources: ~1e6 below), the ring is solver-floor noise. This is inherent
    to f32 iterative methods (a closed-form border fill from the interior
    amplifies interior noise by the same 1e6 row scale — measured, only 9x
    better); use the BANDED direct method for componentwise border
    accuracy.
    """
    if cfg.method == SolverMethod.BANDED:
        if factor is None:
            base = apply.adjoint_coefficients(coeffs) if adjoint_precond else coeffs
            factor = banded_factor(base)
        x = _banded_solve_refined(factor, rhs, cfg, adjoint=adjoint_precond)
        return x, factor
    m_inv = make_fft_preconditioner(grid, precond, adjoint=adjoint_precond)
    a_op = lambda v: apply.h_apply(coeffs, v)
    res = gmres(a_op, rhs, m_inv=m_inv, x0=x0, tol=cfg.tol,
                maxiter=cfg.maxiter)
    return res.x, None


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fd_solve(coeffs, rhs, precond: PrecondParams, grid: Grid2D,
              cfg: SolverConfig, adjoint_system: bool = False):
    """``adjoint_system`` declares the planes describe the balanced adjoint
    operator H_s^H rather than the balanced forward H_s = D H; the bwd pass
    needs this to pose its own transpose system (A^-T of H_s^H is a forward
    H_s solve under conjugation; A^-T of H_s is an H_s^T solve)."""
    u, _ = _fd_solve_impl(coeffs, rhs, precond, grid, cfg,
                          adjoint_precond=False)
    return u


def _fd_solve_fwd(coeffs, rhs, precond, grid, cfg, adjoint_system):
    u, factor = _fd_solve_impl(coeffs, rhs, precond, grid, cfg,
                               adjoint_precond=False)
    return u, (coeffs, u, precond, factor)


def _fd_solve_bwd(grid, cfg, adjoint_system, residuals, u_bar):
    """Pure-transpose VJP (JAX complex convention, matching jnp.linalg.solve):
    lam = A^-T u_bar; rhs_bar = lam; A_bar = -lam u^T, expressed per plane."""
    coeffs, u, precond, factor = residuals
    if cfg.method == SolverMethod.BANDED and factor is not None:
        # Transpose solve via the conjugation trick on the H^H sweeps, so the
        # forward factorization is reused: A^-T v = conj(A^-H conj(v)).
        lam = jnp.conj(_banded_solve_refined(factor, jnp.conj(u_bar), cfg,
                                             adjoint=True))
    else:
        if adjoint_system:
            # A = H_s^H: A^-T v = conj(A^-H conj(v)) and A^H = H_s, so the
            # transpose solve is a FORWARD balanced solve on conj(u_bar).
            # (precond params carry the adjoint shift sign here;
            # adjoint_precond=True conjugates the symbol back.)
            f_coeffs = apply.adjoint_coefficients(coeffs)
            z, _ = _fd_solve_impl(f_coeffs, jnp.conj(u_bar), precond, grid,
                                  cfg, adjoint_precond=True)
            lam = jnp.conj(z)
        else:
            # A = H_s = D H: A^T = H^T D is still balanced (D only rescales
            # the unit boundary columns of H^T up to the interior row
            # magnitude). The constant-coefficient preconditioner stencil is
            # symmetric, so M^T = M: reuse the forward preconditioner.
            t_coeffs = apply.transpose_coefficients(coeffs)
            lam, _ = _fd_solve_impl(t_coeffs, u_bar, precond, grid, cfg,
                                    adjoint_precond=False)
    rhs_bar = lam
    coeffs_bar = jnp.stack([
        -jnp.sum(lam * _shift(u, dy, dx), axis=0)
        for (dy, dx) in STENCIL_OFFSETS
    ])
    precond_bar = jax.tree_util.tree_map(jnp.zeros_like, precond)
    return coeffs_bar, rhs_bar, precond_bar


_fd_solve.defvjp(_fd_solve_fwd, _fd_solve_bwd)


# ---------------------------------------------------------------------------
# Split-complex FD path with custom VJP (for autodiff/L-BFGS on TPU)
# ---------------------------------------------------------------------------

def _shift_cpx(u: Cpx, dy, dx):
    return Cpx(_shift(u.re, dy, dx), _shift(u.im, dy, dx))


def _fd_solve_cpx_primal(coeffs: Cpx, rhs: Cpx, precond, grid: Grid2D,
                         cfg: SolverConfig, adjoint_system: bool = False):
    """Returns (u, factor-or-None). GMRES uses the split shifted-Laplacian
    preconditioner; BANDED the direct factorization. ``adjoint_system``
    marks that the planes describe the balanced conjugate-transposed system
    H_s^H (still well-conditioned; see :func:`_fd_solve_impl`) — the bwd
    pass uses it to orient its own hermitian solve."""
    if cfg.method == SolverMethod.GMRES:
        m_inv = make_fft_preconditioner_cpx(grid, precond, adjoint=False)
        a_op = _make_apply_cpx(coeffs, cfg)
        res = gmres_cpx(a_op, rhs, m_inv=m_inv, tol=cfg.tol,
                        maxiter=cfg.maxiter)
        return res.x, None
    factor = _factor_cpx(coeffs, cfg)
    return _banded_solve_refined_cpx(factor, rhs, cfg, adjoint=False), factor


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fd_solve_cpx(coeffs: Cpx, rhs: Cpx, precond, grid: Grid2D,
                  cfg: SolverConfig, adjoint_system: bool = False):
    u, _ = _fd_solve_cpx_primal(coeffs, rhs, precond, grid, cfg,
                                adjoint_system)
    return u


def _fd_solve_cpx_fwd(coeffs, rhs, precond, grid, cfg, adjoint_system):
    u, factor = _fd_solve_cpx_primal(coeffs, rhs, precond, grid, cfg,
                                     adjoint_system)
    return u, (coeffs, u, factor, precond)


def _fd_solve_cpx_bwd(grid, cfg, adjoint_system, residuals, u_bar):
    """Split-representation VJP. With complex data as independent (re, im)
    real pairs, the chain-rule works out to the HERMITIAN solve (conjugation
    is explicit in the representation rather than deferred to grad):
        w   = u_bar.re + i u_bar.im
        lam = H^-H w;  rhs_bar = lam;  coeffs_bar[s] = -sum_b lam*conj(u<<s)
    FD-validated in tests/test_split_engine.py."""
    coeffs, u, factor, precond = residuals
    u_bar = Cpx(u_bar.re, u_bar.im)
    if factor is None:  # GMRES: Hermitian solve with the conjugate symbol
        # lam = A^-H u_bar. Both A = H_s and A = H_s^H have balanced
        # hermitian transposes (D only rescales the unit boundary
        # columns/rows; see _fd_solve_impl) — solve them directly.
        m_inv = make_fft_preconditioner_cpx(grid, precond, adjoint=True)
        herm = adjoint_coefficients_cpx(coeffs)  # = H_s if A was H_s^H
        a_op = _make_apply_cpx(herm, cfg)
        lam = gmres_cpx(a_op, u_bar, m_inv=m_inv, tol=cfg.tol,
                        maxiter=cfg.maxiter).x
    else:
        lam = _banded_solve_refined_cpx(factor, u_bar, cfg, adjoint=True)
    rhs_bar = lam
    planes = []
    for (dy, dx) in STENCIL_OFFSETS:
        t = cpxlib.mul(lam, _shift_cpx(u, dy, dx).conj())
        planes.append(Cpx(-jnp.sum(t.re, axis=0), -jnp.sum(t.im, axis=0)))
    coeffs_bar = cpxlib.stack(planes)
    precond_bar = jax.tree_util.tree_map(jnp.zeros_like, precond)
    return coeffs_bar, rhs_bar, precond_bar


_fd_solve_cpx.defvjp(_fd_solve_cpx_fwd, _fd_solve_cpx_bwd)


def _solve_helmholtz_split(vel, src, f, grid, config, adjoint, x0,
                           attenuation=None):
    src = cpxlib.of(src)
    single = src.ndim == 2
    if single:
        src = Cpx(src.re[None], src.im[None])
    if config.method not in (SolverMethod.BANDED, SolverMethod.GMRES):
        raise NotImplementedError(
            "split_complex differentiable solve supports the banded and "
            "gmres methods")
    coeffs = helmholtz_coefficients_cpx(vel, grid, f, config.pml,
                                        config.stencil,
                                        attenuation=attenuation)
    is_gmres = config.method == SolverMethod.GMRES
    scale = dirichlet_scale(grid)
    d_map = (1.0 + (scale - 1.0) * boundary_mask(grid)).astype(jnp.float32)
    if adjoint:
        # Balanced w-space adjoint for all methods: H_s^H w = s, u = D w
        # (H_s^H stays balanced — see _fd_solve_impl).
        coeffs = adjoint_coefficients_cpx(coeffs)
    # Shift sign follows the operator actually being solved (see shifted_k2).
    precond = (_split_precond_params(vel, f, grid, config,
                                     sign=1.0 if adjoint else -1.0)
               if is_gmres else None)
    w_space_adj = adjoint
    if not adjoint:
        src = cpxlib.scale(src, d_map)
    if x0 is not None:
        x0 = jax.lax.stop_gradient(cpxlib.of(x0))
        if x0.ndim == 2:
            x0 = Cpx(x0.re[None], x0.im[None])
        if w_space_adj:
            x0 = cpxlib.scale(x0, 1.0 / d_map)
        r0 = src - h_apply_cpx(coeffs, x0)
        u = x0 + _fd_solve_cpx(coeffs, r0, precond, grid, config,
                               bool(adjoint))
    else:
        u = _fd_solve_cpx(coeffs, src, precond, grid, config, bool(adjoint))
    if w_space_adj:
        u = cpxlib.scale(u, d_map)
    # Diagnostics on a stop-gradient side path.
    coeffs_sg = jax.lax.stop_gradient(coeffs)
    w_sg = jax.lax.stop_gradient(
        cpxlib.scale(u, 1.0 / d_map) if w_space_adj else u)
    res = h_apply_cpx(coeffs_sg, w_sg) - jax.lax.stop_gradient(src)
    rel = jnp.sqrt(jnp.sum(cpxlib.abs2(res), axis=(1, 2))
                   / jnp.maximum(jnp.sum(cpxlib.abs2(jax.lax.stop_gradient(src)),
                                         axis=(1, 2)), 1e-38))
    info = SolveInfo(rel, jnp.int32(-1))
    if single:
        u = u[0]
    return u, info


# ---------------------------------------------------------------------------
# Born path: continuous adjoint-state VJP
# ---------------------------------------------------------------------------

def _born_solve_impl(vel, rhs, f, grid, cfg, adjoint, attenuation=None):
    if cfg.born_krylov:
        u, _ = born_gmres_solve(vel, rhs, f, grid, cfg.born_pml,
                                adjoint=adjoint, tol=cfg.tol,
                                maxiter=cfg.born_iter_cap,
                                restart=cfg.born_restart,
                                attenuation=attenuation)
    else:
        u, _ = born_series_solve(vel, rhs, f, grid, cfg.born_pml,
                                 adjoint=adjoint, iter_cap=cfg.born_iter_cap,
                                 iter_scale=cfg.born_iter_scale,
                                 attenuation=attenuation)
    return u


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _born_solve(vel, rhs, f, grid: Grid2D, cfg: SolverConfig, adjoint: bool):
    return _born_solve_impl(vel, rhs, f, grid, cfg, adjoint)


def _born_solve_fwd(vel, rhs, f, grid, cfg, adjoint):
    u = _born_solve(vel, rhs, f, grid, cfg, adjoint)
    return u, (vel, u, f)


def _born_solve_bwd(grid, cfg, adjoint, residuals, u_bar):
    """Pure-transpose VJP. The Born operator is complex-symmetric (diagonal
    potential + even convolution kernel), so the transpose solve IS a forward
    solve with the same operator: lam = A^-T u_bar = A^-1 u_bar."""
    vel, u, f = residuals
    lam = _born_solve(vel, u_bar, f, grid, cfg, adjoint)
    # Interior potential k^2 = (2 pi f / vel)^2 depends on vel with real
    # sensitivity dk2/dvel; the R->C vjp boundary takes the real part.
    dk2_dvel = -2 * (2 * jnp.pi * f) ** 2 / vel ** 3
    vel_bar = -jnp.real(jnp.sum(lam * u, axis=0)) * dk2_dvel
    rhs_bar = lam
    f_bar = jnp.zeros_like(f)
    return vel_bar, rhs_bar, f_bar


_born_solve.defvjp(_born_solve_fwd, _born_solve_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _born_solve_lossy(vel, alpha, rhs, f, grid: Grid2D, cfg: SolverConfig,
                      adjoint: bool):
    """Lossy-media differentiable Born solve: like :func:`_born_solve` but
    with the attenuation map a first-class differentiable input, enabling
    alpha-map inversion through the spectral engine (the FD engines get
    this via the coefficient-level autodiff in helmholtz_coefficients)."""
    return _born_solve_impl(vel, rhs, f, grid, cfg, adjoint,
                            attenuation=alpha)


def _born_solve_lossy_fwd(vel, alpha, rhs, f, grid, cfg, adjoint):
    u = _born_solve_lossy(vel, alpha, rhs, f, grid, cfg, adjoint)
    return u, (vel, alpha, u, f)


def _born_solve_lossy_bwd(grid, cfg, adjoint, residuals, u_bar):
    """Pure-transpose VJP, lossy case. The operator stays complex-symmetric
    (the lossy k^2 is still a diagonal potential), so lam = A^-T u_bar is
    one forward solve. The interior potential is k^2 = (omega/c +
    i*sgn*alpha)^2 — complex-analytic in both REAL fields c and alpha — so
    each field's cotangent is -Re(sum_b lam*u * dk2/dfield):

        dk2/dc     = -2 (omega/c^2) k_c
        dk2/dalpha =  2 i sgn      k_c ,   k_c = omega/c + i sgn alpha.
    """
    vel, alpha, u, f = residuals
    lam = _born_solve_lossy(vel, alpha, u_bar, f, grid, cfg, adjoint)
    omega = 2 * jnp.pi * f
    sign = float(cfg.born_pml.sign_convention) * (-1.0 if adjoint else 1.0)
    k_c = (omega / vel).astype(jnp.complex64) + (1j * sign) * alpha
    s = jnp.sum(lam * u, axis=0)
    vel_bar = -jnp.real(s * (-2.0 * (omega / vel ** 2) * k_c))
    alpha_bar = -jnp.real(s * ((2j * sign) * k_c))
    rhs_bar = lam
    f_bar = jnp.zeros_like(f)
    return vel_bar, alpha_bar, rhs_bar, f_bar


_born_solve_lossy.defvjp(_born_solve_lossy_fwd, _born_solve_lossy_bwd)


# ---------------------------------------------------------------------------
# Operator-level API (non-differentiable, maximal factorization reuse)
# ---------------------------------------------------------------------------

class HelmholtzOperator(NamedTuple):
    """A prepared Helmholtz operator for one (vel, f).

    For the banded method the factorization is shared by forward, adjoint and
    any further solves at this velocity — one factorization covers all three
    Helmholtz solves of an FWI iteration (the reference re-factorizes 3x per
    iteration; reference: FrequencyDomainFWI.m:79,113,150).
    """

    vel: jnp.ndarray
    f: jnp.ndarray
    coeffs: jnp.ndarray            # H_s planes (boundary-scaled)
    precond: PrecondParams
    factor: BandedFactor | None    # set for the banded method
    d_map: jnp.ndarray             # boundary row-scale map D
    attenuation: jnp.ndarray | None = None  # alpha map (Born path re-derives
                                            # its operator from vel/f/alpha)


def make_helmholtz_operator(vel, f, grid: Grid2D,
                            cfg: SolverConfig = SolverConfig(),
                            attenuation=None,
                            pml_fields=None, mesh=None,
                            grid_axis: str = "grid") -> HelmholtzOperator:
    """Build (and for the banded method, factorize) the operator once.

    With ``cfg.split_complex`` the planes and factorization are split-complex
    (Cpx float pairs; see ops.cpx) — required on TPU runtimes without full
    complex64 support. Only the banded and Born methods support split mode.

    With ``cfg.factorization == "spike"`` (split banded only) the
    factorization is the distributed SPIKE factor over ``mesh[grid_axis]``
    (:mod:`..parallel.spike`): the grid's row axis is partitioned into one
    slab per device, removing the single-chip memory/size limit on the
    direct solve. Pass the same ``mesh``/``grid_axis`` to
    :func:`helmholtz_operator_solve`.
    """
    scale = dirichlet_scale(grid)
    d_map = (1.0 + (scale - 1.0) * boundary_mask(grid)).astype(jnp.float32)
    if cfg.split_complex:
        coeffs = helmholtz_coefficients_cpx(vel, grid, f, cfg.pml, cfg.stencil,
                                            attenuation=attenuation,
                                            pml_fields=pml_fields)
        if cfg.factorization == "spike":
            if cfg.method != SolverMethod.BANDED:
                raise ValueError("factorization='spike' requires the banded "
                                 "method")
            if mesh is None:
                raise ValueError(
                    "factorization='spike' is the grid-sharded direct solve: "
                    "pass mesh= (with a grid_axis-named axis) to "
                    "make_helmholtz_operator / nonlinear_cg")
            from ..parallel.spike import spike_factor
            factor = spike_factor(coeffs, mesh, grid_axis)
        else:
            factor = (_factor_cpx(coeffs, cfg)
                      if cfg.method == SolverMethod.BANDED else None)
        precond = (_split_precond_params(vel, f, grid, cfg)
                   if cfg.method == SolverMethod.GMRES else None)
        if cfg.method == SolverMethod.GMRES and cfg.gmres_two_level:
            factor = _coarse_factor_cpx(vel, f, grid, cfg, attenuation)
    else:
        coeffs, precond = build_operator(vel, f, grid, cfg, adjoint=False,
                                         attenuation=attenuation,
                                         pml_fields=pml_fields)
        factor = banded_factor(coeffs) if cfg.method == SolverMethod.BANDED else None
    return HelmholtzOperator(vel=jnp.asarray(vel, jnp.float32),
                             f=jnp.asarray(f, jnp.float32),
                             coeffs=coeffs, precond=precond, factor=factor,
                             d_map=d_map,
                             attenuation=(None if attenuation is None else
                                          jnp.asarray(attenuation,
                                                      jnp.float32)))


def helmholtz_operator_solve(op: HelmholtzOperator, src, grid: Grid2D,
                             cfg: SolverConfig = SolverConfig(),
                             adjoint: bool = False, x0=None, mesh=None,
                             grid_axis: str = "grid", precision=None,
                             extra_refine=None):
    """Solve H u = src (or H^H u = src) with a prepared operator.

    Non-differentiable fast path for hand-derived-gradient optimizers (the
    reference's CG loop); use :func:`solve_helmholtz` when autodiff through
    the solve is needed. For a SPIKE (grid-sharded) operator, pass the same
    ``mesh``/``grid_axis`` the factor was built with.

    ``extra_refine``: optional traced bool — when true at runtime, one
    additional iterative-refinement pass runs after the banded solve
    against ``op.factor.coeffs`` (the frozen-factor CG's stale-iteration
    correction; split banded only; see SolverConfig.refactor_every).
    """
    if cfg.split_complex:
        return _operator_solve_split(op, src, grid, cfg, adjoint, mesh,
                                     grid_axis, precision, extra_refine)
    src = jnp.asarray(src, jnp.complex64)
    single = src.ndim == 2
    if single:
        src = src[None]

    if cfg.method == SolverMethod.BORN:
        u = _born_solve_impl(op.vel, src, op.f, grid, cfg, adjoint,
                             attenuation=op.attenuation)
    elif cfg.method == SolverMethod.BANDED:
        rhs = src if adjoint else src * op.d_map
        u = _banded_solve_refined(op.factor, rhs, cfg, adjoint=adjoint)
        if adjoint:
            u = u * op.d_map
    else:
        if adjoint:
            # Balanced w-space adjoint (same recipe as the banded branch):
            # solve H_s^H w = s, u = D w. H_s^H = H^H D only rescales the
            # UNIT boundary columns of H^H up to the interior row magnitude
            # — it is the well-conditioned form; the u-space H^H itself
            # carries weight-1 boundary unknowns inside an O(1e6) operator
            # and stalls GMRES (see _fd_solve_impl).
            coeffs = apply.adjoint_coefficients(op.coeffs)
            w, _ = _fd_solve_impl(coeffs, src, op.precond, grid, cfg,
                                  adjoint_precond=True,
                                  x0=None if x0 is None else x0 / op.d_map)
            u = w * op.d_map
        else:
            u, _ = _fd_solve_impl(op.coeffs, src * op.d_map, op.precond, grid,
                                  cfg, adjoint_precond=False, x0=x0)

    if single:
        u = u[0]
    return u


def _factor_cpx(coeffs: Cpx, cfg: SolverConfig):
    """Direct factorization for the split engine: fused Pallas kernel,
    block-Thomas scan, or cyclic reduction, per ``cfg.factorization``.

    "auto" uses the fused Pallas factorization kernel on TPU (the XLA scan
    floors at ~114 ms for 301^2 on the targeted runtime vs ~49 ms fused;
    see ops/pallas_factor.py) and the XLA block-Thomas scan elsewhere.
    Hybrid options (Schulz warm starts, fast_sweeps) force the scan path.
    """
    mode = cfg.factorization
    if mode == "spike":
        raise ValueError(
            "factorization='spike' (grid-sharded) is available through the "
            "operator API only: make_helmholtz_operator(..., mesh=...) / "
            "helmholtz_operator_solve(..., mesh=...) or "
            "nonlinear_cg(..., mesh=...)")
    if mode == "auto":
        use_pallas = (jax.default_backend() != "cpu"
                      and cfg.factor_schulz_steps <= 0
                      and not cfg.fast_sweeps)
        mode = "pallas" if use_pallas else "thomas"
    if mode == "pallas":
        from .pallas_factor import banded_factor_pallas
        pp = (jax.lax.Precision.DEFAULT if cfg.factor_precision == "default"
              else jax.lax.Precision.HIGHEST)
        return banded_factor_pallas(coeffs, panel_precision=pp)
    if mode == "cr":
        return cr_factor_cpx(coeffs)
    if mode == "twisted":
        # Two-sided elimination: same flops as block-Thomas in half the
        # dependent grid steps (ops/twisted.py). Fused kernels off-CPU,
        # XLA scans (oracle path) on CPU.
        if jax.default_backend() != "cpu":
            from .pallas_twisted import twisted_factor_pallas
            pp = (jax.lax.Precision.DEFAULT
                  if cfg.factor_precision == "default"
                  else jax.lax.Precision.HIGHEST)
            return twisted_factor_pallas(coeffs, panel_precision=pp)
        return twisted_factor_cpx(coeffs)
    if mode == "thomas":
        # fast_sweeps measured NET-SLOWER on the real TPU at the benchmark
        # workload (factor 135 vs 114 ms, iteration 0.160 vs 0.148 s): the
        # extra embedding work exceeds the ~1.4 ms/solve sweep saving. Auto
        # therefore means OFF; it stays available as an explicit opt-in for
        # many-solves-per-factor workloads (forward-modeling sweeps).
        fast = bool(cfg.fast_sweeps)
        return banded_factor_cpx(coeffs, cfg.factor_schulz_steps,
                                 precompute_sweeps=fast)
    raise ValueError(f"unknown factorization {cfg.factorization!r}")


def _fused_apply_kernel(cfg: SolverConfig, ny: int, nx: int) -> str | None:
    """Which fused Pallas apply serves this grid/config: "whole" (the
    whole-field kernel, <= its measured 704^2 VMEM ceiling), "tiled" (the
    y-tiled kernel, any size), or None (the jnp apply).

    The auto gate past the whole-field ceiling is EMPIRICAL (chip A/B,
    PERF_NOTES round 5, examples/tiled_apply_ab.py): XLA fuses the jnp
    apply's nine shifted slices into one streamed pass, and when the row
    width is 8-aligned that fusion wins (736^2: jnp 2.3x faster; 1024^2:
    4x) — but at misaligned widths it pays lane-masking overheads the
    Pallas kernel avoids (801^2: tiled 1.8x faster standalone, 1.09x on
    the refined solve; 1201^2: parity within relay noise). Production
    grids (Grid2D.centered) have odd widths, so they take the tiled
    kernel; 8-aligned demo grids keep the jnp apply."""
    from .pallas_stencil import _HAVE_PALLAS, fused_apply_fits
    mode = getattr(cfg, "fused_apply", "auto")
    if mode == "off" or not _HAVE_PALLAS:
        return None
    if mode == "on":
        return "whole"
    if mode == "tiled":
        return "tiled"
    if jax.default_backend() == "cpu":
        return None
    if fused_apply_fits(ny, nx):
        return "whole"
    return "tiled" if nx % 8 != 0 else None


def _use_fused_apply(cfg: SolverConfig, ny: int, nx: int) -> bool:
    """Whether a fused Pallas operator apply runs at this grid/config."""
    return _fused_apply_kernel(cfg, ny, nx) is not None


def _make_apply_cpx(coeffs: Cpx, cfg: SolverConfig, adjoint: bool = False):
    """Operator-apply closure H v (or H^H v) for the refinement/Krylov
    paths: the fused one-pass Pallas kernel when allowed
    (SolverConfig.fused_apply; the y-tiled variant past the whole-field
    kernel's VMEM ceiling), else the jnp 9-shifted-copies apply. The
    adjoint fused form gathers with the re-centered conjugate planes
    (split_engine.adjoint_coefficients_cpx, built once per closure) —
    same math as the scatter-form h_apply_adjoint_cpx."""
    ny, nx = coeffs.re.shape[-2:]
    kernel = _fused_apply_kernel(cfg, ny, nx)
    if kernel == "whole":
        from .pallas_stencil import h_apply_pallas_cpx
        planes = adjoint_coefficients_cpx(coeffs) if adjoint else coeffs
        return lambda v: h_apply_pallas_cpx(planes, v)
    if kernel == "tiled":
        from .pallas_stencil import h_apply_tiled_cpx
        planes = adjoint_coefficients_cpx(coeffs) if adjoint else coeffs
        return lambda v: h_apply_tiled_cpx(planes, v)
    if adjoint:
        return lambda v: h_apply_adjoint_cpx(coeffs, v)
    return lambda v: h_apply_cpx(coeffs, v)


def _banded_solve_refined_cpx(factor, rhs: Cpx,
                              cfg: SolverConfig, adjoint: bool,
                              precision=None, extra_refine=None,
                              refine_coeffs: Cpx | None = None) -> Cpx:
    """Banded solve + iterative refinement.

    ``refine_coeffs``: operator planes the refinement residual targets;
    defaults to the factor's own planes. The frozen-factor CG passes the
    CURRENT iteration's planes here while the factor (G panels AND sweep
    planes) stays consistently stale — mixing stale G with current sweep
    planes is NOT a factorization of anything and its forward/backward row
    recurrences compound a per-row gain that overflows f32 at 601 rows
    (measured: loss=nan on every stale iteration of the 601^2 inversion,
    fine at 301^2; PERF_NOTES round 4)."""
    opfn = _make_apply_cpx(factor.coeffs if refine_coeffs is None
                           else refine_coeffs, cfg, adjoint=adjoint)
    if isinstance(factor, TwistedFactorCpx):
        if factor.g_down is not None:
            from .pallas_twisted import twisted_solve_pallas
            base = (partial(twisted_solve_pallas, precision=precision)
                    if precision is not None else twisted_solve_pallas)
        else:
            base = twisted_solve_cpx
    elif isinstance(factor, CRFactor):
        base = cr_solve_cpx
    elif (jax.default_backend() != "cpu" and factor.sweeps is None):
        # Fused-sweep kernel: each pass is one pallas_call instead of an
        # XLA scan paying ~43 us/row of dispatch floor (ops/pallas_sweep).
        from .pallas_sweep import banded_solve_pallas
        if precision is not None:
            base = partial(banded_solve_pallas, precision=precision)
        else:
            base = banded_solve_pallas
    else:
        base = banded_solve_cpx
    x = base(factor, rhs, adjoint=adjoint)
    for _ in range(cfg.refine):
        r = rhs - opfn(x)
        x = x + base(factor, r, adjoint=adjoint)
    if extra_refine is not None:
        # Runtime-conditional refinement (frozen-factor CG: only the stale
        # iterations pay the extra apply + sweep pass).
        def _refine(x):
            r = rhs - opfn(x)
            return x + base(factor, r, adjoint=adjoint)

        x = jax.lax.cond(extra_refine, _refine, lambda x: x, x)
    return x


def _coarse_factor_cpx(vel, f, grid: Grid2D, cfg: SolverConfig,
                       attenuation=None):
    """Factored re-discretized 2h Helmholtz operator for the two-level
    shifted-Laplacian preconditioner (see preconditioner.coarse_grid):
    velocity/attenuation restricted by injection, same PML/stencil config,
    block-Thomas factorization (one per operator; serves forward and
    adjoint coarse corrections).

    The coarse operator carries a small complex shift
    (``cfg.coarse_shift_beta`` fraction of k^2, expressed through the
    attenuation channel: alpha = beta_c * omega / (2 c)): the raw coarse
    Helmholtz is indefinite with near-singular modes at slightly DIFFERENT
    wavenumbers than the fine operator, so an unshifted coarse solve
    amplifies those modes and the deflation diverges (measured: relres
    0.33 vs one-level 0.034 at 100 kHz/61^2); the shift bounds the coarse
    resolvent while leaving smooth-mode phases accurate."""
    from .preconditioner import coarse_grid

    gc = coarse_grid(grid)
    vel_c = jax.lax.stop_gradient(
        jnp.asarray(vel, jnp.float32))[::2, ::2]
    att_c = jnp.zeros_like(vel_c) if attenuation is None \
        else attenuation[::2, ::2]
    if cfg.coarse_shift_beta:
        att_c = att_c + (cfg.coarse_shift_beta * jnp.pi * f) / vel_c
    coeffs_c = helmholtz_coefficients_cpx(vel_c, gc, f, cfg.pml, cfg.stencil,
                                          attenuation=att_c)
    if jax.default_backend() != "cpu":
        from .pallas_factor import banded_factor_pallas
        return banded_factor_pallas(coeffs_c, keep_cropped=True)
    return banded_factor_cpx(coeffs_c)


def _split_precond_params(vel, f, grid: Grid2D, cfg: SolverConfig,
                          sign: float = -1.0) -> PrecondParams:
    """Shifted-Laplacian parameters with a split-complex k2_ref (mirror of
    the precond half of :func:`build_operator` for the split engine)."""
    vel_sg = jax.lax.stop_gradient(jnp.asarray(vel, jnp.float32))
    b, d, e = stencil_params(jnp.min(vel_sg), jnp.max(vel_sg), f, grid.h,
                             grid.aspect, cfg.stencil)
    k2_ref = shifted_k2_cpx(vel_sg, f, cfg.shift_beta, sign)
    return PrecondParams(
        k2_ref=jax.lax.stop_gradient(k2_ref),
        b=jnp.asarray(b, jnp.float32),
        d=jax.lax.stop_gradient(jnp.real(d)).astype(jnp.float32),
        e=jax.lax.stop_gradient(jnp.real(e)).astype(jnp.float32),
    )


def _operator_solve_split(op: HelmholtzOperator, src, grid: Grid2D,
                          cfg: SolverConfig, adjoint: bool, mesh=None,
                          grid_axis: str = "grid", precision=None,
                          extra_refine=None) -> Cpx:
    """Split-complex operator solve (banded method)."""
    src = cpxlib.of(src)
    single = src.ndim == 2
    if single:
        src = Cpx(src.re[None], src.im[None])
    if cfg.method == SolverMethod.BORN:
        u, _ = born_series_solve_cpx(op.vel, src, op.f, grid, cfg.born_pml,
                                     adjoint=adjoint,
                                     iter_cap=cfg.born_iter_cap,
                                     iter_scale=cfg.born_iter_scale,
                                     attenuation=op.attenuation)
    elif cfg.method == SolverMethod.BANDED:
        from ..parallel.spike import SpikeFactor, spike_solve
        rhs = src if adjoint else cpxlib.scale(src, op.d_map)
        if isinstance(op.factor, SpikeFactor):
            if mesh is None:
                raise ValueError("SPIKE operator solve needs the mesh the "
                                 "factor was built on (pass mesh=)")
            # The SPIKE solve is algebraically the same elimination as the
            # block-Thomas path (tests/test_spike.py pins sharded==Thomas to
            # <1e-4), so the refine ladder is unnecessary; cfg.refine is
            # ignored here. A mesh axis named "shot" additionally shards
            # the RHS batch (shot DP composed over the grid decomposition;
            # parallel.sharding.shot_grid_mesh / shard_fwi_data_shot_grid).
            batch_axis = "shot" if "shot" in mesh.axis_names else None
            u = spike_solve(op.factor, rhs, mesh, grid_axis, adjoint=adjoint,
                            batch_axis=batch_axis)
        else:
            u = _banded_solve_refined_cpx(op.factor, rhs, cfg,
                                          adjoint=adjoint,
                                          precision=precision,
                                          extra_refine=extra_refine,
                                          refine_coeffs=op.coeffs)
        if adjoint:
            u = cpxlib.scale(u, op.d_map)
    elif cfg.method == SolverMethod.GMRES:
        if adjoint:
            # Balanced w-space adjoint: H_s^H w = s, u = D w (see
            # _fd_solve_impl for why the u-space H^H form stalls GMRES).
            coeffs = adjoint_coefficients_cpx(op.coeffs)
            a_op = _make_apply_cpx(coeffs, cfg)
        else:
            a_op = _make_apply_cpx(op.coeffs, cfg)
        if cfg.gmres_two_level and op.factor is not None:
            from .preconditioner import make_two_level_preconditioner_cpx
            m_inv = make_two_level_preconditioner_cpx(
                grid, op.precond, a_op, op.factor, adjoint=adjoint,
                pml_margin=cfg.pml.l_pml + 2 * grid.dx)
        else:
            m_inv = make_fft_preconditioner_cpx(grid, op.precond,
                                                adjoint=adjoint)
        rhs = src if adjoint else cpxlib.scale(src, op.d_map)
        res = gmres_cpx(a_op, rhs, m_inv=m_inv, tol=cfg.tol,
                        maxiter=cfg.maxiter)
        u = cpxlib.scale(res.x, op.d_map) if adjoint else res.x
    else:
        raise NotImplementedError(
            "split_complex operator solve supports banded, gmres and born "
            "methods")
    if single:
        u = u[0]
    return u


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def build_operator(vel, f, grid: Grid2D, cfg: SolverConfig = SolverConfig(),
                   adjoint: bool = False, attenuation=None, pml_fields=None):
    """Coefficient planes + preconditioner parameters for H (or H^H)."""
    coeffs = helmholtz_coefficients(vel, grid, f, cfg.pml, cfg.stencil,
                                    attenuation=attenuation,
                                    pml_fields=pml_fields)
    if adjoint:
        coeffs = apply.adjoint_coefficients(coeffs)
    vel_sg = jax.lax.stop_gradient(jnp.asarray(vel, jnp.float32))
    b, d, e = stencil_params(jnp.min(vel_sg), jnp.max(vel_sg), f, grid.h,
                             grid.aspect, cfg.stencil)
    shift_sign = -1.0 if not adjoint else 1.0
    k2_ref = shifted_k2(vel_sg, f, cfg.shift_beta, shift_sign)
    precond = PrecondParams(
        k2_ref=jax.lax.stop_gradient(k2_ref),
        b=jnp.asarray(b, jnp.float32),
        d=jax.lax.stop_gradient(jnp.real(d)).astype(jnp.float32),
        e=jax.lax.stop_gradient(jnp.real(e)).astype(jnp.float32),
    )
    return coeffs, precond


def auto_split(config: SolverConfig) -> SolverConfig:
    """Turn on split-complex off-CPU.

    The targeted TPU runtime implements complex64 only for compute ops;
    complex data movement and D2H transfers are UNIMPLEMENTED, so any
    end-to-end path on an accelerator must use the split engine. CPU keeps
    the native-complex path (it is the oracle the split engine is tested
    against)."""
    import dataclasses

    import jax

    if not config.split_complex and jax.devices()[0].platform != "cpu":
        return dataclasses.replace(config, split_complex=True)
    return config


def solve_helmholtz(vel, src, f, grid: Grid2D,
                    config: SolverConfig = SolverConfig(),
                    adjoint: bool = False, x0=None, attenuation=None):
    """Solve H(vel) u = src (or H^H u = src) for a batch of sources.

    Args:
        vel: (ny, nx) real wave-speed map [m/s]. Differentiable.
        src: (batch, ny, nx) complex sources. Differentiable.
        f: frequency [Hz], scalar.
        adjoint: solve the conjugate-transpose system.
        x0: optional warm start (batch, ny, nx); used by the Krylov method
            only, and only in the primal computation.
        attenuation: optional (ny, nx) alpha map [Np/m] for lossy media
            (see stencil.helmholtz_coefficients). FD methods only; the Born
            path raises. Differentiable (inverting for alpha via autodiff
            works through the same custom-VJP solve).

    Returns:
        (u, SolveInfo): u is (batch, ny, nx) complex64.

    Note: diagnostics (residual/iteration count) are computed on a
    stop-gradient side path so the differentiable output is just u.
    """
    if config.split_complex:
        return _solve_helmholtz_split(vel, src, f, grid, config, adjoint, x0,
                                      attenuation=attenuation)
    src = jnp.asarray(src, jnp.complex64)
    single = src.ndim == 2
    if single:
        src = src[None]

    if config.method == SolverMethod.BORN:
        f32 = jnp.asarray(f, jnp.float32)
        if attenuation is None:
            u = _born_solve(jnp.asarray(vel, jnp.float32), src, f32, grid,
                            config, bool(adjoint))
        else:
            u = _born_solve_lossy(jnp.asarray(vel, jnp.float32),
                                  jnp.asarray(attenuation, jnp.float32),
                                  src, f32, grid, config, bool(adjoint))
        info = SolveInfo(jnp.zeros(src.shape[0], jnp.float32), jnp.int32(-1))
    else:
        coeffs, precond = build_operator(vel, f, grid, config, adjoint=adjoint,
                                         attenuation=attenuation)
        # Boundary-row scaling bookkeeping (see stencil.dirichlet_scale):
        # the planes describe H_s = D H with D = diag(scale on the border).
        #  * forward solve H u = s  <=>  H_s u = D s      (scale the RHS)
        #  * adjoint solve (all methods): H^H u = s <=> H_s^H w = s, u = D w
        #    (H_s^H stays balanced — D only rescales the unit boundary
        #    columns of H^H; see _fd_solve_impl)
        scale = dirichlet_scale(grid)
        border = boundary_mask(grid)
        d_map = (1.0 + (scale - 1.0) * border).astype(jnp.complex64)
        w_space_adj = adjoint
        if not adjoint:
            src = src * d_map

        if x0 is not None:
            x0 = jax.lax.stop_gradient(jnp.asarray(x0, jnp.complex64))
            if x0.ndim == 2:
                x0 = x0[None]
            if w_space_adj:
                x0 = x0 / d_map  # convert u-space warm start to w-space
            # Warm start: solve for the correction du relative to x0, so the
            # custom VJP still sees plain linear solves. Keeping coeffs
            # differentiable in r0 makes the total coefficient cotangent
            # exact: -lam * conj(shift(du + x0)) = -lam * conj(shift(u)).
            r0 = src - apply.h_apply(coeffs, x0)
            du = _fd_solve(coeffs, r0, precond, grid, config, bool(adjoint))
            u = x0 + du
        else:
            u = _fd_solve(coeffs, src, precond, grid, config, bool(adjoint))
        if w_space_adj:
            u = u * d_map
        # Diagnostics on a stop-gradient side path (cheap: one operator apply).
        coeffs_sg = jax.lax.stop_gradient(coeffs)
        w_sg = jax.lax.stop_gradient(u / d_map if w_space_adj else u)
        res = apply.h_apply(coeffs_sg, w_sg) - jax.lax.stop_gradient(src)
        rel = jnp.sqrt(
            jnp.sum(jnp.abs(res) ** 2, axis=(1, 2))
            / jnp.maximum(jnp.sum(jnp.abs(jax.lax.stop_gradient(src)) ** 2,
                                  axis=(1, 2)), 1e-38))
        info = SolveInfo(rel, jnp.int32(-1))

    if single:
        u = u[0]
    return u, info
