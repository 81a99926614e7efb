"""Shifted-Laplacian FFT preconditioner for the 9-point Helmholtz system.

The Helmholtz matrix is indefinite; unpreconditioned Krylov methods stall
(the reference team measured jax spsolve at 237 s and fell back to host
SuperLU; reference: solve_helmholtz.py:85-96, FinalPresentation "Too slow!").
The classic fix is to precondition with a *complex-shifted* constant-
coefficient Helmholtz operator, which on a uniform grid is diagonal in
Fourier space: M^-1 v = IFFT( FFT(v) / symbol ). The shifted operator is
strongly absorbing, so its Green's function decays within a few cells and
periodic wrap-around from the FFT is negligible — no padding is needed for
correctness; we pad only to reach efficient FFT sizes.

We use the *discrete* symbol of the same 9-point stencil (not the continuous
Laplacian), so M matches H exactly up to the PML ring and the medium
heterogeneity, giving mesh-independent convergence in a few dozen iterations.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

from ..models.grid import Grid2D
from . import cpx
from .cpx import Cpx
from .stencil import constant_stencil_symbol, constant_stencil_symbol_parts


def good_fft_size(n: int) -> int:
    """Smallest 5-smooth integer >= n (efficient XLA FFT size)."""
    m = n
    while True:
        k = m
        for p in (2, 3, 5):
            while k % p == 0:
                k //= p
        if k == 1:
            return m
        m += 1


class PrecondParams(NamedTuple):
    """Traced scalars the preconditioner depends on (a pytree)."""

    k2_ref: jnp.ndarray  # complex shifted reference wavenumber^2
    b: jnp.ndarray
    d: jnp.ndarray
    e: jnp.ndarray


def shifted_k2(vel, f, beta: float, sign: float):
    """Complex-shifted reference k^2 = (2 pi f / c_ref)^2 * (1 + i beta sign).

    ``sign`` must make the shifted operator *absorbing* for the field sign
    convention in use; with the reference's exp(-ikr) convention (-1) the
    correct shift has sign = -1 for the forward operator and +1 for the
    adjoint (empirically verified; see tests/test_solvers.py TestGmres).
    """
    c_ref = (jnp.min(vel) + jnp.max(vel)) / 2
    k2 = (2 * jnp.pi * f / c_ref) ** 2
    return (k2 * (1 + 1j * beta * sign)).astype(jnp.complex64)


def make_fft_preconditioner(grid: Grid2D, params: PrecondParams,
                            adjoint: bool = False) -> Callable:
    """Returns M_inv(v) for fields v of shape (..., ny, nx).

    ``adjoint=True`` applies (M^H)^-1, whose symbol is the conjugate (the
    constant-coefficient stencil is symmetric, so M^H = conj(M)).
    """
    ny, nx = grid.ny, grid.nx
    nfy, nfx = good_fft_size(ny), good_fft_size(nx)
    symbol = constant_stencil_symbol(params.k2_ref, params.b, params.d,
                                     params.e, grid.h, grid.aspect, nfy, nfx)
    if adjoint:
        symbol = jnp.conj(symbol)
    inv_symbol = 1.0 / symbol

    def m_inv(v):
        pad = [(0, 0)] * (v.ndim - 2) + [(0, nfy - ny), (0, nfx - nx)]
        vp = jnp.pad(v, pad)
        w = jnp.fft.ifft2(jnp.fft.fft2(vp) * inv_symbol)
        return w[..., :ny, :nx].astype(v.dtype)

    return m_inv


def shifted_k2_cpx(vel, f, beta: float, sign: float) -> Cpx:
    """Split-complex :func:`shifted_k2` (no complex scalars formed)."""
    c_ref = (jnp.min(vel) + jnp.max(vel)) / 2
    k2 = ((2 * jnp.pi * f / c_ref) ** 2).astype(jnp.float32)
    return Cpx(k2, k2 * jnp.float32(beta * sign))


def coarse_grid(grid: Grid2D) -> Grid2D:
    """The 2h grid on the even fine nodes (fine nx, ny must be odd so the
    domain corners coincide — true for the reference's 301^2 and every
    Grid2D.centered grid)."""
    if grid.nx % 2 == 0 or grid.ny % 2 == 0:
        raise ValueError("two-level coarsening needs odd fine dimensions")
    return Grid2D(nx=(grid.nx + 1) // 2, ny=(grid.ny + 1) // 2,
                  dx=2 * grid.dx, dy=2 * grid.dy, x0=grid.x0, y0=grid.y0)


def _restrict_axis(p, axis):
    """Full-weighting [1/4, 1/2, 1/4] + stride-2 sampling along ``axis``."""
    n = p.shape[axis]
    pad = [(0, 0)] * p.ndim
    pad[axis] = (1, 1)
    pp = jnp.pad(p, pad)

    def sl(start):
        idx = [slice(None)] * p.ndim
        idx[axis] = slice(start, start + n, 2)
        return pp[tuple(idx)]

    return 0.25 * sl(0) + 0.5 * sl(1) + 0.25 * sl(2)


def restrict_cpx(v: Cpx) -> Cpx:
    """Full-weighting restriction of (..., ny, nx) split-complex fields to
    the :func:`coarse_grid` nodes."""
    return cpx.apply_parts(
        lambda p: _restrict_axis(_restrict_axis(p, -2), -1), v)


def _prolong_axis(p, axis, n_fine):
    mid = jnp.moveaxis(p, axis, -1)
    odd = 0.5 * (mid[..., :-1] + mid[..., 1:])
    out = jnp.zeros(mid.shape[:-1] + (n_fine,), p.dtype)
    out = out.at[..., 0::2].set(mid)
    out = out.at[..., 1::2].set(odd)
    return jnp.moveaxis(out, -1, axis)


def prolong_cpx(v: Cpx, ny: int, nx: int) -> Cpx:
    """Bilinear prolongation (the transpose stencil of :func:`restrict_cpx`
    up to the standard factor) back to the (ny, nx) fine grid."""
    return cpx.apply_parts(
        lambda p: _prolong_axis(_prolong_axis(p, -2, ny), -1, nx), v)


def make_two_level_preconditioner_cpx(grid: Grid2D, params: PrecondParams,
                                      a_op: Callable, coarse_factor,
                                      adjoint: bool = False,
                                      pml_margin: float = 0.0) -> Callable:
    """Two-level (deflated) shifted-Laplacian preconditioner, ADEF form:

        P^-1 v = y + M^-1 (v - A y),   y = P A_c^-1 R v,

    i.e. a direct coarse-grid correction (re-discretized 2h Helmholtz
    operator, block-Thomas-factored once per operator) followed by the
    one-level shifted-Laplacian FFT sweep on the corrected residual. The
    coarse solve deflates the near-kernel (smooth, near-resonant) modes
    that make the one-level preconditioned iteration count grow with
    wavenumber [Erlangga & Nabben 2008; Sheikh/Lahaye/Vuik 2013 — see
    PAPERS.md]; measured matvec counts: PERF_NOTES round 3.

    ``a_op``: the (balanced) fine operator the GMRES solve targets;
    ``coarse_factor``: BandedFactorCpx of the re-discretized coarse system
    (same builder as the fine direct method; reuse across solves).

    The correction is restricted to the PHYSICAL region (inside the PML,
    and off the Dirichlet border ring):

      * the balanced border rows carry scale 1/h^2 fine but 1/(2h)^2
        coarse, so an unmasked correction returns 4x any border component
        and the residual update turns it into -3x — amplification by 3
        per application;
      * the coarse PML (half the cells of the fine one) is a materially
        different absorber, and power iteration on the unmasked error
        propagator I - P^-1 A shows its dominant growth concentrated in
        the PML corners (growth ~30 vs ~21 one-level, measured at
        100 kHz/61^2).

    PML/border components pass through to the FFT sweep untouched, exactly
    as in the one-level scheme — they are strongly damped modes that GMRES
    resolves quickly anyway; the coarse solve accelerates precisely the
    propagating physical-domain modes whose count otherwise grows with k.
    """
    from .split_engine import banded_solve_cpx

    m_inv = make_fft_preconditioner_cpx(grid, params, adjoint=adjoint)
    ny, nx = grid.ny, grid.nx
    x = jnp.arange(nx, dtype=jnp.float32) * grid.dx
    y = jnp.arange(ny, dtype=jnp.float32) * grid.dy
    lx, ly = x[-1], y[-1]
    dist = jnp.minimum(jnp.minimum(x, lx - x)[None, :],
                       jnp.minimum(y, ly - y)[:, None])
    interior = (dist > pml_margin).astype(jnp.float32)

    def p_inv(v: Cpx) -> Cpx:
        vc = restrict_cpx(cpx.scale(v, interior))
        yc = banded_solve_cpx(coarse_factor, vc, adjoint=adjoint)
        y = cpx.scale(prolong_cpx(yc, ny, nx), interior)
        r = v - a_op(y)
        return y + m_inv(r)

    return p_inv


def make_fft_preconditioner_cpx(grid: Grid2D, params: PrecondParams,
                                adjoint: bool = False) -> Callable:
    """Split-complex :func:`make_fft_preconditioner`.

    ``params.k2_ref`` must be a :class:`~.cpx.Cpx` scalar (the rest of the
    params are real). Returns M_inv(v) for Cpx fields of shape (..., ny, nx).
    The targeted TPU runtime implements fft/real/imag but not complex data
    movement, so the whole application stays in split form (cpx.fft2).
    """
    ny, nx = grid.ny, grid.nx
    nfy, nfx = good_fft_size(ny), good_fft_size(nx)
    s0, s1 = constant_stencil_symbol_parts(params.b, params.d, params.e,
                                           grid.h, grid.aspect, nfy, nfx)
    k2 = params.k2_ref
    symbol = Cpx(s0 + k2.re * s1, k2.im * s1)
    if adjoint:
        symbol = symbol.conj()
    inv_symbol = cpx.reciprocal(symbol)

    def m_inv(v: Cpx) -> Cpx:
        pad = [(0, 0)] * (v.ndim - 2) + [(0, nfy - ny), (0, nfx - nx)]
        vp = cpx.pad(v, pad)
        w = cpx.ifft2(cpx.mul(cpx.fft2(vp), inv_symbol))
        return w[..., :ny, :nx]

    return m_inv
