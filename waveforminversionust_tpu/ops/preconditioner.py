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
