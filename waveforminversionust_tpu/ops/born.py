"""Convergent Born series (CBS) Helmholtz solver — spectral, matrix-free.

A TPU-native port of the reference's matrix-free alternative solver
(reference: Functions/solveHelmholtzBornSeries.m:1-71), after Osnabrugge,
Leedumrongwatthanakun & Vellekoop (J. Comput. Phys. 2016): split the
heterogeneous Helmholtz operator into a constant absorbing background solved
exactly by FFT plus a scattering potential V, and iterate the preconditioned
fixed point

    u <- u - gamma * (u - G(V u - src)),   gamma = i V / eps,

which is guaranteed to converge when eps >= max|k^2 - k0^2|. The iteration
count follows from the pseudo-propagation length 2 k0/eps per iteration
(reference: solveHelmholtzBornSeries.m:45-49).

This solver discretizes the *continuous* operator spectrally; it is faster per
solve than the FD-parity Krylov path but does not reproduce the reference's
9-point stencil solutions bit-for-bit. Use it for forward modeling/synthesis;
use :class:`SolverMethod.BANDED` when FD parity matters.

Absorbing boundary: the polynomial boundary curve of Osnabrugge et al.,
matching the reference implementation (solveHelmholtzBornSeries.m:23-37)
including the N=9 polynomial order.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..config import PMLConfig
from ..models.grid import Grid2D


def _boundary_curve(r, c, n_order: int, k0, sign):
    """Polynomial absorbing-boundary k^2 increment (Osnabrugge eq. ~27).

    f(r) = c^2 (N - c r + 2 i k0 r sign) (c r)^(N-1) / (N! * P(c r)) where
    P is the truncated Taylor expansion of exp (reference:
    solveHelmholtzBornSeries.m:28-31).
    """
    cr = c * r
    # Truncated exponential sum_{m=0..N} (cr)^m / m! via Horner.
    trunc_exp = jnp.ones_like(cr)
    for m in range(n_order, 0, -1):
        trunc_exp = 1 + trunc_exp * cr / m
    num = (c ** 2) * (n_order - cr + 2j * k0 * r * sign) * cr ** (n_order - 1)
    return num / (math.factorial(n_order) * trunc_exp)


def born_operator(vel, f, grid: Grid2D, pml: PMLConfig = PMLConfig(),
                  adjoint: bool = False, n_order: int = 9,
                  attenuation=None):
    """Build the CBS split: Green's operator, potential, preconditioner.

    Returns (greens, v_pot, gamma, n_iter_heuristic) with
    ``greens(w) = IFFT(g0 * FFT(w))`` (reference:
    solveHelmholtzBornSeries.m:53-58) and the physics-derived iteration
    count per unit ``iter_scale``.

    ``attenuation``: optional (ny, nx) alpha map [Np/m]; the interior
    wavenumber becomes k = omega/c + i*sgn*alpha — the same lossy-media
    convention as the FD engines (stencil.helmholtz_coefficients) and the
    3D CBS (born3d.born_operator_3d); the wavenumber is engine-agnostic.
    The adjoint operator stays the conjugate via the same ``sign`` flip.
    """
    ny, nx = grid.ny, grid.nx
    dx, dy = grid.dx, grid.dy
    sign = float(pml.sign_convention) * (-1.0 if adjoint else 1.0)

    vel = jnp.asarray(vel, jnp.float32)
    k_real = 2 * jnp.pi * f / vel
    k = k_real.astype(jnp.complex64)
    if attenuation is not None:
        alpha = jnp.asarray(attenuation, jnp.float32)
        k = k + (1j * sign) * alpha.astype(jnp.complex64)

    # Fourier grid (angular wavenumbers), fftfreq convention
    # (reference: solveHelmholtzBornSeries.m:20-21).
    kx = (2 * jnp.pi * jnp.fft.fftfreq(nx, d=dx)).astype(jnp.float32)
    ky = (2 * jnp.pi * jnp.fft.fftfreq(ny, d=dy)).astype(jnp.float32)
    p2 = (kx[None, :] ** 2 + ky[:, None] ** 2).astype(jnp.complex64)

    # Polynomial absorbing boundary layered onto k^2 (tuned on the REAL
    # background wavenumber, like born3d: the shell is discretization).
    c_att = pml.a0 / pml.l_pml
    k0_b = jnp.sqrt(jnp.mean(k_real ** 2))
    x = jnp.asarray(grid.x, jnp.float32)
    y = jnp.asarray(grid.y, jnp.float32)
    x_pml = jnp.maximum(jnp.abs(x) + pml.l_pml - (nx - 1) * dx / 2, 0.0)
    y_pml = jnp.maximum(jnp.abs(y) + pml.l_pml - (ny - 1) * dy / 2, 0.0)
    r_b = jnp.sqrt(x_pml[None, :] ** 2 + y_pml[:, None] ** 2)
    k = jnp.sqrt(k ** 2 + _boundary_curve(r_b, c_att, n_order, k0_b, sign))

    # Scattering potential and convergence shift
    # (reference: solveHelmholtzBornSeries.m:39-49).
    k_0 = (jnp.min(jnp.real(k)) + jnp.max(jnp.real(k))) / 2
    v_pot = k ** 2 - k_0 ** 2
    eps = jnp.max(jnp.abs(v_pot)) * sign
    v_pot = v_pot - 1j * eps
    gamma = 1j / eps * v_pot

    pseudo_prop_len = 2 * k_0 / jnp.abs(eps)
    n_iter = jnp.ceil(jnp.float32(grid.diagonal) / pseudo_prop_len)

    g0_k = 1.0 / (p2 - (k_0 ** 2 + 1j * eps))

    def greens(w):
        return jnp.fft.ifft2(g0_k * jnp.fft.fft2(w)).astype(jnp.complex64)

    return greens, v_pot, gamma, n_iter


def born_series_solve(vel, src, f, grid: Grid2D, pml: PMLConfig = PMLConfig(),
                      adjoint: bool = False, n_order: int = 9,
                      iter_cap: int = 1000, iter_scale: float = 1.0,
                      attenuation=None):
    """Solve the Helmholtz equation by convergent Born series (plain
    Richardson iteration, matching the reference's loop,
    solveHelmholtzBornSeries.m:66-70).

    Args:
        vel: (ny, nx) wave speed [m/s].
        src: (batch, ny, nx) complex sources.
        f: frequency [Hz].
        adjoint: solve the conjugated (adjoint) equation, matching the
            reference's sign flip (solveHelmholtzBornSeries.m:10-14).
        iter_cap: hard bound on the data-dependent iteration count.

    Returns:
        (wavefield (batch, ny, nx) complex64, iterations int32)
    """
    greens, v_pot, gamma, n_heur = born_operator(vel, f, grid, pml, adjoint,
                                                 n_order,
                                                 attenuation=attenuation)
    n_iter = jnp.minimum((iter_scale * n_heur).astype(jnp.int32), iter_cap)
    src = jnp.asarray(src, jnp.complex64)

    def body(i, u):
        return u - gamma * (u - greens(v_pot * u - src))

    u0 = jnp.zeros_like(src)
    u = jax.lax.fori_loop(0, n_iter, body, u0)
    return u, n_iter


def born_gmres_solve(vel, src, f, grid: Grid2D, pml: PMLConfig = PMLConfig(),
                     adjoint: bool = False, n_order: int = 9,
                     tol: float = 1e-5, maxiter: int = 600,
                     restart: int = 16, attenuation=None):
    """Krylov-accelerated convergent Born series.

    The CBS fixed point u <- u - gamma (u - G(Vu - src)) is a Richardson
    iteration on the linear system A u = b with A = gamma (I - G V) and
    b = -gamma G src, whose spectrum lies in the unit disk centered at 1
    (the CBS convergence proof). Restarted GMRES on the same operator
    minimizes over the Krylov space instead of taking Richardson steps —
    typically 2-5x fewer FFT pairs for the same accuracy, and monotone in
    f32. Each matvec is exactly one FFT pair (same cost as one CBS
    iteration).

    Returns (wavefield, matvecs int32).
    """
    from .krylov import gmres

    greens, v_pot, gamma, _ = born_operator(vel, f, grid, pml, adjoint,
                                            n_order, attenuation=attenuation)
    src = jnp.asarray(src, jnp.complex64)

    def a_op(u):
        return gamma * (u - greens(v_pot * u))

    b = -gamma * greens(src)
    res = gmres(a_op, b, tol=tol, maxiter=maxiter, restart=restart)
    return res.x, res.iterations
