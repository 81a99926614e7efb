"""Batched restarted GMRES for matrix-free complex systems on TPU.

Why GMRES and not BiCGSTAB: TPUs compute in float32, and BiCGSTAB's short
recurrences lose orthogonality and *diverge* in complex64 on Helmholtz-type
spectra (measured; see tests). GMRES minimizes the true residual over the
Krylov space each cycle, so it is monotone by construction and degrades
gracefully in low precision. Restarts double as iterative refinement: each
cycle recomputes the true residual b - A x.

Right preconditioning keeps the monitored residual equal to the true
residual, and by linearity the solution update needs only the Arnoldi basis
V: x += M^-1 (V y) — the preconditioned basis Z never has to be stored, which
matters at (256 sources, 301, 301) complex64 scale.

This module is shared by two solver paths: the 9-point FD operator with the
shifted-Laplacian FFT preconditioner, and the Krylov-accelerated convergent
Born series (the fixed-point operator of reference
solveHelmholtzBornSeries.m:66-70 recast as a linear system).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class KrylovResult(NamedTuple):
    x: jnp.ndarray             # (batch, ...) solution
    rel_residual: jnp.ndarray  # (batch,) final true relative residual
    iterations: jnp.ndarray    # scalar int32: total matvecs


def _norm2(a):
    return jnp.real(jnp.sum(jnp.conj(a) * a, axis=tuple(range(1, a.ndim))))


def _gmres_cycle(a_op: Callable, m_inv: Callable, x, r, m: int):
    """One GMRES(m) cycle from current iterate x with residual r.

    Returns updated x (monotone: falls back to x when no progress).
    """
    batch = r.shape[0]
    beta = jnp.sqrt(_norm2(r))  # (batch,)
    safe_beta = jnp.maximum(beta, 1e-38)
    cdtype = r.dtype

    v_shape = (m + 1, batch) + r.shape[1:]
    v0 = jnp.zeros(v_shape, cdtype)
    v0 = v0.at[0].set(r / safe_beta[:, None, None].astype(cdtype))
    h0 = jnp.zeros((batch, m + 1, m), cdtype)

    def arnoldi_step(j, carry):
        v, h = carry
        w = a_op(m_inv(v[j]))
        # Modified Gram-Schmidt against v_0..v_j (mask rows > j).
        idx = jnp.arange(m + 1)
        mask = (idx <= j).astype(w.real.dtype)

        def mgs(i, state):
            w_, h_ = state
            hij = jnp.sum(jnp.conj(v[i]) * w_, axis=tuple(range(1, w_.ndim)))
            hij = hij * mask[i].astype(cdtype)
            w_ = w_ - hij[:, None, None].astype(cdtype) * v[i]
            h_ = h_.at[:, i, j].set(hij)
            return (w_, h_)

        w, h = jax.lax.fori_loop(0, m + 1, mgs, (w, h))
        hnext = jnp.sqrt(_norm2(w))
        h = h.at[:, j + 1, j].set(hnext.astype(cdtype))
        v = v.at[j + 1].set(w / jnp.maximum(hnext, 1e-38)[:, None, None].astype(cdtype))
        return (v, h)

    v, h = jax.lax.fori_loop(0, m, arnoldi_step, (v0, h0))

    # Least squares min || beta e1 - H y || per lane via QR of (m+1, m).
    e1 = jnp.zeros((batch, m + 1), cdtype).at[:, 0].set(beta.astype(cdtype))
    q, rr = jnp.linalg.qr(h, mode="reduced")  # q: (batch, m+1, m), rr: (batch, m, m)
    rhs = jnp.einsum("bij,bi->bj", jnp.conj(q), e1)
    # Guard singular rr (happy breakdown): regularize the diagonal.
    diag = jnp.abs(jnp.diagonal(rr, axis1=1, axis2=2))
    eps = 1e-30 * jnp.maximum(jnp.max(diag, axis=1, keepdims=True), 1e-38)
    rr = rr + (jnp.eye(m, dtype=cdtype) * eps[:, :, None])
    y = jax.scipy.linalg.solve_triangular(rr, rhs[..., None], lower=False)[..., 0]

    vy = jnp.einsum("jb...,bj->b...", v[:m], y)
    x_new = x + m_inv(vy)
    return x_new


def gmres(a_op: Callable, b: jnp.ndarray, m_inv: Callable | None = None,
          x0: jnp.ndarray | None = None, tol: float = 1e-5,
          maxiter: int = 1000, restart: int = 16) -> KrylovResult:
    """Restarted GMRES, batched over axis 0; runs as one lax.while_loop.

    Args:
        a_op: operator, (batch, ny, nx) -> (batch, ny, nx).
        b: right-hand sides (batch, ny, nx) complex.
        m_inv: right preconditioner (identity if None).
        x0: warm start (zeros if None).
        tol: true relative-residual target per lane.
        maxiter: total matvec cap.
        restart: Krylov subspace size per cycle.
    """
    if m_inv is None:
        m_inv = lambda v: v
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else x0.astype(b.dtype)
    r = b - a_op(x) if x0 is not None else b
    bnorm2 = jnp.maximum(_norm2(b), 1e-38)
    tol2 = jnp.float32(tol) ** 2 * bnorm2

    class State(NamedTuple):
        x: jnp.ndarray
        r: jnp.ndarray
        matvecs: jnp.ndarray

    def cond(st: State):
        res = _norm2(st.r)
        unconverged = (res > tol2) & jnp.isfinite(res)
        return jnp.any(unconverged) & (st.matvecs < maxiter)

    def body(st: State):
        x_new = _gmres_cycle(a_op, m_inv, st.x, st.r, restart)
        r_new = b - a_op(x_new)
        # Monotonicity guard per lane, NaN-safe: a cycle is accepted only if
        # its residual is finite AND no worse (a QR of a fully-converged
        # lane's zero Krylov basis can produce NaN; `NaN > x` is False, so a
        # plain 'worse' test would silently accept the NaN iterate).
        res_new = _norm2(r_new)
        accept = (res_new <= _norm2(st.r)) & jnp.isfinite(res_new)
        af = accept[:, None, None]
        return State(x=jnp.where(af, x_new, st.x),
                     r=jnp.where(af, r_new, st.r),
                     matvecs=st.matvecs + restart + 1)

    final = jax.lax.while_loop(cond, body, State(x, r, jnp.int32(0)))
    rel = jnp.sqrt(_norm2(final.r) / bnorm2)
    return KrylovResult(x=final.x, rel_residual=rel, iterations=final.matvecs)
