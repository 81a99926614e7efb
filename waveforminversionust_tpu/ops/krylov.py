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

from . import cpx
from .cpx import Cpx


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


# ---------------------------------------------------------------------------
# Split-complex GMRES (Cpx pairs; see ops.cpx for why this exists on TPU)
# ---------------------------------------------------------------------------

def _norm2_cpx(a: Cpx, axis_name: str | None = None):
    n2 = jnp.sum(a.re * a.re + a.im * a.im,
                 axis=tuple(range(1, a.re.ndim)))
    if axis_name is not None:
        n2 = jax.lax.psum(n2, axis_name)
    return n2


def _bcast(s, like: Cpx):
    """(batch,) -> (batch, 1, ..., 1) matching ``like``'s field rank."""
    return s.reshape(s.shape + (1,) * (like.re.ndim - 1))


def _gmres_cycle_cpx(a_op: Callable, m_inv: Callable, x: Cpx, r: Cpx, m: int,
                     axis_name: str | None = None):
    """One split-complex GMRES(m) cycle (mirror of :func:`_gmres_cycle`).

    The small (m+1, m) Hessenberg least-squares is solved through the real
    embedding [[Hr, -Hi], [Hi, Hr]] [yr; yi] = [beta e1; 0], which is
    algebraically the same complex LSQ — min ||b - H y|| over complex y
    equals the real LSQ over (yr, yi) because the embedding is an isometry.
    Real batched QR is in the targeted runtime's implemented set; complex
    QR is not.

    ``axis_name``: when the field axes are sharded over a mesh axis (the
    pencil-decomposed 3D path), every field-space inner product psums over
    it — the Hessenberg system is then replicated bit-identically on all
    devices and the small LSQ needs no communication.
    """
    batch = r.re.shape[0]
    beta = jnp.sqrt(_norm2_cpx(r, axis_name))  # (batch,)
    inv_beta = 1.0 / jnp.maximum(beta, 1e-38)

    v_shape = (m + 1, batch) + r.re.shape[1:]
    v = cpx.zeros(v_shape)
    v = Cpx(v.re.at[0].set(r.re * _bcast(inv_beta, r)),
            v.im.at[0].set(r.im * _bcast(inv_beta, r)))
    h = cpx.zeros((batch, m + 1, m))

    def arnoldi_step(j, carry):
        v, h = carry
        w = a_op(m_inv(v[j]))
        idx = jnp.arange(m + 1)
        mask = (idx <= j).astype(jnp.float32)

        def mgs(i, state):
            w_, h_ = state
            # hij = <v_i, w> = sum(conj(v_i) * w)
            axes = tuple(range(1, w_.re.ndim))
            hre = jnp.sum(v.re[i] * w_.re + v.im[i] * w_.im, axis=axes)
            him = jnp.sum(v.re[i] * w_.im - v.im[i] * w_.re, axis=axes)
            if axis_name is not None:
                hre = jax.lax.psum(hre, axis_name)
                him = jax.lax.psum(him, axis_name)
            hre = hre * mask[i]
            him = him * mask[i]
            br, bi = _bcast(hre, w_), _bcast(him, w_)
            w_ = Cpx(w_.re - (br * v.re[i] - bi * v.im[i]),
                     w_.im - (br * v.im[i] + bi * v.re[i]))
            h_ = Cpx(h_.re.at[:, i, j].set(hre), h_.im.at[:, i, j].set(him))
            return (w_, h_)

        w, h = jax.lax.fori_loop(0, m + 1, mgs, (w, h))
        hnext = jnp.sqrt(_norm2_cpx(w, axis_name))
        h = Cpx(h.re.at[:, j + 1, j].set(hnext), h.im)
        inv_h = _bcast(1.0 / jnp.maximum(hnext, 1e-38), w)
        v = Cpx(v.re.at[j + 1].set(w.re * inv_h),
                v.im.at[j + 1].set(w.im * inv_h))
        return (v, h)

    v, h = jax.lax.fori_loop(0, m, arnoldi_step, (v, h))

    # Real-embedded least squares: G (batch, 2(m+1), 2m), rhs (batch, 2(m+1)).
    g = jnp.concatenate([
        jnp.concatenate([h.re, -h.im], axis=2),
        jnp.concatenate([h.im, h.re], axis=2),
    ], axis=1)
    rhs = jnp.zeros((batch, 2 * (m + 1)), jnp.float32).at[:, 0].set(beta)
    q, rr = jnp.linalg.qr(g, mode="reduced")   # q: (b, 2(m+1), 2m)
    qtb = jnp.einsum("bij,bi->bj", q, rhs)
    diag = jnp.abs(jnp.diagonal(rr, axis1=1, axis2=2))
    eps = 1e-30 * jnp.maximum(jnp.max(diag, axis=1, keepdims=True), 1e-38)
    rr = rr + jnp.eye(2 * m, dtype=jnp.float32) * eps[:, :, None]
    y2 = jax.scipy.linalg.solve_triangular(rr, qtb[..., None],
                                           lower=False)[..., 0]
    y = Cpx(y2[:, :m], y2[:, m:])

    # vy = sum_j y_j v_j over the stored (unpreconditioned) basis.
    vy = Cpx(jnp.einsum("jb...,bj->b...", v.re[:m], y.re)
             - jnp.einsum("jb...,bj->b...", v.im[:m], y.im),
             jnp.einsum("jb...,bj->b...", v.re[:m], y.im)
             + jnp.einsum("jb...,bj->b...", v.im[:m], y.re))
    return x + m_inv(vy)


def gmres_cpx(a_op: Callable, b: Cpx, m_inv: Callable | None = None,
              x0: Cpx | None = None, tol: float = 1e-5,
              maxiter: int = 1000, restart: int = 16,
              axis_name: str | None = None) -> KrylovResult:
    """Restarted GMRES on split-complex data; semantics match :func:`gmres`.

    a_op/m_inv map Cpx (batch, ...) -> Cpx (batch, ...). Monotone and
    NaN-safe per lane exactly like the native path.

    ``axis_name``: set when called inside shard_map with the FIELD axes
    sharded over that mesh axis (batch replicated). All inner products are
    psum-reduced, so every device runs the same Hessenberg problem and the
    iterate stays consistent; the only extra communication is one scalar
    psum per MGS dot.
    """
    if m_inv is None:
        m_inv = lambda v: v
    # Zero start DERIVED from b so its type carries the mesh-axis "varying"
    # tag under shard_map (a plain cpx.zeros is replicated-typed and trips
    # the while_loop carry check; see parallel.fft3d._born_local).
    x = Cpx(b.re * 0, b.im * 0) if x0 is None else x0
    r = b - a_op(x) if x0 is not None else b
    bnorm2 = jnp.maximum(_norm2_cpx(b, axis_name), 1e-38)
    tol2 = jnp.float32(tol) ** 2 * bnorm2

    class State(NamedTuple):
        x: Cpx
        r: Cpx
        matvecs: jnp.ndarray

    def cond(st: State):
        res = _norm2_cpx(st.r, axis_name)
        unconverged = (res > tol2) & jnp.isfinite(res)
        return jnp.any(unconverged) & (st.matvecs < maxiter)

    def body(st: State):
        x_new = _gmres_cycle_cpx(a_op, m_inv, st.x, st.r, restart,
                                 axis_name)
        r_new = b - a_op(x_new)
        res_new = _norm2_cpx(r_new, axis_name)
        accept = (res_new <= _norm2_cpx(st.r, axis_name)) & jnp.isfinite(res_new)
        af_x = _bcast(accept, st.x)
        return State(x=Cpx(jnp.where(af_x, x_new.re, st.x.re),
                           jnp.where(af_x, x_new.im, st.x.im)),
                     r=Cpx(jnp.where(af_x, r_new.re, st.r.re),
                           jnp.where(af_x, r_new.im, st.r.im)),
                     matvecs=st.matvecs + restart + 1)

    final = jax.lax.while_loop(cond, body, State(x, r, jnp.int32(0)))
    rel = jnp.sqrt(_norm2_cpx(final.r, axis_name) / bnorm2)
    return KrylovResult(x=final.x, rel_residual=rel, iterations=final.matvecs)
