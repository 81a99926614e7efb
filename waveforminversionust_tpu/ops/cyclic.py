"""Block cyclic-reduction factorization of the Helmholtz system.

TPU-first replacement for the sequential block-Thomas factorization
(:mod:`.split_engine`). The system is block-tridiagonal over grid rows
(tridiagonal (nx, nx) blocks from the 9-point stencil). Block-Thomas
computes 301 Schur-complement inverses *sequentially* — on the targeted
runtime each ``jnp.linalg.inv`` is latency-bound (~0.3 ms), so the
factorization alone costs ~86 ms/iteration (PERF_NOTES.md).

Cyclic reduction eliminates all ODD block rows at once: their diagonal
inverses are independent, so each level does ONE batched inversion
(:func:`.batched_inv.batched_inv` — blocked Gauss-Jordan on the MXU) plus
batched products, then recurses on the even rows. log2(ny) levels replace
ny sequential steps, for both the factorization and the solve sweeps.

Level 0 exploitation: the original D/L/U blocks are tridiagonal, so every
level-0 product is a banded row/column combination (VPU elementwise, no
dense matmuls). Deeper levels are dense batched einsums.

One factor serves forward AND adjoint (H^H) solves: the conjugate
transpose of a cyclic-reduction factor of H is algebraically the
cyclic-reduction factor of H^H —
  down-pass:  b'_t = b_{2t} - Lt_t b_{2t-1} - Ut_t b_{2t+1}
  (adjoint:   b'_t = b_{2t} - DU^H_{t-1} b_{2t-1} - DL^H_t b_{2t+1})
  up-pass:    u_{2t+1} = Dinv_t b - DL_t u_{2t} - DU_t u_{2t+2}
  (adjoint:   u_{2t+1} = Dinv^H_t b - Ut^H_t u_{2t} - Lt^H_{t+1} u_{2t+2})
with Lt = L_even Dinv_left, Ut = U_even Dinv_right, DL = Dinv L_odd,
DU = Dinv U_odd (derivation: the H^H block rows are (U_{i-1}^H, D_i^H,
L_{i+1}^H); substituting shows each level's reduced system is the
conjugate transpose of the stored one).

Unpivoted, like the rest of the solver stack; validated against the
block-Thomas solver and scipy in tests/test_cyclic.py.

Reference being replaced: the host SuperLU factorization at
solve_helmholtz.py:85-93 / solveHelmholtz.m:128-137.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import cpx
from .cpx import Cpx
from .batched_inv import batched_inv


class CRLevel(NamedTuple):
    """One reduction level. n_odd = m // 2, n_even = m - n_odd rows."""
    dinv: Cpx  # (n_odd, nx, nx)  inverses of odd diagonal blocks
    lt: Cpx    # (n_even, nx, nx) L_even @ Dinv(left odd);  lt[0] = 0
    ut: Cpx    # (n_even, nx, nx) U_even @ Dinv(right odd); ut[-1] = 0 if unpaired
    dl: Cpx    # (n_odd, nx, nx)  Dinv @ L_odd
    du: Cpx    # (n_odd, nx, nx)  Dinv @ U_odd


class CRFactor(NamedTuple):
    levels: tuple  # tuple[CRLevel, ...] — static structure per ny
    dinv_root: Cpx  # (1, nx, nx) inverse of the final reduced block
    coeffs: Cpx     # the (9, ny, nx) planes (kept for residual checks)


# -- batched tridiagonal helpers ----------------------------------------------

def _btri_dense(main: Cpx, sub: Cpx, sup: Cpx) -> Cpx:
    """(B, nx) tridiagonal coefficient vectors -> (B, nx, nx) dense blocks.

    Convention matches banded._tri_dense: row r couples to r-1 via sub[r]
    and to r+1 via sup[r] (sub[0], sup[-1] unused -> masked out).
    """
    n = main.re.shape[-1]
    i = jnp.arange(n)
    e_mn = (i[:, None] == i[None, :]).astype(jnp.float32)
    e_dn = (i[:, None] == i[None, :] + 1).astype(jnp.float32)  # (r, r-1)
    e_up = (i[:, None] + 1 == i[None, :]).astype(jnp.float32)  # (r, r+1)

    def build(m, s, p):
        return (m[:, :, None] * e_mn + s[:, :, None] * e_dn
                + p[:, :, None] * e_up)

    return Cpx(build(main.re, sub.re, sup.re),
               build(main.im, sub.im, sup.im))


def _shift_rows(m: Cpx, d: int) -> Cpx:
    """Shift along the row axis of (B, nx, nx): d=+1 gives M[r-1], zeros in."""
    def sh(p):
        if d == 1:
            return jnp.pad(p[:, :-1, :], ((0, 0), (1, 0), (0, 0)))
        return jnp.pad(p[:, 1:, :], ((0, 0), (0, 1), (0, 0)))
    return Cpx(sh(m.re), sh(m.im))


def _shift_cols(m: Cpx, d: int) -> Cpx:
    def sh(p):
        if d == 1:
            return jnp.pad(p[:, :, :-1], ((0, 0), (0, 0), (1, 0)))
        return jnp.pad(p[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
    return Cpx(sh(m.re), sh(m.im))


def _btri_left(main: Cpx, sub: Cpx, sup: Cpx, m: Cpx) -> Cpx:
    """Batched (tridiag T) @ (dense M): (T M)[r,:] = sub_r M[r-1,:]
    + main_r M[r,:] + sup_r M[r+1,:]."""
    mn = Cpx(main.re[:, :, None], main.im[:, :, None])
    sb = Cpx(sub.re[:, :, None], sub.im[:, :, None])
    sp = Cpx(sup.re[:, :, None], sup.im[:, :, None])
    return (cpx.mul(mn, m) + cpx.mul(sb, _shift_rows(m, 1))
            + cpx.mul(sp, _shift_rows(m, -1)))


def _btri_right(m: Cpx, main: Cpx, sub: Cpx, sup: Cpx) -> Cpx:
    """Batched (dense M) @ (tridiag T): (M T)[:,c] = M[:,c] main_c
    + M[:,c+1] sub_{c+1} + M[:,c-1] sup_{c-1}."""
    mn = Cpx(main.re[:, None, :], main.im[:, None, :])
    sb_sh = Cpx(jnp.pad(sub.re[:, 1:], ((0, 0), (0, 1)))[:, None, :],
                jnp.pad(sub.im[:, 1:], ((0, 0), (0, 1)))[:, None, :])
    sp_sh = Cpx(jnp.pad(sup.re[:, :-1], ((0, 0), (1, 0)))[:, None, :],
                jnp.pad(sup.im[:, :-1], ((0, 0), (1, 0)))[:, None, :])
    m_right = Cpx(jnp.pad(m.re[:, :, 1:], ((0, 0), (0, 0), (0, 1))),
                  jnp.pad(m.im[:, :, 1:], ((0, 0), (0, 0), (0, 1))))
    m_left = Cpx(jnp.pad(m.re[:, :, :-1], ((0, 0), (0, 0), (1, 0))),
                 jnp.pad(m.im[:, :, :-1], ((0, 0), (0, 0), (1, 0))))
    return cpx.mul(m, mn) + cpx.mul(m_right, sb_sh) + cpx.mul(m_left, sp_sh)


def _bmm(a: Cpx, b: Cpx) -> Cpx:
    return cpx.einsum("bij,bjk->bik", a, b)


def _pad_tail(m: Cpx, count: int) -> Cpx:
    """Append ``count`` zero blocks along the batch axis."""
    if count == 0:
        return m
    pad = ((0, count),) + ((0, 0),) * (m.re.ndim - 1)
    return Cpx(jnp.pad(m.re, pad), jnp.pad(m.im, pad))


def _pad_head(m: Cpx, count: int) -> Cpx:
    if count == 0:
        return m
    pad = ((count, 0),) + ((0, 0),) * (m.re.ndim - 1)
    return Cpx(jnp.pad(m.re, pad), jnp.pad(m.im, pad))


# -- factorization -------------------------------------------------------------

def _reduce_level(d: Cpx, l: Cpx, u: Cpx, block: int):
    """One dense reduction level: eliminate odd rows of the (m, nx, nx)
    block-tridiagonal system (l[0] and u[-1] are zero blocks by convention).

    Returns (level, d_new, l_new, u_new) with the new system over the
    m - m//2 even rows.
    """
    m = d.re.shape[0]
    n_odd = m // 2
    n_even = m - n_odd

    d_odd = d[1::2]
    l_odd, u_odd = l[1::2], u[1::2]
    d_even = d[0::2]
    l_even, u_even = l[0::2], u[0::2]

    dinv = batched_inv(d_odd, block=block)

    # Dinv of the odd neighbor to the LEFT of even row t (odd index t-1)
    # and to the RIGHT (odd index t); zero blocks where unpaired.
    dinv_left = _pad_head(dinv, 1)[:n_even]
    dinv_right = _pad_tail(dinv, n_even - n_odd)[:n_even]

    lt = _bmm(l_even, dinv_left)
    ut = _bmm(u_even, dinv_right)
    dl = _bmm(dinv, l_odd)
    du = _bmm(dinv, u_odd)

    u_odd_left = _pad_head(u_odd, 1)[:n_even]
    l_odd_right = _pad_tail(l_odd, n_even - n_odd)[:n_even]
    l_odd_left = _pad_head(l_odd, 1)[:n_even]
    u_odd_right = _pad_tail(u_odd, n_even - n_odd)[:n_even]

    d_new = d_even - _bmm(lt, u_odd_left) - _bmm(ut, l_odd_right)
    l_new = -_bmm(lt, l_odd_left)
    u_new = -_bmm(ut, u_odd_right)

    return CRLevel(dinv, lt, ut, dl, du), d_new, l_new, u_new


def _reduce_level0(coeffs: Cpx, block: int):
    """Level 0, exploiting the tridiagonal D/L/U blocks: every product is a
    banded row/column combination (no dense matmuls)."""
    c = coeffs
    ny = c.re.shape[1]
    n_odd = ny // 2
    n_even = ny - n_odd

    # Tridiagonal coefficient vectors per block row (see split_engine):
    # D: (c0, c1, c2), L: (c3, c5, c6), U: (c4, c7, c8). L[0] / U[-1] are
    # structurally absent — enforced by zeroing those vectors.
    def vecs(slot_m, slot_s, slot_p, rows):
        return (c[slot_m, rows], c[slot_s, rows], c[slot_p, rows])

    odd = slice(1, None, 2)
    even = slice(0, None, 2)

    d_odd = _btri_dense(*vecs(0, 1, 2, odd))
    dinv = batched_inv(d_odd, block=block)

    lo_m, lo_s, lo_p = vecs(3, 5, 6, odd)
    uo_m, uo_s, uo_p = vecs(4, 7, 8, odd)
    le_m, le_s, le_p = vecs(3, 5, 6, even)
    ue_m, ue_s, ue_p = vecs(4, 7, 8, even)

    def zero_first(t):
        m, s, p = t
        z = jnp.zeros((1,) + m.re.shape[1:], jnp.float32)
        blank = lambda v: Cpx(jnp.concatenate([z, v.re[1:]]),
                              jnp.concatenate([z, v.im[1:]]))
        return blank(m), blank(s), blank(p)

    def zero_last_if(t, cond):
        if not cond:
            return t
        m, s, p = t
        z = jnp.zeros((1,) + m.re.shape[1:], jnp.float32)
        blank = lambda v: Cpx(jnp.concatenate([v.re[:-1], z]),
                              jnp.concatenate([v.im[:-1], z]))
        return blank(m), blank(s), blank(p)

    # l[0] = 0 (first block row has no left neighbor); u at the last row
    # is 0. The last row is even iff ny is odd.
    le_m, le_s, le_p = zero_first((le_m, le_s, le_p))
    if ny % 2 == 1:
        ue_m, ue_s, ue_p = zero_last_if((ue_m, ue_s, ue_p), True)
    else:
        uo_m, uo_s, uo_p = zero_last_if((uo_m, uo_s, uo_p), True)

    dinv_left = _pad_head(dinv, 1)[:n_even]
    dinv_right = _pad_tail(dinv, n_even - n_odd)[:n_even]

    # Lt = L_even @ Dinv_left (tridiag x dense), Ut likewise.
    lt = _btri_left(le_m, le_s, le_p, dinv_left)
    ut = _btri_left(ue_m, ue_s, ue_p, dinv_right)
    # DL = Dinv @ L_odd (dense x tridiag), DU likewise.
    dl = _btri_right(dinv, lo_m, lo_s, lo_p)
    du = _btri_right(dinv, uo_m, uo_s, uo_p)

    def shift_vec_head(t):
        m, s, p = t
        sh = lambda v: Cpx(jnp.pad(v.re, ((1, 0), (0, 0)))[:n_even],
                           jnp.pad(v.im, ((1, 0), (0, 0)))[:n_even])
        return sh(m), sh(s), sh(p)

    def shift_vec_tail(t):
        m, s, p = t
        k = n_even - n_odd
        sh = lambda v: Cpx(jnp.pad(v.re, ((0, k), (0, 0)))[:n_even],
                           jnp.pad(v.im, ((0, k), (0, 0)))[:n_even])
        return sh(m), sh(s), sh(p)

    uol = shift_vec_head((uo_m, uo_s, uo_p))   # U of odd-left neighbor
    lor = shift_vec_tail((lo_m, lo_s, lo_p))   # L of odd-right neighbor
    lol = shift_vec_head((lo_m, lo_s, lo_p))
    uor = shift_vec_tail((uo_m, uo_s, uo_p))

    d_even = _btri_dense(*vecs(0, 1, 2, even))
    d_new = (d_even - _btri_right(lt, *uol) - _btri_right(ut, *lor))
    l_new = -_btri_right(lt, *lol)
    u_new = -_btri_right(ut, *uor)

    return CRLevel(dinv, lt, ut, dl, du), d_new, l_new, u_new


def cr_factor_cpx(coeffs: Cpx, block: int = 64) -> CRFactor:
    """Cyclic-reduction factorization from the 9 coefficient planes."""
    ny = coeffs.re.shape[1]
    levels = []
    if ny == 1:
        d = _btri_dense(coeffs[0], coeffs[1], coeffs[2])
        return CRFactor(levels=(), dinv_root=batched_inv(d, block=block),
                        coeffs=coeffs)

    level, d, l, u = _reduce_level0(coeffs, block)
    levels.append(level)
    while d.re.shape[0] > 1:
        level, d, l, u = _reduce_level(d, l, u, block)
        levels.append(level)
    return CRFactor(levels=tuple(levels), dinv_root=batched_inv(d, block=block),
                    coeffs=coeffs)


# -- solve ---------------------------------------------------------------------

def _gemv(mats: Cpx, v: Cpx, adjoint: bool) -> Cpx:
    """(B, nx, nx) blocks applied to (B, R, nx) row-vectors."""
    if adjoint:
        return cpx.einsum("bji,brj->bri", mats.conj(), v)
    return cpx.einsum("bij,brj->bri", mats, v)


def _shift_batch(v: Cpx, d: int, out_len: int) -> Cpx:
    """Shift (B, R, nx) along batch: d=+1 -> v[t-1] (zero at t=0);
    d=0 -> v[t] zero-padded/cropped to out_len."""
    if d == 1:
        m = _pad_head(v, 1)
    else:
        m = v
    return Cpx(jnp.pad(m.re, ((0, max(0, out_len - m.re.shape[0])),
                              (0, 0), (0, 0)))[:out_len],
               jnp.pad(m.im, ((0, max(0, out_len - m.re.shape[0])),
                              (0, 0), (0, 0)))[:out_len])


def cr_solve_cpx(factor: CRFactor, b: Cpx, adjoint: bool = False) -> Cpx:
    """Solve H x = b (or H^H x = b) with a cyclic-reduction factor.

    b: (batch, ny, nx) Cpx, matching banded_solve_cpx's interface.
    """
    bt = cpx.apply_parts(lambda p: jnp.moveaxis(p, 1, 0), b)  # (ny, R, nx)

    # Down: reduce through the levels, stashing each level's odd RHS.
    odd_rhs = []
    cur = bt
    for lev in factor.levels:
        b_odd = cur[1::2]
        b_even = cur[0::2]
        n_even = b_even.re.shape[0]
        odd_rhs.append(b_odd)
        if not adjoint:
            left = _gemv(lev.lt, _shift_batch(b_odd, 1, n_even), False)
            right = _gemv(lev.ut, _shift_batch(b_odd, 0, n_even), False)
        else:
            # adjoint down uses (DU_left)^H and (DL_right)^H
            du_l = _pad_head(lev.du, 1)[:n_even]
            dl_r = _pad_tail(lev.dl, n_even - lev.dl.re.shape[0])[:n_even]
            left = _gemv(du_l, _shift_batch(b_odd, 1, n_even), True)
            right = _gemv(dl_r, _shift_batch(b_odd, 0, n_even), True)
        cur = b_even - left - right

    # Root solve.
    u = _gemv(factor.dinv_root, cur, adjoint)

    # Up: back-substitute the odd rows at each level, innermost first.
    for lev, b_odd in zip(reversed(factor.levels), reversed(odd_rhs)):
        u_even = u
        n_odd = b_odd.re.shape[0]
        u_left = u_even[:n_odd]                      # even row 2t
        u_right = _shift_batch(u_even[1:], 0, n_odd)  # even row 2t+2 (or 0)
        if not adjoint:
            u_odd = (_gemv(lev.dinv, b_odd, False)
                     - _gemv(lev.dl, u_left, False)
                     - _gemv(lev.du, u_right, False))
        else:
            lt_next = _pad_tail(lev.lt[1:], 1)[:n_odd]
            u_odd = (_gemv(lev.dinv, b_odd, True)
                     - _gemv(lev.ut[:n_odd], u_left, True)
                     - _gemv(lt_next, u_right, True))
        # interleave even/odd back to this level's row count
        m = n_odd + u_even.re.shape[0]
        def inter(pe, po):
            out = jnp.zeros((m,) + pe.shape[1:], pe.dtype)
            return out.at[0::2].set(pe).at[1::2].set(po)
        u = Cpx(inter(u_even.re, u_odd.re), inter(u_even.im, u_odd.im))

    return cpx.apply_parts(lambda p: jnp.moveaxis(p, 0, 1), u)
