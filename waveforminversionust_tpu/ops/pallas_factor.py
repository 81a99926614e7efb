"""Fused Pallas TPU kernel: the whole block-Thomas factorization.

The split-engine factorization (:func:`.split_engine.banded_factor_cpx`) is
an XLA ``lax.scan`` whose per-row body is tiny tridiagonal algebra plus one
(nx, nx) complex inverse. On the targeted runtime every XLA loop iteration
costs ~43-86 us regardless of body size and ``jnp.linalg.inv`` is
latency-bound (~0.3 ms/matrix), so the 301-row factorization floors at
~114 ms (PERF_NOTES.md). This kernel runs the ENTIRE recurrence

    G_0 = inv(tri(D_0));   S_i = tri(D_i) - L_i (G_{i-1} U_{i-1});
    G_i = inv(S_i)

inside one ``pallas_call`` with a sequential grid over rows: the previous
inverse persists in VMEM scratch, the tridiagonal products are VPU
elementwise work, and the inverse is an unpivoted BLOCKED Gauss-Jordan
whose rank-``bk`` panel updates are MXU matmuls (same elimination as
:mod:`.batched_inv`, unbatched). Per-row cost is the actual compute
(~0.1 ms) instead of the XLA dispatch floor.

Numerics: unpivoted, like the rest of the solver stack (see
ops/banded.py); the cancellation-safe pivot-row/column overwrite from
batched_inv is reused verbatim. Validated against banded_factor_cpx in
tests/test_pallas_factor.py (interpret mode on CPU, real mode on TPU).

Replaces the role of the reference's host SuperLU factorization
(solve_helmholtz.py:85-93 / solveHelmholtz.m:128-137) at TPU speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from .cpx import Cpx

# GJ panel width (MXU rank per update). Measured at 301^2 on the real
# chip: bk=16 -> 59 ms, 32 -> 49 ms, 64 -> 41.5 ms, 128 -> 53.5 ms (the
# nxp=384 padding overtakes the fewer-panels gain); 64 is the sweet spot.
_BK = 64
_HI = jax.lax.Precision.HIGHEST


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _dot(a, b, precision=_HI):
    return jnp.dot(a, b, precision=precision,
                   preferred_element_type=jnp.float32)


def _cdot(ar, ai, br, bi, precision=_HI):
    """Complex matmul from real parts (4 MXU dots)."""
    return (_dot(ar, br, precision) - _dot(ai, bi, precision),
            _dot(ar, bi, precision) + _dot(ai, br, precision))


def _shift_cols_left(m):
    """out[:, j] = m[:, j+1], zero-filled tail."""
    z = jnp.zeros((m.shape[0], 1), m.dtype)
    return jnp.concatenate([m[:, 1:], z], axis=1)


def _shift_cols_right(m):
    z = jnp.zeros((m.shape[0], 1), m.dtype)
    return jnp.concatenate([z, m[:, :-1]], axis=1)


def _shift_rows_down(m):
    z = jnp.zeros((1, m.shape[1]), m.dtype)
    return jnp.concatenate([z, m[:-1, :]], axis=0)


def _shift_rows_up(m):
    z = jnp.zeros((1, m.shape[1]), m.dtype)
    return jnp.concatenate([m[1:, :], z], axis=0)


def _vshift_left(v):
    """out[j] = v[j+1] for a (1, n) row vector."""
    z = jnp.zeros((1, 1), v.dtype)
    return jnp.concatenate([v[:, 1:], z], axis=1)


def _vshift_right(v):
    z = jnp.zeros((1, 1), v.dtype)
    return jnp.concatenate([z, v[:, :-1]], axis=1)


def _pivot_gj_ref(pv_ref, bk: int):
    """Scalar Gauss-Jordan inverse of the packed (bk, 2bk) [Re | Im] pivot
    block, in place in a VMEM scratch ref. Same cancellation-safe update as
    pallas_inv._gj_kernel.

    Lane-packed: a lone (bk, bk) f32 array occupies full 128-lane vregs
    anyway (half wasted at bk=64), so re and im ride side by side and each
    op does both components; complex cross-terms use a half-width lane
    roll: with m = [Re|Im], m~ = roll(m, bk) = [Im|Re],
      (a + ib) * m packed = a * m + b * (-sgn * m~),  sgn = [+1...|-1...].
    The ref carry makes the row extraction one dynamic SUBLANE slice read
    (legal in Mosaic; lane slicing is not); columns still need masked
    reductions. Measured at 301^2: 41.5 (value-carried masked) -> 39.3 ms
    whole-kernel — the loop is VPU op-issue-latency-bound (~12 ns/op,
    ~20 ops/step), so layout tricks move it only a few percent
    (PERF_NOTES round 2)."""
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (bk, 2 * bk), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (bk, 2 * bk), 1)
    iota_cr = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * bk), 1)
    sgn = jnp.where(iota_c < bk, 1.0, -1.0).astype(jnp.float32)
    zero = jnp.float32(0.0)

    def swap(x):
        return pltpu.roll(x, bk, 1)

    def step(j, carry):
        m = pv_ref[:]
        is_cre = iota_c == j
        is_cim = iota_c == j + bk
        row = pv_ref[pl.ds(j, 1), :]                   # (1, 2bk)
        col_re = jnp.sum(jnp.where(is_cre, m, zero), 1, keepdims=True)
        col_im = jnp.sum(jnp.where(is_cim, m, zero), 1, keepdims=True)
        piv_re = jnp.sum(jnp.where(iota_cr == j, row, zero))
        piv_im = jnp.sum(jnp.where(iota_cr == j + bk, row, zero))

        den = jnp.maximum(piv_re * piv_re + piv_im * piv_im, 1e-38)
        pr, pi = piv_re / den, -piv_im / den

        s_re = col_re * pr - col_im * pi
        s_im = col_re * pi + col_im * pr
        row_sw = swap(row)
        sr = pr * row + pi * (-sgn * row_sw)
        upd = s_re * row + s_im * (-sgn * row_sw)

        # Patch the (j, j) entries into the small scaled-row vector FIRST
        # (two single-vreg selects), so the full-size writes below need no
        # is_r & is_c* mask combinations (2 ANDs + 2 (bk, 2bk) selects
        # fewer per step; measured on the real chip at 301^2: 33.1 vs
        # 32.7 ms — NEUTRAL, the loop is bound by its serial dependency
        # chain, not op count at this margin; kept for the smaller code).
        sr = jnp.where(iota_cr == j, pr, sr)
        sr = jnp.where(iota_cr == j + bk, pi, sr)

        new = m - upd
        is_r = iota_r == j
        new = jnp.where(is_cre, -jnp.broadcast_to(s_re, (bk, 2 * bk)), new)
        new = jnp.where(is_cim, -jnp.broadcast_to(s_im, (bk, 2 * bk)), new)
        new = jnp.where(is_r, jnp.broadcast_to(sr, (bk, 2 * bk)), new)
        pv_ref[:] = new
        return carry

    jax.lax.fori_loop(0, bk, step, 0)


def _pivot_gj_folded_ref(pv_ref, bk: int):
    """Folded pivot GJ: the cancellation-safe pivot-row/column/diagonal
    overwrites of :func:`_pivot_gj_ref` are algebraically identical to ONE
    rank-1 update with shifted vectors,

        new = m - (col - e_j) (x) ((row + e_j) / piv),

    (check: new[j,j] = piv - (piv-1)(1+1/piv) = 1/piv; new[j,c] = row[c]/piv;
    new[r,j] = -col[r]/piv) — which removes all five masked overwrite
    selects from the 64-step sequential loop whose cost is pure VPU
    op-issue latency (PERF_NOTES round 2: ~23 ms of the 39-41 ms kernel).

    Numerics: the folded identities compute the pivot row/col as
    differences of nearly equal terms when |piv| >> 1 (relative error
    ~eps*|piv|), so the caller must hand in a pivot block pre-scaled to
    O(1) magnitude (see the per-panel max-abs normalization at the call
    site; the planes are row-balanced to ~1/h^2 ~ 1e6, which would
    otherwise lose ~6 digits).

    MEASURED AND REJECTED as the default (real chip, 301^2, interleaved
    A/B, relay RTT 27.7 ms subtracted): safe overwrite form 32.7 ms,
    folded 38.6 ms kernel-only; end-to-end bench 0.0717 vs 0.0652 s/iter.
    The five removed selects are single cheap VPU ops on materialized
    masks, while the fold adds a second (1, 2bk) lane roll, extra mask
    builds, and the per-panel max-abs pre-scaling — a net ~5 op/step LOSS.
    G parity vs the safe form on the real planes: 1.6e-06. Kept as an
    opt-in (folded=True) record of the measurement."""
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (bk, 2 * bk), 1)
    iota_cr = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * bk), 1)
    iota_rc = jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0)
    sgn = jnp.where(iota_c < bk, 1.0, -1.0).astype(jnp.float32)
    zero = jnp.float32(0.0)

    def swap(x):
        return pltpu.roll(x, bk, 1)

    def step(j, carry):
        m = pv_ref[:]
        row = pv_ref[pl.ds(j, 1), :]                   # (1, 2bk)
        is_cre = iota_c == j
        is_cim = iota_c == j + bk
        col_re = jnp.sum(jnp.where(is_cre, m, zero), 1, keepdims=True)
        col_im = jnp.sum(jnp.where(is_cim, m, zero), 1, keepdims=True)
        onehot_r = jnp.where(iota_cr == j, 1.0, zero)  # (1, 2bk), re lane j
        piv_re = jnp.sum(onehot_r * row)
        piv_im = jnp.sum(jnp.where(iota_cr == j + bk, row, zero))

        den = jnp.maximum(piv_re * piv_re + piv_im * piv_im, 1e-38)
        pr, pi = piv_re / den, -piv_im / den

        cp_re = col_re - jnp.where(iota_rc == j, 1.0, zero)  # col - e_j
        rowp = row + onehot_r                                # row + e_j
        rp = pr * rowp + pi * (-sgn * swap(rowp))            # (row+e_j)/piv
        upd = cp_re * rp + col_im * (-sgn * swap(rp))
        pv_ref[:] = m - upd
        return carry

    jax.lax.fori_loop(0, bk, step, 0)


def _gj_invert_block(g_re_ref, g_im_ref, pv_ref, nxp: int, bk: int,
                     folded: bool, panel_precision):
    """In-place blocked Gauss-Jordan inverse of the (nxp, nxp) split-complex
    matrix already stored in ``g_*_ref[0]`` (the output block doubles as the
    working buffer; cf. batched_inv.batched_inv, unbatched). Shared by the
    block-Thomas factor kernel below and the twisted factor kernel
    (ops/pallas_twisted.py), which runs it twice per grid step."""
    rows_col = jax.lax.broadcasted_iota(jnp.int32, (nxp, bk), 0)
    cols_row = jax.lax.broadcasted_iota(jnp.int32, (bk, nxp), 1)
    for k in range(nxp // bk):
        lo = k * bk
        hi = lo + bk
        # pivot block inverse (scalar GJ, ref-carried for cheap row reads).
        # An MXU Newton-Schulz pivot was tried and REJECTED on measurement:
        # interior pivots do converge in 9-15 iterations (cond 4-9), but an
        # in-kernel (64, 64) dot costs ~0.5 us to issue, so ~136 dots per
        # pivot lose 4x to the 14 us scalar GJ (whole kernel 39 -> 101 ms;
        # measured on the real chip; see PERF_NOTES round 2).
        if folded:
            # Pre-scale the pivot block to O(1) so the folded GJ's implicit
            # pivot-row/col differences stay cancellation-free (see
            # _pivot_gj_folded_ref); inv(s M) = inv(M) / s.
            blk_re = g_re_ref[0, lo:hi, lo:hi]
            blk_im = g_im_ref[0, lo:hi, lo:hi]
            s = jnp.maximum(jnp.maximum(jnp.max(jnp.abs(blk_re)),
                                        jnp.max(jnp.abs(blk_im))), 1e-38)
            inv_s = 1.0 / s
            pv_ref[:, :bk] = blk_re * inv_s
            pv_ref[:, bk:] = blk_im * inv_s
            _pivot_gj_folded_ref(pv_ref, bk)
            pinv_re = pv_ref[:, :bk] * inv_s
            pinv_im = pv_ref[:, bk:] * inv_s
        else:
            pv_ref[:, :bk] = g_re_ref[0, lo:hi, lo:hi]
            pv_ref[:, bk:] = g_im_ref[0, lo:hi, lo:hi]
            _pivot_gj_ref(pv_ref, bk)
            pinv_re, pinv_im = pv_ref[:, :bk], pv_ref[:, bk:]

        r_re = g_re_ref[0, lo:hi, :]            # (bk, nxp) pivot rows
        r_im = g_im_ref[0, lo:hi, :]
        c_re = g_re_ref[0, :, lo:hi]            # (nxp, bk) panel columns
        c_im = g_im_ref[0, :, lo:hi]
        in_piv = (rows_col >= lo) & (rows_col < hi)
        cz_re = jnp.where(in_piv, 0.0, c_re)    # pivot rows zeroed
        cz_im = jnp.where(in_piv, 0.0, c_im)

        pp = panel_precision
        rs_re, rs_im = _cdot(pinv_re, pinv_im, r_re, r_im, pp)    # P^-1 R
        cs_re, cs_im = _cdot(cz_re, cz_im, pinv_re, pinv_im, pp)  # C P^-1

        u_re, u_im = _cdot(cz_re, cz_im, rs_re, rs_im, pp)   # rank-bk update
        w_re = g_re_ref[0] - u_re
        w_im = g_im_ref[0] - u_im
        g_re_ref[0] = w_re
        g_im_ref[0] = w_im
        # panel columns (rows outside pivot block): -C P^-1
        g_re_ref[0, :, lo:hi] = -cs_re
        g_im_ref[0, :, lo:hi] = -cs_im
        # pivot rows: P^-1 R off-panel, P^-1 in the panel block (lo is a
        # Python constant, so the padded pivot rows are a static concat)
        row_in_piv = (cols_row >= lo) & (cols_row < hi)

        def embed(p):
            parts = []
            if lo:
                parts.append(jnp.zeros((bk, lo), jnp.float32))
            parts.append(p)
            if nxp - hi:
                parts.append(jnp.zeros((bk, nxp - hi), jnp.float32))
            return jnp.concatenate(parts, axis=1) if len(parts) > 1 else p

        g_re_ref[0, lo:hi, :] = jnp.where(row_in_piv, embed(pinv_re), rs_re)
        g_im_ref[0, lo:hi, :] = jnp.where(row_in_piv, embed(pinv_im), rs_im)


def _factor_kernel(nxp: int, bk: int, folded: bool, panel_precision,
                   cur_re_ref, cur_im_ref, prev_re_ref, prev_im_ref,
                   g_re_ref, g_im_ref,
                   gp_re_ref, gp_im_ref, pv_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        # G_prev enters the i=0 recurrence multiplied by a zero mask via
        # lgu; zero it so uninitialized VMEM (possibly NaN) cannot leak.
        gp_re_ref[:] = jnp.zeros((nxp, nxp), jnp.float32)
        gp_im_ref[:] = jnp.zeros((nxp, nxp), jnp.float32)

    # Plane vectors of this row (shape (1, nxp)): D = (0, 1, 2),
    # L = (3, 5, 6) as (main, sub, sup); previous row's U = (4, 7, 8).
    # Inputs are laid out (ny, 9, nxp) so the block's trailing dims (9, nxp)
    # satisfy the Mosaic tiling rule (second-to-last equals the array dim).
    def row(ref, k):
        return ref[0, k, :].reshape(1, nxp)

    d_m_re, d_m_im = row(cur_re_ref, 0), row(cur_im_ref, 0)
    d_s_re, d_s_im = row(cur_re_ref, 1), row(cur_im_ref, 1)
    d_p_re, d_p_im = row(cur_re_ref, 2), row(cur_im_ref, 2)
    l_m_re, l_m_im = row(cur_re_ref, 3), row(cur_im_ref, 3)
    l_s_re, l_s_im = row(cur_re_ref, 5), row(cur_im_ref, 5)
    l_p_re, l_p_im = row(cur_re_ref, 6), row(cur_im_ref, 6)
    u_m_re, u_m_im = row(prev_re_ref, 4), row(prev_im_ref, 4)
    u_s_re, u_s_im = row(prev_re_ref, 7), row(prev_im_ref, 7)
    u_p_re, u_p_im = row(prev_re_ref, 8), row(prev_im_ref, 8)

    gp_re, gp_im = gp_re_ref[:], gp_im_ref[:]

    # GU = G_prev @ tri(U_prev): column combination
    #   (G U)[:, j] = G[:, j] u_m[j] + G[:, j+1] u_s[j+1] + G[:, j-1] u_p[j-1]
    t1_re, t1_im = _cmul(gp_re, gp_im, u_m_re, u_m_im)
    grr, gri = _shift_cols_left(gp_re), _shift_cols_left(gp_im)
    sbr, sbi = _vshift_left(u_s_re), _vshift_left(u_s_im)
    t2_re, t2_im = _cmul(grr, gri, sbr, sbi)
    glr, gli = _shift_cols_right(gp_re), _shift_cols_right(gp_im)
    spr, spi = _vshift_right(u_p_re), _vshift_right(u_p_im)
    t3_re, t3_im = _cmul(glr, gli, spr, spi)
    gu_re = t1_re + t2_re + t3_re
    gu_im = t1_im + t2_im + t3_im

    # LGU = tri(L) @ GU: row combination
    #   (L M)[r, :] = l_m[r] M[r, :] + l_s[r] M[r-1, :] + l_p[r] M[r+1, :]
    lm_re, lm_im = l_m_re.reshape(nxp, 1), l_m_im.reshape(nxp, 1)
    ls_re, ls_im = l_s_re.reshape(nxp, 1), l_s_im.reshape(nxp, 1)
    lp_re, lp_im = l_p_re.reshape(nxp, 1), l_p_im.reshape(nxp, 1)
    a1_re, a1_im = _cmul(lm_re, lm_im, gu_re, gu_im)
    mu_re, mu_im = _shift_rows_down(gu_re), _shift_rows_down(gu_im)
    a2_re, a2_im = _cmul(ls_re, ls_im, mu_re, mu_im)
    md_re, md_im = _shift_rows_up(gu_re), _shift_rows_up(gu_im)
    a3_re, a3_im = _cmul(lp_re, lp_im, md_re, md_im)
    lgu_re = a1_re + a2_re + a3_re
    lgu_im = a1_im + a2_im + a3_im

    # S = tri(D) - LGU (LGU is exactly zero at i=0: gp was zeroed).
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (nxp, nxp), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (nxp, nxp), 1)
    on_diag = iota_r == iota_c
    on_sub = iota_c == iota_r - 1      # T[r, r-1] = sub[r]
    on_sup = iota_c == iota_r + 1      # T[r, r+1] = sup[r]
    dmc_re = jnp.broadcast_to(d_m_re, (nxp, nxp))      # value d_m[c] at (r,c)
    dmc_im = jnp.broadcast_to(d_m_im, (nxp, nxp))
    dsr_re = jnp.broadcast_to(d_s_re.reshape(nxp, 1), (nxp, nxp))  # d_s[r]
    dsr_im = jnp.broadcast_to(d_s_im.reshape(nxp, 1), (nxp, nxp))
    dpr_re = jnp.broadcast_to(d_p_re.reshape(nxp, 1), (nxp, nxp))
    dpr_im = jnp.broadcast_to(d_p_im.reshape(nxp, 1), (nxp, nxp))
    s_re = jnp.where(on_diag, dmc_re,
                     jnp.where(on_sub, dsr_re,
                               jnp.where(on_sup, dpr_re, 0.0))) - lgu_re
    s_im = jnp.where(on_diag, dmc_im,
                     jnp.where(on_sub, dsr_im,
                               jnp.where(on_sup, dpr_im, 0.0))) - lgu_im

    # In-place blocked Gauss-Jordan inverse of S via the shared helper
    # (the output block doubles as the working buffer).
    g_re_ref[0] = s_re
    g_im_ref[0] = s_im
    _gj_invert_block(g_re_ref, g_im_ref, pv_ref, nxp, bk, folded,
                     panel_precision)

    # persist for the next grid step
    gp_re_ref[:] = g_re_ref[0]
    gp_im_ref[:] = g_im_ref[0]


@functools.partial(jax.jit, static_argnames=("interpret", "bk", "folded",
                                             "crop", "panel_precision"))
def factor_g_pallas(coeffs: Cpx, interpret: bool = False,
                    bk: int = _BK, folded: bool = False,
                    crop: bool = True, panel_precision=_HI) -> Cpx:
    """All (ny, nx, nx) Schur-complement inverses G in one fused kernel.

    ``coeffs``: the 9 split-complex coefficient planes (9, ny, nx). The x
    dimension is padded to a multiple of the GJ panel width ``bk`` with
    identity rows (D main plane = 1, all couplings 0), which the
    elimination inverts exactly; the result is cropped back.

    ``crop=False`` skips materializing the cropped (ny, nx, nx) view and
    returns ``(None, g_pad)`` — the memory-safe form for large grids used
    OUTSIDE an enclosing jit (both forms otherwise materialize: ~9 GB at
    801^2 instead of the single padded G's ~4.5 GB; inside one jit XLA
    DCEs the unused form either way). The fused Pallas sweeps consume
    g_pad directly.
    """
    _, ny, nx = coeffs.re.shape
    nxp = -(-nx // bk) * bk

    re, im = coeffs.re, coeffs.im
    if nxp != nx:
        pad = nxp - nx
        re = jnp.pad(re, ((0, 0), (0, 0), (0, pad)))
        im = jnp.pad(im, ((0, 0), (0, 0), (0, pad)))
        # identity closure on the padded tail: D main = 1
        tail = (jnp.arange(nxp) >= nx).astype(jnp.float32)
        re = re.at[0].add(tail[None, :])

    # (9, ny, nxp) -> (ny, 9, nxp): the per-row block (1, 9, nxp) then has
    # trailing dims (9, nxp) == the array dims, which Mosaic accepts.
    re = jnp.moveaxis(re, 0, 1)
    im = jnp.moveaxis(im, 0, 1)
    plane_spec_cur = pl.BlockSpec((1, 9, nxp), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
    plane_spec_prev = pl.BlockSpec(
        (1, 9, nxp), lambda i: (jnp.maximum(i - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, nxp, nxp), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    g_re, g_im = pl.pallas_call(
        functools.partial(_factor_kernel, nxp, bk, folded, panel_precision),
        grid=(ny,),
        in_specs=[plane_spec_cur, plane_spec_cur,
                  plane_spec_prev, plane_spec_prev],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((ny, nxp, nxp), jnp.float32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((nxp, nxp), jnp.float32),
            pltpu.VMEM((nxp, nxp), jnp.float32),
            pltpu.VMEM((bk, 2 * bk), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(re, im, re, im)

    g_pad = Cpx(g_re, g_im)
    if not crop:
        return None, g_pad
    if nxp != nx:
        g_re = g_re[:, :nx, :nx]
        g_im = g_im[:, :nx, :nx]
    return Cpx(g_re, g_im), g_pad


def banded_factor_pallas(coeffs: Cpx, interpret: bool = False,
                         folded: bool = False,
                         keep_cropped: bool | None = None,
                         panel_precision=_HI):
    """Drop-in block-Thomas factor built by the fused kernel (same
    BandedFactorCpx contract as split_engine.banded_factor_cpx). Carries
    the panel-padded G so the fused sweeps skip their re-pad.

    ``keep_cropped``: whether to also materialize the cropped (ny, nx, nx)
    G (needed by the XLA sweeps / SPIKE slab reuse). Default: only on CPU
    backends — off-CPU the fused Pallas sweeps read g_pad, so an
    out-of-jit factor stays at single-G memory (~4.5 GB instead of ~9 GB
    at 801^2; see factor_g_pallas).

    ``panel_precision``: MXU precision of the rank-bk panel updates.
    HIGHEST (default) gives direct-solver-grade factors everywhere.
    DEFAULT (single-pass bf16) pays at LARGE grids where the O(nx^3/row)
    panel matmuls dominate the factor: at 801^2 factor 564 -> 310 ms, and
    with 2 iterative-refinement passes the solve residual matches HIGHEST
    (6.9e-6 vs 1.0e-5) at 422 vs 603 ms total for a 64-RHS solve. At
    301^2 the kernel is op-issue-latency-bound and DEFAULT buys nothing
    (measured and rejected, PERF_NOTES round 3) — hence the config knob
    (SolverConfig.factor_precision) rather than an unconditional switch."""
    from .split_engine import BandedFactorCpx
    if keep_cropped is None:
        keep_cropped = jax.default_backend() == "cpu"
    g, g_pad = factor_g_pallas(coeffs, interpret=interpret, folded=folded,
                               crop=keep_cropped,
                               panel_precision=panel_precision)
    return BandedFactorCpx(g=g, coeffs=coeffs, g_pad=g_pad)
