"""Fused Pallas TPU kernels: twisted (two-sided) factorization and sweeps.

TPU form of :mod:`.twisted`. The block-Thomas kernels
(:mod:`.pallas_factor` / :mod:`.pallas_sweep`) run ONE serial chain of ny
grid steps; their per-step cost on the targeted runtime is dominated by
fixed per-step latency (grid sequencing, DMA waits, dependent-issue
bubbles), not by the one gemv / one Schur inverse of actual work — which is
exactly the regime where the twisted elimination pays: both independent
half-chains run in the SAME grid step (two rows per step), so the kernels
do identical total work in half the steps.

Layout: the factor writes the two chains into separate block-indexed
outputs rather than the row-ordered (ny, nx, nx) array, so neither the
factor nor the sweeps pay a reorder copy:

    g_down[i] = G_i                 (downward Schur inverses, i < m)
    g_down[nsteps] = G_m            (the twisted middle inverse)
    g_up[i]   = B_{ny-1-i}          (upward inverses, i < ny-1-m)

with nsteps = max(m, ny-1-m) and everything padded to nxp (identity tail,
as pallas_factor). The sweep kernels consume this layout directly via
block index maps.

Validated against the XLA twisted oracle in tests/test_twisted.py
(interpret mode); adoption decision + measurements in PERF_NOTES round 4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cpx import Cpx
from .pallas_factor import (_BK, _cmul, _gj_invert_block, _shift_cols_left,
                            _shift_cols_right, _shift_rows_down,
                            _shift_rows_up, _vshift_left, _vshift_right)
from .pallas_sweep import _gemv, _gemv_h, _plane, _tri, _tri_h
from .twisted import TwistedFactorCpx, middle_row

_HI = jax.lax.Precision.HIGHEST


def _n_steps(ny: int, m: int) -> int:
    return max(m, ny - 1 - m)


# ---------------------------------------------------------------------------
# Factor kernel
# ---------------------------------------------------------------------------

def _tri_dense_parts(nxp, d_m_re, d_m_im, d_s_re, d_s_im, d_p_re, d_p_im):
    """Materialize tri(D) from (1, nxp) plane vectors (cf. _factor_kernel)."""
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (nxp, nxp), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (nxp, nxp), 1)
    on_diag = iota_r == iota_c
    on_sub = iota_c == iota_r - 1
    on_sup = iota_c == iota_r + 1
    dmc_re = jnp.broadcast_to(d_m_re, (nxp, nxp))
    dmc_im = jnp.broadcast_to(d_m_im, (nxp, nxp))
    dsr_re = jnp.broadcast_to(d_s_re.reshape(nxp, 1), (nxp, nxp))
    dsr_im = jnp.broadcast_to(d_s_im.reshape(nxp, 1), (nxp, nxp))
    dpr_re = jnp.broadcast_to(d_p_re.reshape(nxp, 1), (nxp, nxp))
    dpr_im = jnp.broadcast_to(d_p_im.reshape(nxp, 1), (nxp, nxp))
    t_re = jnp.where(on_diag, dmc_re,
                     jnp.where(on_sub, dsr_re,
                               jnp.where(on_sup, dpr_re, 0.0)))
    t_im = jnp.where(on_diag, dmc_im,
                     jnp.where(on_sub, dsr_im,
                               jnp.where(on_sup, dpr_im, 0.0)))
    return t_re, t_im


def _outer_inner_product(nxp, gp_re, gp_im,
                         i_m_re, i_m_im, i_s_re, i_s_im, i_p_re, i_p_im,
                         o_m_re, o_m_im, o_s_re, o_s_im, o_p_re, o_p_im):
    """tri(O) @ (G @ tri(I)) for (1, nxp) plane vectors — the Schur update
    of either chain (top: O = L_y, I = U_{y-1}; bottom: O = U_y,
    I = L_{y+1}). Same VPU column/row combines as _factor_kernel."""
    # G @ tri(I): column combination
    t1_re, t1_im = _cmul(gp_re, gp_im, i_m_re, i_m_im)
    grr, gri = _shift_cols_left(gp_re), _shift_cols_left(gp_im)
    sbr, sbi = _vshift_left(i_s_re), _vshift_left(i_s_im)
    t2_re, t2_im = _cmul(grr, gri, sbr, sbi)
    glr, gli = _shift_cols_right(gp_re), _shift_cols_right(gp_im)
    spr, spi = _vshift_right(i_p_re), _vshift_right(i_p_im)
    t3_re, t3_im = _cmul(glr, gli, spr, spi)
    gi_re = t1_re + t2_re + t3_re
    gi_im = t1_im + t2_im + t3_im
    # tri(O) @ (.): row combination
    om_re, om_im = o_m_re.reshape(nxp, 1), o_m_im.reshape(nxp, 1)
    os_re, os_im = o_s_re.reshape(nxp, 1), o_s_im.reshape(nxp, 1)
    op_re, op_im = o_p_re.reshape(nxp, 1), o_p_im.reshape(nxp, 1)
    a1_re, a1_im = _cmul(om_re, om_im, gi_re, gi_im)
    mu_re, mu_im = _shift_rows_down(gi_re), _shift_rows_down(gi_im)
    a2_re, a2_im = _cmul(os_re, os_im, mu_re, mu_im)
    md_re, md_im = _shift_rows_up(gi_re), _shift_rows_up(gi_im)
    a3_re, a3_im = _cmul(op_re, op_im, md_re, md_im)
    return a1_re + a2_re + a3_re, a1_im + a2_im + a3_im


def _tfactor_kernel(nxp: int, bk: int, m: int, nbot: int, nsteps: int,
                    panel_precision,
                    tc_re_ref, tc_im_ref, tp_re_ref, tp_im_ref,
                    bc_re_ref, bc_im_ref, bn_re_ref, bn_im_ref,
                    ga_re_ref, ga_im_ref, gb_re_ref, gb_im_ref,
                    gpt_re_ref, gpt_im_ref, gpb_re_ref, gpb_im_ref, pv_ref):
    """One grid step advances BOTH elimination chains one row; the final
    step builds the twisted middle. Plane blocks (clamped index maps set by
    the wrapper): tc = top row's D/L planes (row m at the middle step),
    tp = previous row's U planes (row m-1 at the middle), bc = bottom row's
    D/U planes (row m at the middle), bn = next row's L planes (row m+1 at
    the middle)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        gpt_re_ref[:] = jnp.zeros((nxp, nxp), jnp.float32)
        gpt_im_ref[:] = jnp.zeros((nxp, nxp), jnp.float32)
        gpb_re_ref[:] = jnp.zeros((nxp, nxp), jnp.float32)
        gpb_im_ref[:] = jnp.zeros((nxp, nxp), jnp.float32)

    # Top-chain Schur update: LGU = tri(L_i) @ (G_{i-1} @ tri(U_{i-1})).
    lgu_re, lgu_im = _outer_inner_product(
        nxp, gpt_re_ref[:], gpt_im_ref[:],
        _plane(tp_re_ref, 4, nxp), _plane(tp_im_ref, 4, nxp),
        _plane(tp_re_ref, 7, nxp), _plane(tp_im_ref, 7, nxp),
        _plane(tp_re_ref, 8, nxp), _plane(tp_im_ref, 8, nxp),
        _plane(tc_re_ref, 3, nxp), _plane(tc_im_ref, 3, nxp),
        _plane(tc_re_ref, 5, nxp), _plane(tc_im_ref, 5, nxp),
        _plane(tc_re_ref, 6, nxp), _plane(tc_im_ref, 6, nxp))
    td_re, td_im = _tri_dense_parts(
        nxp, _plane(tc_re_ref, 0, nxp), _plane(tc_im_ref, 0, nxp),
        _plane(tc_re_ref, 1, nxp), _plane(tc_im_ref, 1, nxp),
        _plane(tc_re_ref, 2, nxp), _plane(tc_im_ref, 2, nxp))
    st_re = td_re - lgu_re
    st_im = td_im - lgu_im

    # Bottom-chain Schur update: UGL = tri(U_y) @ (B_{y+1} @ tri(L_{y+1})).
    ugl_re, ugl_im = _outer_inner_product(
        nxp, gpb_re_ref[:], gpb_im_ref[:],
        _plane(bn_re_ref, 3, nxp), _plane(bn_im_ref, 3, nxp),
        _plane(bn_re_ref, 5, nxp), _plane(bn_im_ref, 5, nxp),
        _plane(bn_re_ref, 6, nxp), _plane(bn_im_ref, 6, nxp),
        _plane(bc_re_ref, 4, nxp), _plane(bc_im_ref, 4, nxp),
        _plane(bc_re_ref, 7, nxp), _plane(bc_im_ref, 7, nxp),
        _plane(bc_re_ref, 8, nxp), _plane(bc_im_ref, 8, nxp))

    @pl.when(i < m)
    def _():
        ga_re_ref[0] = st_re
        ga_im_ref[0] = st_im
        _gj_invert_block(ga_re_ref, ga_im_ref, pv_ref, nxp, bk, False,
                         panel_precision)
        gpt_re_ref[:] = ga_re_ref[0]
        gpt_im_ref[:] = ga_im_ref[0]

    @pl.when(i < nbot)
    def _():
        bd_re, bd_im = _tri_dense_parts(
            nxp, _plane(bc_re_ref, 0, nxp), _plane(bc_im_ref, 0, nxp),
            _plane(bc_re_ref, 1, nxp), _plane(bc_im_ref, 1, nxp),
            _plane(bc_re_ref, 2, nxp), _plane(bc_im_ref, 2, nxp))
        gb_re_ref[0] = bd_re - ugl_re
        gb_im_ref[0] = bd_im - ugl_im
        _gj_invert_block(gb_re_ref, gb_im_ref, pv_ref, nxp, bk, False,
                         panel_precision)
        gpb_re_ref[:] = gb_re_ref[0]
        gpb_im_ref[:] = gb_im_ref[0]

    @pl.when(i == nsteps)
    def _():
        # Twisted middle: S_m = tri(D_m) - LGU(m) - UGL(m); tc/tp/bc/bn all
        # clamp to rows m / m-1 / m / m+1 here, so st and ugl are exactly
        # the two middle products.
        ga_re_ref[0] = st_re - ugl_re
        ga_im_ref[0] = st_im - ugl_im
        _gj_invert_block(ga_re_ref, ga_im_ref, pv_ref, nxp, bk, False,
                         panel_precision)


@functools.partial(jax.jit, static_argnames=("interpret", "bk", "m",
                                             "panel_precision"))
def _twisted_factor_g(coeffs: Cpx, interpret: bool, bk: int, m: int,
                      panel_precision):
    _, ny, nx = coeffs.re.shape
    nxp = -(-nx // bk) * bk
    nbot = ny - 1 - m
    nsteps = _n_steps(ny, m)

    re, im = coeffs.re, coeffs.im
    if nxp != nx:
        pad = nxp - nx
        re = jnp.pad(re, ((0, 0), (0, 0), (0, pad)))
        im = jnp.pad(im, ((0, 0), (0, 0), (0, pad)))
        tail = (jnp.arange(nxp) >= nx).astype(jnp.float32)
        re = re.at[0].add(tail[None, :])

    re = jnp.moveaxis(re, 0, 1)  # (ny, 9, nxp)
    im = jnp.moveaxis(im, 0, 1)

    def spec(row_map):
        return pl.BlockSpec((1, 9, nxp), row_map, memory_space=pltpu.VMEM)

    tc = spec(lambda i: (jnp.minimum(i, m), 0, 0))
    tp = spec(lambda i: (jnp.clip(i - 1, 0, m - 1), 0, 0))
    bc = spec(lambda i: (jnp.maximum(ny - 1 - i, m), 0, 0))
    bn = spec(lambda i: (jnp.clip(ny - i, m + 1, ny - 1), 0, 0))
    out_spec = pl.BlockSpec((1, nxp, nxp), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    ga_re, ga_im, gb_re, gb_im = pl.pallas_call(
        functools.partial(_tfactor_kernel, nxp, bk, m, nbot, nsteps,
                          panel_precision),
        grid=(nsteps + 1,),
        in_specs=[tc, tc, tp, tp, bc, bc, bn, bn],
        out_specs=[out_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((nsteps + 1, nxp, nxp),
                                        jnp.float32)] * 4,
        scratch_shapes=[pltpu.VMEM((nxp, nxp), jnp.float32)] * 4
        + [pltpu.VMEM((bk, 2 * bk), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(re, im, re, im, re, im, re, im)
    return Cpx(ga_re, ga_im), Cpx(gb_re, gb_im)


def twisted_factor_pallas(coeffs: Cpx, interpret: bool = False,
                          bk: int = _BK, m: int | None = None,
                          panel_precision=_HI) -> TwistedFactorCpx:
    """Twisted factorization by the fused two-chain kernel (drop-in for
    twisted.twisted_factor_cpx; ``g`` stays None — the fused sweeps consume
    the block layout directly)."""
    ny = coeffs.re.shape[1]
    if m is None:
        m = middle_row(ny)
    if not 0 < m < ny - 1:
        raise ValueError(f"middle row {m} out of range for ny={ny}")
    if m > ny - 1 - m:
        # The fused sweeps assume the top chain is the shorter one
        # (nsteps == ny-1-m; see twisted_solve_pallas) — an off-center m
        # past the middle would produce a factor the solver cannot consume.
        raise ValueError(
            f"twisted middle row m={m} must satisfy m <= ny-1-m (ny={ny}); "
            f"use middle_row(ny)={middle_row(ny)} or a smaller m")
    g_down, g_up = _twisted_factor_g(coeffs, interpret, bk, m,
                                     panel_precision)
    return TwistedFactorCpx(g=None, coeffs=coeffs, m=m,
                            g_down=g_down, g_up=g_up)


# ---------------------------------------------------------------------------
# Sweep kernels
# ---------------------------------------------------------------------------

def _in_kernel(nxp: int, m: int, nbot: int, nsteps: int, adjoint: bool,
               precision,
               gt_re_ref, gt_im_ref, gb_re_ref, gb_im_ref,
               pt_re_ref, pt_im_ref, pb_re_ref, pb_im_ref,
               bt_re_ref, bt_im_ref, bb_re_ref, bb_im_ref,
               za_re_ref, za_im_ref, zb_re_ref, zb_im_ref,
               ct_re_ref, ct_im_ref, cb_re_ref, cb_im_ref):
    """Inward elimination, both chains per step. Forward solve:
    z_i = b_i - L_i (G_{i-1} z_{i-1}) (top), t_y = b_y - U_y (B_{y+1}
    t_{y+1}) (bottom, y = ny-1-i); the final step emits the middle
    residual r_m (x_m's RHS, G_m applied by the outward pass's seed).
    Adjoint: same chains on H^H (U^H/L^H roles swapped, G^H gemvs)."""
    i = pl.program_id(0)
    btr, bti = bt_re_ref[0], bt_im_ref[0]
    bbr, bbi = bb_re_ref[0], bb_im_ref[0]

    def top_planes():  # forward: L_i; adjoint: U_{i-1}
        k = (4, 7, 8) if adjoint else (3, 5, 6)
        return [p for kk in k for p in (_plane(pt_re_ref, kk, nxp),
                                        _plane(pt_im_ref, kk, nxp))]

    def bot_planes():  # forward: U_y; adjoint: L_{y+1}
        k = (3, 5, 6) if adjoint else (4, 7, 8)
        return [p for kk in k for p in (_plane(pb_re_ref, kk, nxp),
                                        _plane(pb_im_ref, kk, nxp))]

    gemv = _gemv_h if adjoint else _gemv
    tri = _tri_h if adjoint else _tri

    @pl.when(i == 0)
    def _():
        za_re_ref[0] = btr
        za_im_ref[0] = bti
        ct_re_ref[:] = btr
        ct_im_ref[:] = bti
        zb_re_ref[0] = bbr
        zb_im_ref[0] = bbi
        cb_re_ref[:] = bbr
        cb_im_ref[:] = bbi

    @pl.when((i > 0) & (i < m))
    def _():
        wr, wi = gemv(ct_re_ref[:], ct_im_ref[:],
                      gt_re_ref[0], gt_im_ref[0], precision)
        tr, ti = tri(*top_planes(), wr, wi)
        za_re_ref[0] = btr - tr
        za_im_ref[0] = bti - ti
        ct_re_ref[:] = btr - tr
        ct_im_ref[:] = bti - ti

    @pl.when((i > 0) & (i < nbot))
    def _():
        wr, wi = gemv(cb_re_ref[:], cb_im_ref[:],
                      gb_re_ref[0], gb_im_ref[0], precision)
        tr, ti = tri(*bot_planes(), wr, wi)
        zb_re_ref[0] = bbr - tr
        zb_im_ref[0] = bbi - ti
        cb_re_ref[:] = bbr - tr
        cb_im_ref[:] = bbi - ti

    @pl.when(i == nsteps)
    def _():
        wl_r, wl_i = gemv(ct_re_ref[:], ct_im_ref[:],
                          gt_re_ref[0], gt_im_ref[0], precision)
        tl_r, tl_i = tri(*top_planes(), wl_r, wl_i)
        wu_r, wu_i = gemv(cb_re_ref[:], cb_im_ref[:],
                          gb_re_ref[0], gb_im_ref[0], precision)
        tu_r, tu_i = tri(*bot_planes(), wu_r, wu_i)
        za_re_ref[0] = btr - tl_r - tu_r
        za_im_ref[0] = bti - tl_i - tu_i


def _out_kernel(nxp: int, m: int, nbot: int, nsteps: int, adjoint: bool,
                precision,
                gt_re_ref, gt_im_ref, gb_re_ref, gb_im_ref,
                pt_re_ref, pt_im_ref, pb_re_ref, pb_im_ref,
                za_re_ref, za_im_ref, zb_re_ref, zb_im_ref,
                xt_re_ref, xt_im_ref, xb_re_ref, xb_im_ref,
                ct_re_ref, ct_im_ref, cb_re_ref, cb_im_ref):
    """Outward substitution from the middle, both chains per step.
    Step 0 seeds x_m = G_m r_m; then (forward) x_y = G_y (z_y - U_y
    x_{y+1}) upward and x_y = B_y (t_y - L_y x_{y-1}) downward; adjoint
    swaps the plane roles and conjugate-transposes the gemvs. Idle top
    steps (ny even) rewrite the carried row-0 value — the clamped output
    map would otherwise flush stale VMEM over it."""
    i = pl.program_id(0)
    gemv = _gemv_h if adjoint else _gemv
    tri = _tri_h if adjoint else _tri

    def top_planes():  # forward: U_{m-i}; adjoint: L_{m-i+1}
        k = (3, 5, 6) if adjoint else (4, 7, 8)
        return [p for kk in k for p in (_plane(pt_re_ref, kk, nxp),
                                        _plane(pt_im_ref, kk, nxp))]

    def bot_planes():  # forward: L_{m+i}; adjoint: U_{m+i-1}
        k = (4, 7, 8) if adjoint else (3, 5, 6)
        return [p for kk in k for p in (_plane(pb_re_ref, kk, nxp),
                                        _plane(pb_im_ref, kk, nxp))]

    @pl.when(i == 0)
    def _():
        # Seed: x_m = G_m r_m (gt block = the middle inverse at step 0).
        xr, xi = gemv(za_re_ref[0], za_im_ref[0],
                      gt_re_ref[0], gt_im_ref[0], precision)
        xt_re_ref[0] = xr
        xt_im_ref[0] = xi
        xb_re_ref[0] = xr  # placeholder block, overwritten at step 1
        xb_im_ref[0] = xi
        ct_re_ref[:] = xr
        ct_im_ref[:] = xi
        cb_re_ref[:] = xr
        cb_im_ref[:] = xi

    @pl.when((i > 0) & (i <= m))
    def _():
        tr, ti = tri(*top_planes(), ct_re_ref[:], ct_im_ref[:])
        xr, xi = gemv(za_re_ref[0] - tr, za_im_ref[0] - ti,
                      gt_re_ref[0], gt_im_ref[0], precision)
        xt_re_ref[0] = xr
        xt_im_ref[0] = xi
        ct_re_ref[:] = xr
        ct_im_ref[:] = xi

    @pl.when(i > m)
    def _():
        xt_re_ref[0] = ct_re_ref[:]
        xt_im_ref[0] = ct_im_ref[:]

    @pl.when(i > 0)  # bottom never idles: nbot = nsteps >= m
    def _():
        tr, ti = tri(*bot_planes(), cb_re_ref[:], cb_im_ref[:])
        xr, xi = gemv(zb_re_ref[0] - tr, zb_im_ref[0] - ti,
                      gb_re_ref[0], gb_im_ref[0], precision)
        xb_re_ref[0] = xr
        xb_im_ref[0] = xi
        cb_re_ref[:] = xr
        cb_im_ref[:] = xi


def twisted_solve_pallas(factor: TwistedFactorCpx, b: Cpx,
                         adjoint: bool = False, interpret: bool = False,
                         precision=_HI) -> Cpx:
    """Fused twisted-sweep solve (same contract as twisted_solve_cpx;
    b: (batch, ny, nx)). ``precision`` as pallas_sweep.banded_solve_pallas."""
    coeffs = factor.coeffs
    m = factor.m
    ny, nx = coeffs.re.shape[1], coeffs.re.shape[2]
    batch = b.re.shape[0]
    nxp = factor.g_down.re.shape[-1]
    pad = nxp - nx
    nbot = ny - 1 - m
    nsteps = _n_steps(ny, m)
    assert nsteps == nbot, (ny, m)  # middle_row guarantees m <= ny-1-m

    def padx(a):
        if pad == 0:
            return a
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])

    planes_re = padx(jnp.moveaxis(coeffs.re, 0, 1))   # (ny, 9, nxp)
    planes_im = padx(jnp.moveaxis(coeffs.im, 0, 1))
    b_re = padx(jnp.moveaxis(b.re, 1, 0))             # (ny, batch, nxp)
    b_im = padx(jnp.moveaxis(b.im, 1, 0))

    g_spec = lambda idx: pl.BlockSpec((1, nxp, nxp), idx,
                                      memory_space=pltpu.VMEM)
    p_spec = lambda idx: pl.BlockSpec((1, 9, nxp), idx,
                                      memory_space=pltpu.VMEM)
    v_spec = lambda idx: pl.BlockSpec((1, batch, nxp), idx,
                                      memory_space=pltpu.VMEM)

    # ---- pass 1: inward elimination --------------------------------------
    gt1 = g_spec(lambda i: (jnp.clip(i - 1, 0, m - 1), 0, 0))
    gb1 = g_spec(lambda i: (jnp.clip(i - 1, 0, nbot - 1), 0, 0))
    if adjoint:
        pt1 = p_spec(lambda i: (jnp.clip(i - 1, 0, m - 1), 0, 0))
        pb1 = p_spec(lambda i: (jnp.clip(ny - i, m + 1, ny - 1), 0, 0))
    else:
        pt1 = p_spec(lambda i: (jnp.minimum(i, m), 0, 0))
        pb1 = p_spec(lambda i: (jnp.maximum(ny - 1 - i, m), 0, 0))
    bt1 = v_spec(lambda i: (jnp.minimum(i, m), 0, 0))
    bb1 = v_spec(lambda i: (jnp.maximum(ny - 1 - i, m), 0, 0))
    row_out = v_spec(lambda i: (i, 0, 0))

    kern1 = functools.partial(_in_kernel, nxp, m, nbot, nsteps, adjoint,
                              precision)
    za_re, za_im, zb_re, zb_im = pl.pallas_call(
        kern1,
        grid=(nsteps + 1,),
        in_specs=[gt1, gt1, gb1, gb1, pt1, pt1, pb1, pb1,
                  bt1, bt1, bb1, bb1],
        out_specs=[row_out] * 4,
        out_shape=[jax.ShapeDtypeStruct((nsteps + 1, batch, nxp),
                                        jnp.float32)] * 4,
        scratch_shapes=[pltpu.VMEM((batch, nxp), jnp.float32)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(factor.g_down.re, factor.g_down.im, factor.g_up.re, factor.g_up.im,
      planes_re, planes_im, planes_re, planes_im, b_re, b_im, b_re, b_im)

    # ---- pass 2: outward substitution ------------------------------------
    gt2 = g_spec(lambda i: (jnp.where(i == 0, nsteps,
                                      jnp.clip(m - i, 0, m - 1)), 0, 0))
    gb2 = g_spec(lambda i: (jnp.clip(nbot - i, 0, nbot - 1), 0, 0))
    if adjoint:
        pt2 = p_spec(lambda i: (jnp.clip(m - i + 1, 1, m), 0, 0))
        pb2 = p_spec(lambda i: (jnp.clip(m + i - 1, m, ny - 2), 0, 0))
    else:
        pt2 = p_spec(lambda i: (jnp.clip(m - i, 0, m), 0, 0))
        pb2 = p_spec(lambda i: (jnp.clip(m + i, m + 1, ny - 1), 0, 0))
    za2 = v_spec(lambda i: (jnp.where(i == 0, nsteps,
                                      jnp.clip(m - i, 0, m - 1)), 0, 0))
    zb2 = v_spec(lambda i: (jnp.clip(nbot - i, 0, nbot - 1), 0, 0))
    xt_out = v_spec(lambda i: (jnp.clip(m - i, 0, m), 0, 0))
    xb_out = v_spec(lambda i: (jnp.clip(i - 1, 0, nbot - 1), 0, 0))

    kern2 = functools.partial(_out_kernel, nxp, m, nbot, nsteps, adjoint,
                              precision)
    xt_re, xt_im, xb_re, xb_im = pl.pallas_call(
        kern2,
        grid=(nsteps + 1,),
        in_specs=[gt2, gt2, gb2, gb2, pt2, pt2, pb2, pb2,
                  za2, za2, zb2, zb2],
        out_specs=[xt_out, xt_out, xb_out, xb_out],
        out_shape=[jax.ShapeDtypeStruct((m + 1, batch, nxp), jnp.float32),
                   jax.ShapeDtypeStruct((m + 1, batch, nxp), jnp.float32),
                   jax.ShapeDtypeStruct((nbot, batch, nxp), jnp.float32),
                   jax.ShapeDtypeStruct((nbot, batch, nxp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((batch, nxp), jnp.float32)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(factor.g_down.re, factor.g_down.im, factor.g_up.re, factor.g_up.im,
      planes_re, planes_im, planes_re, planes_im,
      za_re, za_im, zb_re, zb_im)

    x_re = jnp.concatenate([xt_re, xb_re], axis=0)[..., :nx]
    x_im = jnp.concatenate([xt_im, xb_im], axis=0)[..., :nx]
    return Cpx(jnp.moveaxis(x_re, 0, 1), jnp.moveaxis(x_im, 0, 1))
