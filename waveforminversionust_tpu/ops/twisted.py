"""Twisted (two-sided / "BABE") block-tridiagonal factorization and solve.

Block-Thomas (:mod:`.split_engine`) eliminates the ny-row block-tridiagonal
Helmholtz system strictly downward, so its factorization and each solve
sweep are ONE serial chain of ny dependent steps — the binding constraint
the round-4 MFU table names for the production 2D iteration (the per-step
work is small; the chain length is not). A *twisted* factorization
eliminates from BOTH ends toward a middle row m:

    downward (rows y < m):   S_y = D_y - L_y G_{y-1} U_{y-1},  G_y = S_y^-1
    upward   (rows y > m):   T_y = D_y - U_y B_{y+1} L_{y+1},  B_y = T_y^-1
    middle   (row m):        S_m = D_m - L_m G_{m-1} U_{m-1}
                                       - U_m B_{m+1} L_{m+1},  G_m = S_m^-1

and each solve eliminates inward then substitutes outward:

    inward:   z_y = b_y - L_y G_{y-1} z_{y-1}        (top,   y = 1..m-1)
              t_y = b_y - U_y B_{y+1} t_{y+1}        (bottom, y = ny-2..m+1)
    middle:   x_m = G_m (b_m - L_m G_{m-1} z_{m-1} - U_m B_{m+1} t_{m+1})
    outward:  x_y = G_y (z_y - U_y x_{y+1})          (top,   y = m-1..0)
              x_y = B_y (t_y - L_y x_{y-1})          (bottom, y = m+1..ny-1)

The two half-chains are independent, so the dependent chain length halves
(ny -> ~ny/2) at ZERO extra flops — unlike SPIKE or cyclic reduction there
is no fill-in and no reduced system beyond the single middle combine. The
adjoint system H^H x = b reuses the SAME stored inverses conjugate-
transposed: the downward Schur chain of H^H is S_y^H, the upward chain is
T_y^H, and the twisted middle is S_m^H (derivation in the docstring of
:func:`twisted_solve_cpx`), matching the one-factorization-serves-all-three
-solves contract of the block-Thomas engine (ops/banded.py module docs).

This module is the XLA-level oracle (lax.scan chains, CPU-testable); the
production TPU path runs both chains two-rows-per-grid-step inside fused
Pallas kernels (:mod:`.pallas_twisted`), which is where the halved chain
actually pays (the XLA scans pay the same per-step dispatch floor either
way). Validated against banded_factor_cpx/banded_solve_cpx in
tests/test_twisted.py.

Reference role: same as ops/banded.py — the on-device replacement for the
reference's host SuperLU multi-RHS direct solve (solve_helmholtz.py:85-93;
solveHelmholtz.m:128-137).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import cpx
from .cpx import Cpx
from .split_engine import (_col_op_gu_cpx, _gemv, _gemv_h, _row_op_lm_cpx,
                           _tri_dense_cpx, _tri_matvec_cpx, _tri_matvec_h_cpx)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TwistedFactorCpx:
    """Twisted factorization of the 9-plane block-tridiagonal operator.

    ``g``: (ny, nx, nx) split-complex inverses in row order — rows < m hold
    the downward Schur inverses G_y, row m the twisted middle inverse, rows
    > m the upward inverses B_y. ``m`` is static. The Pallas factor instead
    fills ``g_down``/``g_up`` (g stays None) with the two chains in padded
    block-step order, (nsteps+1, nxp, nxp) each with nsteps = ny-1-m:
    g_down[i] = G_i for i < m and g_down[nsteps] = the twisted middle
    inverse; g_up[i] = B_{ny-1-i} for i < nsteps (see
    pallas_twisted.twisted_factor_pallas) — the fused sweeps consume this
    layout directly, so neither side pays a reorder copy.
    """

    g: Cpx | None
    coeffs: Cpx
    # The twist row is STATIC metadata (it shapes the solve's slices), so a
    # factor passed across a jit boundary keeps it a Python int.
    m: int = dataclasses.field(metadata=dict(static=True))
    g_down: Cpx | None = None
    g_up: Cpx | None = None
    # Block-Thomas compatibility: the solve dispatcher checks these.
    sweeps: None = dataclasses.field(
        default=None, metadata=dict(static=True))
    g_pad: None = dataclasses.field(default=None, metadata=dict(static=True))


def middle_row(ny: int) -> int:
    """Default twist row: balances the two chains (ny=301 -> 150/150)."""
    return (ny - 1) // 2


def _vec(p: Cpx) -> Cpx:
    return Cpx(p.re[None], p.im[None])


def twisted_factor_cpx(coeffs: Cpx, m: int | None = None) -> TwistedFactorCpx:
    """XLA (lax.scan) twisted factorization; cf. banded_factor_cpx."""
    c = coeffs
    ny = c.re.shape[1]
    if m is None:
        m = middle_row(ny)
    if not 0 < m < ny - 1:
        raise ValueError(f"middle row {m} out of range for ny={ny}")

    def down_step(g_prev, row):
        gu = _col_op_gu_cpx(g_prev, row["u_main_prev"], row["u_sub_prev"],
                            row["u_sup_prev"])
        lgu = _row_op_lm_cpx(row["l_main"], row["l_sub"], row["l_sup"], gu)
        s = _tri_dense_cpx(row["d_main"], row["d_sub"], row["d_sup"]) - lgu
        g = cpx.inv(s)
        return g, g

    def up_step(b_next, row):
        # B_y = inv(D_y - U_y B_{y+1} L_{y+1})
        gl = _col_op_gu_cpx(b_next, row["l_main_next"], row["l_sub_next"],
                            row["l_sup_next"])
        ugl = _row_op_lm_cpx(row["u_main"], row["u_sub"], row["u_sup"], gl)
        t = _tri_dense_cpx(row["d_main"], row["d_sub"], row["d_sup"]) - ugl
        b = cpx.inv(t)
        return b, b

    # Downward chain: G_0..G_{m-1}.
    g0 = cpx.inv(_tri_dense_cpx(c[0, 0], c[1, 0], c[2, 0]))
    xs_dn = dict(
        d_main=c[0, 1:m], d_sub=c[1, 1:m], d_sup=c[2, 1:m],
        l_main=c[3, 1:m], l_sub=c[5, 1:m], l_sup=c[6, 1:m],
        u_main_prev=c[4, :m - 1], u_sub_prev=c[7, :m - 1],
        u_sup_prev=c[8, :m - 1],
    )
    g_prev, g_dn = jax.lax.scan(down_step, g0, xs_dn)
    g_top = cpx.concat([_vec(g0), g_dn], 0)  # rows 0..m-1

    # Upward chain: B_{ny-1}..B_{m+1} (reverse scan over rows m+1..ny-2).
    b_last = cpx.inv(_tri_dense_cpx(c[0, ny - 1], c[1, ny - 1], c[2, ny - 1]))
    xs_up = dict(
        d_main=c[0, m + 1:ny - 1], d_sub=c[1, m + 1:ny - 1],
        d_sup=c[2, m + 1:ny - 1],
        u_main=c[4, m + 1:ny - 1], u_sub=c[7, m + 1:ny - 1],
        u_sup=c[8, m + 1:ny - 1],
        l_main_next=c[3, m + 2:], l_sub_next=c[5, m + 2:],
        l_sup_next=c[6, m + 2:],
    )
    b_next, b_up = jax.lax.scan(up_step, b_last, xs_up, reverse=True)
    g_bot = cpx.concat([b_up, _vec(b_last)], 0)  # rows m+1..ny-1

    # Twisted middle: S_m = D_m - L_m G_{m-1} U_{m-1} - U_m B_{m+1} L_{m+1}.
    gu = _col_op_gu_cpx(g_prev, c[4, m - 1], c[7, m - 1], c[8, m - 1])
    lgu = _row_op_lm_cpx(c[3, m], c[5, m], c[6, m], gu)
    bl = _col_op_gu_cpx(b_next, c[3, m + 1], c[5, m + 1], c[6, m + 1])
    ubl = _row_op_lm_cpx(c[4, m], c[7, m], c[8, m], bl)
    s_mid = _tri_dense_cpx(c[0, m], c[1, m], c[2, m]) - lgu - ubl
    g_mid = cpx.inv(s_mid)

    g = cpx.concat([g_top, _vec(g_mid), g_bot], 0)
    return TwistedFactorCpx(g=g, coeffs=coeffs, m=m)


def twisted_solve_cpx(factor: TwistedFactorCpx, b: Cpx,
                      adjoint: bool = False) -> Cpx:
    """Solve H x = b (or H^H x = b) through a twisted factorization.

    Adjoint reuse: H^H is block tridiagonal with sub-blocks U_{y-1}^H,
    diagonals D_y^H and super-blocks L_{y+1}^H; by induction its downward
    Schur complements are S_y^H, its upward ones T_y^H and its twisted
    middle S_m^H — so the stored inverses serve the adjoint solve applied
    conjugate-transposed (``_gemv_h``), with the roles of the L and U
    planes swapped and shifted one row (same structure as the block-Thomas
    adjoint sweeps in split_engine.banded_solve_cpx).

    Args / returns: as banded_solve_cpx — b is (batch, ny, nx).
    """
    c = factor.coeffs
    g = factor.g
    m = factor.m
    ny = c.re.shape[1]
    bt = cpx.apply_parts(lambda p: jnp.moveaxis(p, 1, 0), b)  # (ny, batch, nx)

    if not adjoint:
        # Inward, top: z_y = b_y - L_y (G_{y-1} z_{y-1}), y = 1..m-1.
        def in_top(z_prev, row):
            w = _gemv(row["g_prev"], z_prev)
            z = row["b"] - _tri_matvec_cpx(_vec(row["l_main"]),
                                           _vec(row["l_sub"]),
                                           _vec(row["l_sup"]), w)
            return z, z

        xs = dict(g_prev=g[:m - 1], b=bt[1:m],
                  l_main=c[3, 1:m], l_sub=c[5, 1:m], l_sup=c[6, 1:m])
        z_last, z_rest = jax.lax.scan(in_top, bt[0], xs)
        z = cpx.concat([bt[:1], z_rest], 0)  # rows 0..m-1

        # Inward, bottom: t_y = b_y - U_y (B_{y+1} t_{y+1}), y = ny-2..m+1.
        def in_bot(t_next, row):
            w = _gemv(row["b_next"], t_next)
            t = row["b"] - _tri_matvec_cpx(_vec(row["u_main"]),
                                           _vec(row["u_sub"]),
                                           _vec(row["u_sup"]), w)
            return t, t

        xs = dict(b_next=g[m + 2:], b=bt[m + 1:ny - 1],
                  u_main=c[4, m + 1:ny - 1], u_sub=c[7, m + 1:ny - 1],
                  u_sup=c[8, m + 1:ny - 1])
        t_last, t_rest = jax.lax.scan(in_bot, bt[ny - 1], xs, reverse=True)
        t = cpx.concat([t_rest, bt[ny - 1:]], 0)  # rows m+1..ny-1

        # Middle: x_m = G_m (b_m - L_m G_{m-1} z_{m-1} - U_m B_{m+1} t_{m+1}).
        wl = _gemv(g[m - 1], z_last)
        wu = _gemv(g[m + 1], t_last)
        r_mid = (bt[m]
                 - _tri_matvec_cpx(_vec(c[3, m]), _vec(c[5, m]),
                                   _vec(c[6, m]), wl)
                 - _tri_matvec_cpx(_vec(c[4, m]), _vec(c[7, m]),
                                   _vec(c[8, m]), wu))
        x_mid = _gemv(g[m], r_mid)

        # Outward, top: x_y = G_y (z_y - U_y x_{y+1}), y = m-1..0.
        def out_top(x_next, row):
            rhs = row["z"] - _tri_matvec_cpx(_vec(row["u_main"]),
                                             _vec(row["u_sub"]),
                                             _vec(row["u_sup"]), x_next)
            x = _gemv(row["g"], rhs)
            return x, x

        xs = dict(g=g[:m], z=z,
                  u_main=c[4, :m], u_sub=c[7, :m], u_sup=c[8, :m])
        _, x_top = jax.lax.scan(out_top, x_mid, xs, reverse=True)

        # Outward, bottom: x_y = B_y (t_y - L_y x_{y-1}), y = m+1..ny-1.
        def out_bot(x_prev, row):
            rhs = row["t"] - _tri_matvec_cpx(_vec(row["l_main"]),
                                             _vec(row["l_sub"]),
                                             _vec(row["l_sup"]), x_prev)
            x = _gemv(row["g"], rhs)
            return x, x

        xs = dict(g=g[m + 1:], t=t,
                  l_main=c[3, m + 1:], l_sub=c[5, m + 1:], l_sup=c[6, m + 1:])
        _, x_bot = jax.lax.scan(out_bot, x_mid, xs)

        x = cpx.concat([x_top, _vec(x_mid), x_bot], 0)
    else:
        # H^H x = b with primed blocks L'_y = U_{y-1}^H, D'_y = D_y^H,
        # U'_y = L_{y+1}^H and inverses G'_y = G_y^H, B'_y = B_y^H.
        # Inward, top: z_y = b_y - U_{y-1}^H (G_{y-1}^H z_{y-1}).
        def in_top(z_prev, row):
            w = _gemv_h(row["g_prev"], z_prev)
            z = row["b"] - _tri_matvec_h_cpx(_vec(row["u_main_prev"]),
                                             _vec(row["u_sub_prev"]),
                                             _vec(row["u_sup_prev"]), w)
            return z, z

        xs = dict(g_prev=g[:m - 1], b=bt[1:m],
                  u_main_prev=c[4, :m - 1], u_sub_prev=c[7, :m - 1],
                  u_sup_prev=c[8, :m - 1])
        z_last, z_rest = jax.lax.scan(in_top, bt[0], xs)
        z = cpx.concat([bt[:1], z_rest], 0)

        # Inward, bottom: t_y = b_y - L_{y+1}^H (B_{y+1}^H t_{y+1}).
        def in_bot(t_next, row):
            w = _gemv_h(row["b_next"], t_next)
            t = row["b"] - _tri_matvec_h_cpx(_vec(row["l_main_next"]),
                                             _vec(row["l_sub_next"]),
                                             _vec(row["l_sup_next"]), w)
            return t, t

        xs = dict(b_next=g[m + 2:], b=bt[m + 1:ny - 1],
                  l_main_next=c[3, m + 2:], l_sub_next=c[5, m + 2:],
                  l_sup_next=c[6, m + 2:])
        t_last, t_rest = jax.lax.scan(in_bot, bt[ny - 1], xs, reverse=True)
        t = cpx.concat([t_rest, bt[ny - 1:]], 0)

        # Middle: x_m = G_m^H (b_m - U_{m-1}^H G_{m-1}^H z_{m-1}
        #                          - L_{m+1}^H B_{m+1}^H t_{m+1}).
        wl = _gemv_h(g[m - 1], z_last)
        wu = _gemv_h(g[m + 1], t_last)
        r_mid = (bt[m]
                 - _tri_matvec_h_cpx(_vec(c[4, m - 1]), _vec(c[7, m - 1]),
                                     _vec(c[8, m - 1]), wl)
                 - _tri_matvec_h_cpx(_vec(c[3, m + 1]), _vec(c[5, m + 1]),
                                     _vec(c[6, m + 1]), wu))
        x_mid = _gemv_h(g[m], r_mid)

        # Outward, top: x_y = G_y^H (z_y - L_{y+1}^H x_{y+1}), y = m-1..0.
        def out_top(x_next, row):
            rhs = row["z"] - _tri_matvec_h_cpx(_vec(row["l_main_next"]),
                                               _vec(row["l_sub_next"]),
                                               _vec(row["l_sup_next"]),
                                               x_next)
            x = _gemv_h(row["g"], rhs)
            return x, x

        xs = dict(g=g[:m], z=z,
                  l_main_next=c[3, 1:m + 1], l_sub_next=c[5, 1:m + 1],
                  l_sup_next=c[6, 1:m + 1])
        _, x_top = jax.lax.scan(out_top, x_mid, xs, reverse=True)

        # Outward, bottom: x_y = B_y^H (t_y - U_{y-1}^H x_{y-1}).
        def out_bot(x_prev, row):
            rhs = row["t"] - _tri_matvec_h_cpx(_vec(row["u_main_prev"]),
                                               _vec(row["u_sub_prev"]),
                                               _vec(row["u_sup_prev"]),
                                               x_prev)
            x = _gemv_h(row["g"], rhs)
            return x, x

        xs = dict(g=g[m + 1:], t=t,
                  u_main_prev=c[4, m:ny - 1], u_sub_prev=c[7, m:ny - 1],
                  u_sup_prev=c[8, m:ny - 1])
        _, x_bot = jax.lax.scan(out_bot, x_mid, xs)

        x = cpx.concat([x_top, _vec(x_mid), x_bot], 0)

    return cpx.apply_parts(lambda p: jnp.moveaxis(p, 0, 1), x)
