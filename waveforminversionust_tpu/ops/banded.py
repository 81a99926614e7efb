"""Block-tridiagonal (block-Thomas) direct solver for the 9-point system.

This is the TPU-native replacement for the reference's host-side sparse LU
(reference: solve_helmholtz.py:85-93 SuperLU via pure_callback;
solveHelmholtz.m:128-135 UMFPACK). Row-major ordering makes the 9-point
Helmholtz matrix block-tridiagonal with ny blocks of size nx: within-row
coupling is tridiagonal (C/L/R planes), row-to-row coupling is tridiagonal
(D/DL/DR and U/UL/UR planes). Block LU ("block Thomas") factorizes it in one
``lax.scan`` of nx-by-nx dense ops — MXU-shaped work — and each solve is two
scans of dense (nx,nx) @ (nx,batch) matmuls.

Accuracy: empirically ~1e-6 relative residual in complex64 on the reference's
301x301 / 350 kHz workload (direct-solver grade; validated against scipy
complex128 spsolve). An optional iterative-refinement pass squeezes this
further for tough cases.

Factorization reuse: H = Lambda * Omega with Lambda unit-lower-bidiagonal
(sub-blocks L_y G_{y-1}) and Omega upper-bidiagonal (diag S_y, super U_y),
where G_y = S_y^{-1} are the stored Schur-complement inverses. The adjoint
system H^H x = s factors as Omega^H Lambda^H — the *same* G planes serve the
forward solve, the adjoint solve (reference: solveHelmholtz.m:131-135 H'),
and the FWI line-search solve, so one factorization per FWI iteration covers
all three Helmholtz solves.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class BandedFactor(NamedTuple):
    g: jnp.ndarray       # (ny, nx, nx) Schur-complement inverses S_y^{-1}
    coeffs: jnp.ndarray  # (9, ny, nx) operator coefficient planes


def _shift_x(v, d: int):
    """shift_x(v, d)[..., i] = v[..., i + d], zero padded."""
    if d == 0:
        return v
    pad = [(0, 0)] * (v.ndim - 1)
    if d > 0:
        return jnp.pad(v[..., d:], pad + [(0, d)])
    return jnp.pad(v[..., :d], pad + [(-d, 0)])


def _tri_matvec(main, sub, sup, v):
    """Apply tridiagonal T (T[i,i]=main[i], T[i,i-1]=sub[i], T[i,i+1]=sup[i])."""
    return main * v + sub * _shift_x(v, -1) + sup * _shift_x(v, 1)


def _tri_matvec_h(main, sub, sup, v):
    """Apply T^H for T as in :func:`_tri_matvec` (scatter form)."""
    return (jnp.conj(main) * v + _shift_x(jnp.conj(sub) * v, 1)
            + _shift_x(jnp.conj(sup) * v, -1))


def _tri_dense(main, sub, sup):
    """Materialize the tridiagonal block as a dense (nx, nx) matrix."""
    return (jnp.diag(main) + jnp.diag(sub[1:], -1) + jnp.diag(sup[:-1], 1))


def _col_op_gu(gmat, main, sub, sup):
    """G @ U for tridiagonal U given by plane vectors (column operations).

    (G U)[:, j] = G[:, j] main[j] + G[:, j+1] sub[j+1] + G[:, j-1] sup[j-1].
    """
    g_right = jnp.pad(gmat[:, 1:], ((0, 0), (0, 1)))
    g_left = jnp.pad(gmat[:, :-1], ((0, 0), (1, 0)))
    return (gmat * main[None, :] + g_right * _shift_x(sub, 1)[None, :]
            + g_left * _shift_x(sup, -1)[None, :])


def _row_op_lm(main, sub, sup, m):
    """L @ M for tridiagonal L given by plane vectors (row operations)."""
    m_up = jnp.pad(m[:-1, :], ((1, 0), (0, 0)))     # M[i-1, :]
    m_down = jnp.pad(m[1:, :], ((0, 1), (0, 0)))    # M[i+1, :]
    return main[:, None] * m + sub[:, None] * m_up + sup[:, None] * m_down


def banded_factor(coeffs) -> BandedFactor:
    """Block-Thomas factorization: S_0 = D_0; S_y = D_y - L_y G_{y-1} U_{y-1}.

    Args:
        coeffs: (9, ny, nx) planes in stencil order (c,l,r,d,u,dl,dr,ul,ur).
    """
    c = coeffs
    g0 = jnp.linalg.inv(_tri_dense(c[0, 0], c[1, 0], c[2, 0]))

    xs = dict(
        d_main=c[0, 1:], d_sub=c[1, 1:], d_sup=c[2, 1:],
        l_main=c[3, 1:], l_sub=c[5, 1:], l_sup=c[6, 1:],
        u_main_prev=c[4, :-1], u_sub_prev=c[7, :-1], u_sup_prev=c[8, :-1],
    )

    def step(g_prev, row):
        gu = _col_op_gu(g_prev, row["u_main_prev"], row["u_sub_prev"],
                        row["u_sup_prev"])
        lgu = _row_op_lm(row["l_main"], row["l_sub"], row["l_sup"], gu)
        s = _tri_dense(row["d_main"], row["d_sub"], row["d_sup"]) - lgu
        g = jnp.linalg.inv(s)
        return g, g

    _, g_rest = jax.lax.scan(step, g0, xs)
    g = jnp.concatenate([g0[None], g_rest], axis=0)
    return BandedFactor(g=g, coeffs=coeffs)


def banded_solve(factor: BandedFactor, b, adjoint: bool = False):
    """Solve H x = b (or H^H x = b) using the stored factorization.

    Args:
        factor: from :func:`banded_factor`.
        b: (batch, ny, nx) right-hand sides.
        adjoint: solve the conjugate-transpose system with the same factors.

    Returns:
        x of shape (batch, ny, nx).
    """
    c = factor.coeffs
    g = factor.g
    bt = jnp.moveaxis(jnp.asarray(b, c.dtype), 1, 0)  # (ny, batch, nx)

    if not adjoint:
        # Forward elimination: z_y = b_y - L_y (G_{y-1} z_{y-1}).
        def fwd(z_prev, row):
            w = jnp.einsum("ij,bj->bi", row["g_prev"], z_prev)
            z = row["b"] - _tri_matvec(row["l_main"][None], row["l_sub"][None],
                                       row["l_sup"][None], w)
            return z, z

        xs = dict(g_prev=g[:-1], b=bt[1:],
                  l_main=c[3, 1:], l_sub=c[5, 1:], l_sup=c[6, 1:])
        _, z_rest = jax.lax.scan(fwd, bt[0], xs)
        z = jnp.concatenate([bt[:1], z_rest], axis=0)

        # Back substitution: x_y = G_y (z_y - U_y x_{y+1}).
        x_last = jnp.einsum("ij,bj->bi", g[-1], z[-1])

        def bwd(x_next, row):
            rhs = row["z"] - _tri_matvec(row["u_main"][None], row["u_sub"][None],
                                         row["u_sup"][None], x_next)
            x = jnp.einsum("ij,bj->bi", row["g"], rhs)
            return x, x

        xs = dict(g=g[:-1], z=z[:-1],
                  u_main=c[4, :-1], u_sub=c[7, :-1], u_sup=c[8, :-1])
        _, x_rest = jax.lax.scan(bwd, x_last, xs, reverse=True)
        x = jnp.concatenate([x_rest, x_last[None]], axis=0)
    else:
        # H^H = Omega^H Lambda^H.
        # (1) Omega^H w = b (lower bidiag): w_y = G_y^H (b_y - U_{y-1}^H w_{y-1}).
        def gh_mv(gmat, v):
            return jnp.einsum("ji,bj->bi", jnp.conj(gmat), v)

        w0 = gh_mv(g[0], bt[0])

        def fwd(w_prev, row):
            rhs = row["b"] - _tri_matvec_h(row["u_main_prev"][None],
                                           row["u_sub_prev"][None],
                                           row["u_sup_prev"][None], w_prev)
            w = gh_mv(row["g"], rhs)
            return w, w

        xs = dict(g=g[1:], b=bt[1:],
                  u_main_prev=c[4, :-1], u_sub_prev=c[7, :-1],
                  u_sup_prev=c[8, :-1])
        _, w_rest = jax.lax.scan(fwd, w0, xs)
        w = jnp.concatenate([w0[None], w_rest], axis=0)

        # (2) Lambda^H x = w (upper unit): x_y = w_y - G_y^H L_{y+1}^H x_{y+1}.
        x_last = w[-1]

        def bwd(x_next, row):
            v = _tri_matvec_h(row["l_main_next"][None], row["l_sub_next"][None],
                              row["l_sup_next"][None], x_next)
            x = row["w"] - gh_mv(row["g"], v)
            return x, x

        xs = dict(g=g[:-1], w=w[:-1],
                  l_main_next=c[3, 1:], l_sub_next=c[5, 1:], l_sup_next=c[6, 1:])
        _, x_rest = jax.lax.scan(bwd, x_last, xs, reverse=True)
        x = jnp.concatenate([x_rest, x_last[None]], axis=0)

    return jnp.moveaxis(x, 0, 1)  # (batch, ny, nx)
