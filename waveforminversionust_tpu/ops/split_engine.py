"""Split-complex implementations of the core solver path.

Mirrors :mod:`.stencil` / :mod:`.apply` / :mod:`.banded` with all complex
data carried as :class:`~.cpx.Cpx` float32 pairs — the representation the
targeted TPU runtime actually supports (its complex64 lowering covers only a
few compute ops; see :mod:`.cpx`). Every function here is numerically
equivalent to its native-complex counterpart (verified in
tests/test_split_engine.py); the native versions remain the CPU/test oracle.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import PMLConfig, StencilConfig
from ..models.grid import Grid2D
from . import cpx
from .cpx import Cpx
from .stencil import (STENCIL_OFFSETS, boundary_mask, dirichlet_scale,
                      stencil_params)


# ---------------------------------------------------------------------------
# Coefficients (split form of stencil.helmholtz_coefficients)
# ---------------------------------------------------------------------------

def pml_stretch_fields_cpx(grid: Grid2D, f, pml: PMLConfig):
    """Split-complex PML fields (cf. stencil.pml_stretch_fields;
    reference: solve_helmholtz.py:30-60)."""
    xmin, xmax, ymin, ymax = grid.extent
    xe = jnp.linspace(xmin, xmax, 2 * (grid.nx - 1) + 1, dtype=jnp.float32)
    ye = jnp.linspace(ymin, ymax, 2 * (grid.ny - 1) + 1, dtype=jnp.float32)
    Xe, Ye = jnp.meshgrid(xe, ye, indexing="xy")

    xctr, xspan = (xmin + xmax) / 2, (xmax - xmin) / 2
    yctr, yspan = (ymin + ymax) / 2, (ymax - ymin) / 2
    L = pml.l_pml
    sx = 2 * jnp.pi * pml.a0 * f * (jnp.maximum(jnp.abs(Xe - xctr) - xspan + L, 0.0) / L) ** 2
    sy = 2 * jnp.pi * pml.a0 * f * (jnp.maximum(jnp.abs(Ye - yctr) - yspan + L, 0.0) / L) ** 2
    sgn = jnp.sign(jnp.float32(pml.sign_convention))
    ex = Cpx(jnp.ones_like(sx), sx * sgn / (2 * jnp.pi * f))
    ey = Cpx(jnp.ones_like(sy), sy * sgn / (2 * jnp.pi * f))

    A = cpx.div(ey, ex)[::2, 1::2]
    B = cpx.div(ex, ey)[1::2, ::2]
    C = cpx.mul(ex, ey)[::2, ::2]
    return A, B, C


def helmholtz_coefficients_cpx(vel, grid: Grid2D, f,
                               pml: PMLConfig = PMLConfig(),
                               stencil: StencilConfig = StencilConfig(),
                               dirichlet_value: float | None = None,
                               attenuation=None, pml_fields=None) -> Cpx:
    """Split-complex 9 coefficient planes (cf. stencil.helmholtz_coefficients;
    entries follow solveHelmholtz.m:53-126). ``attenuation`` is an optional
    (ny, nx) alpha map [Np/m]: k = omega/c + i*sgn*alpha (see the native
    builder for the convention). ``pml_fields`` = precomputed (A, B, C)
    from :func:`pml_stretch_fields_cpx` (frequency-static; hoist out of
    per-iteration rebuilds)."""
    ny, nx = grid.ny, grid.nx
    h = jnp.float32(grid.h)
    g = jnp.float32(grid.aspect)
    vel = jnp.asarray(vel, jnp.float32)
    kr = 2 * jnp.pi * f / vel

    A, B, C = (pml_fields if pml_fields is not None
               else pml_stretch_fields_cpx(grid, f, pml))
    b, d, e = stencil_params(jnp.min(vel), jnp.max(vel), f, h, g, stencil)
    b = jnp.float32(b)
    d = jnp.asarray(d, jnp.float32)
    e = jnp.asarray(e, jnp.float32)
    g2 = g * g
    h2 = h * h

    def s(arr, ys, xs):
        return jax.lax.slice(arr, (ys, xs), (ys + ny - 2, xs + nx - 2))

    def sc(z: Cpx, ys, xs) -> Cpx:
        return Cpx(s(z.re, ys, xs), s(z.im, ys, xs))

    A_xm, A_xc = sc(A, 1, 0), sc(A, 1, 1)
    A_ym_xm, A_ym_xc = sc(A, 0, 0), sc(A, 0, 1)
    A_yp_xm, A_yp_xc = sc(A, 2, 0), sc(A, 2, 1)
    B_ym, B_yc = sc(B, 0, 1), sc(B, 1, 1)
    B_ym_xm, B_ym_xp = sc(B, 0, 0), sc(B, 0, 2)
    B_yc_xm, B_yc_xp = sc(B, 1, 0), sc(B, 1, 2)

    if attenuation is None:
        Ck2 = cpx.scale(C, kr * kr)
    else:
        sgn = jnp.sign(jnp.float32(pml.sign_convention))
        alpha = jnp.asarray(attenuation, jnp.float32)
        Ck2 = cpx.mul(C, Cpx(kr * kr - alpha * alpha, 2 * sgn * kr * alpha))
    Ck2_c, Ck2_l, Ck2_r = sc(Ck2, 1, 1), sc(Ck2, 1, 0), sc(Ck2, 1, 2)
    Ck2_d, Ck2_u = sc(Ck2, 0, 1), sc(Ck2, 2, 1)
    Ck2_dl, Ck2_dr = sc(Ck2, 0, 0), sc(Ck2, 0, 2)
    Ck2_ul, Ck2_ur = sc(Ck2, 2, 0), sc(Ck2, 2, 2)

    half = (1 - b) / 2

    val_c = cpx.scale(Ck2_c, 1 - d - e) - cpx.scale(
        A_xc + A_xm + cpx.scale(B_yc + B_ym, 1 / g2), b / h2)
    val_l = cpx.scale(cpx.scale(A_xm, b) - cpx.scale(B_yc_xm + B_ym_xm, half / g2), 1 / h2) \
        + cpx.scale(Ck2_l, d / 4)
    val_r = cpx.scale(cpx.scale(A_xc, b) - cpx.scale(B_yc_xp + B_ym_xp, half / g2), 1 / h2) \
        + cpx.scale(Ck2_r, d / 4)
    val_d = cpx.scale(cpx.scale(B_ym, b / g2) - cpx.scale(A_ym_xc + A_ym_xm, half), 1 / h2) \
        + cpx.scale(Ck2_d, d / 4)
    val_u = cpx.scale(cpx.scale(B_yc, b / g2) - cpx.scale(A_yp_xc + A_yp_xm, half), 1 / h2) \
        + cpx.scale(Ck2_u, d / 4)
    if stencil.corner_mode == "jax_port":
        # Reference JAX port's corner gathers incl. their clamped
        # out-of-bounds reads (cf. stencil.helmholtz_coefficients).
        A_ext = Cpx(jnp.concatenate([A.re, A.re[:, -1:]], axis=1),
                    jnp.concatenate([A.im, A.im[:, -1:]], axis=1))
        B_ext = Cpx(jnp.concatenate([B.re, B.re[-1:, :]], axis=0),
                    jnp.concatenate([B.im, B.im[-1:, :]], axis=0))
        A_dr_p, B_dr_p = sc(A_ext, 0, 2), sc(B_ext, 0, 2)
        A_ul_p, B_ul_p = sc(A_ext, 2, 0), sc(B_ext, 2, 0)
        A_ur_p, B_ur_p = sc(A_ext, 2, 2), sc(B_ext, 2, 2)
        val_dl = cpx.scale(A_ym_xm + cpx.scale(B_ym_xm, 1 / g2), half / h2) + cpx.scale(Ck2_dl, e / 4)
        val_dr = cpx.scale(A_dr_p + cpx.scale(B_dr_p, 1 / g2), half / h2) + cpx.scale(Ck2_dr, e / 4)
        val_ul = cpx.scale(A_ul_p + cpx.scale(B_ul_p, 1 / g2), half / h2) + cpx.scale(Ck2_ul, e / 4)
        val_ur = cpx.scale(A_ur_p + cpx.scale(B_ur_p, 1 / g2), half / h2) + cpx.scale(Ck2_ur, e / 4)
    elif stencil.corner_mode == "matlab":
        val_dl = cpx.scale(A_ym_xm + cpx.scale(B_ym_xm, 1 / g2), half / h2) + cpx.scale(Ck2_dl, e / 4)
        val_dr = cpx.scale(A_ym_xc + cpx.scale(B_ym_xp, 1 / g2), half / h2) + cpx.scale(Ck2_dr, e / 4)
        val_ul = cpx.scale(A_yp_xm + cpx.scale(B_yc_xm, 1 / g2), half / h2) + cpx.scale(Ck2_ul, e / 4)
        val_ur = cpx.scale(A_yp_xc + cpx.scale(B_yc_xp, 1 / g2), half / h2) + cpx.scale(Ck2_ur, e / 4)
    else:
        raise ValueError(f"unknown corner_mode {stencil.corner_mode!r}")

    interior = cpx.stack([val_c, val_l, val_r, val_d, val_u,
                          val_dl, val_dr, val_ul, val_ur])

    coeffs = cpx.zeros((9, ny, nx))
    coeffs = Cpx(coeffs.re.at[:, 1:-1, 1:-1].set(interior.re),
                 coeffs.im.at[:, 1:-1, 1:-1].set(interior.im))
    if dirichlet_value is None:
        dirichlet_value = dirichlet_scale(grid)
    border = boundary_mask(grid) * dirichlet_value
    coeffs = Cpx(coeffs.re.at[0].add(border), coeffs.im)
    return coeffs


# ---------------------------------------------------------------------------
# Operator application (split form of apply.h_apply)
# ---------------------------------------------------------------------------

def _shift_parts(u: Cpx, dy: int, dx: int) -> Cpx:
    from .apply import _shift
    return Cpx(_shift(u.re, dy, dx), _shift(u.im, dy, dx))


def h_apply_cpx(coeffs: Cpx, u: Cpx) -> Cpx:
    out = cpx.mul(coeffs[0], u)
    for s in range(1, 9):
        dy, dx = STENCIL_OFFSETS[s]
        out = out + cpx.mul(coeffs[s], _shift_parts(u, dy, dx))
    return out


def h_apply_adjoint_cpx(coeffs: Cpx, u: Cpx) -> Cpx:
    out = cpx.mul(coeffs[0].conj(), u)
    for s in range(1, 9):
        dy, dx = STENCIL_OFFSETS[s]
        out = out + _shift_parts(cpx.mul(coeffs[s].conj(), u), -dy, -dx)
    return out


def h_apply_transpose_cpx(coeffs: Cpx, u: Cpx) -> Cpx:
    out = cpx.mul(coeffs[0], u)
    for s in range(1, 9):
        dy, dx = STENCIL_OFFSETS[s]
        out = out + _shift_parts(cpx.mul(coeffs[s], u), -dy, -dx)
    return out


# ---------------------------------------------------------------------------
# Banded direct solver (split form of banded.banded_factor/banded_solve)
# ---------------------------------------------------------------------------

class SweepOpsCpx(NamedTuple):
    """Precomputed real-embedded sweep operators (see prepare_sweep_ops).

    Each is (ny, 2nx, 2nx) float32: the [[Re, -Im], [Im, Re]] embedding of
    a complex (nx, nx) matrix per grid row, so one complex gemv per scan
    step is ONE real MXU matmul instead of ~a dozen latency-bound ops."""

    ge: jnp.ndarray  # G_i
    me: jnp.ndarray  # M_i = L_i G_{i-1}   (me[0] = 0)
    ne: jnp.ndarray  # N_i = G_i U_i       (ne[-1] = 0)
    ru: jnp.ndarray  # R_i = U_{i-1} G_i   (ru[0] = 0)


class BandedFactorCpx(NamedTuple):
    g: Cpx       # (ny, nx, nx) Schur-complement inverses
    coeffs: Cpx  # (9, ny, nx)
    # Optional precomputed sweep operators (4x the memory of g; enabled for
    # production-sized 2D solves via SolverConfig.fast_sweeps — see
    # prepare_sweep_ops).
    sweeps: SweepOpsCpx | None = None
    # Panel-padded G (ny, nxp, nxp) with an identity tail, as produced by
    # the fused Pallas factorization — lets the fused sweeps skip a
    # ~250 MB/call re-pad (XLA DCEs whichever representation goes unused).
    g_pad: Cpx | None = None


def _shift_x(v, d: int):
    from .banded import _shift_x as _sx
    return _sx(v, d)


def _tri_matvec_cpx(main: Cpx, sub: Cpx, sup: Cpx, v: Cpx) -> Cpx:
    return (cpx.mul(main, v)
            + cpx.mul(sub, cpx.apply_parts(lambda p: _shift_x(p, -1), v))
            + cpx.mul(sup, cpx.apply_parts(lambda p: _shift_x(p, 1), v)))


def _tri_matvec_h_cpx(main: Cpx, sub: Cpx, sup: Cpx, v: Cpx) -> Cpx:
    t1 = cpx.mul(main.conj(), v)
    t2 = cpx.apply_parts(lambda p: _shift_x(p, 1), cpx.mul(sub.conj(), v))
    t3 = cpx.apply_parts(lambda p: _shift_x(p, -1), cpx.mul(sup.conj(), v))
    return t1 + t2 + t3


def _tri_dense_cpx(main: Cpx, sub: Cpx, sup: Cpx) -> Cpx:
    from .banded import _tri_dense
    return Cpx(_tri_dense(main.re, sub.re, sup.re),
               _tri_dense(main.im, sub.im, sup.im))


def _col_op_gu_cpx(g: Cpx, main: Cpx, sub: Cpx, sup: Cpx) -> Cpx:
    """(G U)[:, j] = G[:, j] main[j] + G[:, j+1] sub[j+1] + G[:, j-1] sup[j-1]."""
    g_right = cpx.apply_parts(lambda p: jnp.pad(p[:, 1:], ((0, 0), (0, 1))), g)
    g_left = cpx.apply_parts(lambda p: jnp.pad(p[:, :-1], ((0, 0), (1, 0))), g)
    m = Cpx(main.re[None, :], main.im[None, :])
    sb = cpx.apply_parts(lambda p: _shift_x(p, 1)[None, :], sub)
    sp = cpx.apply_parts(lambda p: _shift_x(p, -1)[None, :], sup)
    return cpx.mul(g, m) + cpx.mul(g_right, sb) + cpx.mul(g_left, sp)


def _row_op_lm_cpx(main: Cpx, sub: Cpx, sup: Cpx, m: Cpx) -> Cpx:
    m_up = cpx.apply_parts(lambda p: jnp.pad(p[:-1, :], ((1, 0), (0, 0))), m)
    m_down = cpx.apply_parts(lambda p: jnp.pad(p[1:, :], ((0, 1), (0, 0))), m)
    mn = Cpx(main.re[:, None], main.im[:, None])
    sb = Cpx(sub.re[:, None], sub.im[:, None])
    sp = Cpx(sup.re[:, None], sup.im[:, None])
    return cpx.mul(mn, m) + cpx.mul(sb, m_up) + cpx.mul(sp, m_down)


def _schulz_refine(g: Cpx, s_mat: Cpx, steps: int):
    """Newton-Schulz iteration X <- X (2I - S X): quadratic convergence to
    S^-1 when ||I - S X0|| < 1. Used with the previous row's inverse as X0
    (the Schur complements converge along y: measured median
    ||I - S_y G_{y-1}|| ~ 0.01 on the reference workload away from the
    boundary rows).

    Returns (g, err2): err2 is mean |I - S X_{k-1}|^2 from the final step's
    own intermediate (no extra matmul); since the residual squares each
    step, the returned iterate's residual is ~err2 — used by the caller to
    fall back to an exact inverse when the warm start was outside the
    convergence basin (e.g. rows where the model changes sharply)."""
    n = g.re.shape[-1]
    eye = jnp.eye(n, dtype=jnp.float32)
    err2 = jnp.float32(jnp.inf)
    for _ in range(steps):
        t = cpx.matmul(s_mat, g)
        t = Cpx(2.0 * eye - t.re, -t.im)
        err2 = jnp.mean((t.re - eye) ** 2 + t.im ** 2)
        g = cpx.matmul(g, t)
    return g, err2


def banded_factor_cpx(coeffs: Cpx, schulz_steps: int = 0,
                      exact_head: int = 12, exact_tail: int = 2,
                      exact_every: int = 16,
                      precompute_sweeps: bool = False) -> BandedFactorCpx:
    """Split-complex block-Thomas factorization (cf. banded.banded_factor).

    ``schulz_steps > 0`` enables the hybrid factorization: most rows compute
    the Schur-complement inverse by warm-started Newton-Schulz (MXU matmuls,
    ~2.5x faster than the LU-based inverse on the targeted runtime) and only
    the boundary-adjacent rows (where the Schur complement changes fast) plus
    every ``exact_every``-th row (error-compounding reset) use the exact
    inverse. Validated against the exact factorization in
    tests/test_split_engine.py.
    """
    c = coeffs
    ny = c.re.shape[1]
    g0 = cpx.inv(_tri_dense_cpx(c[0, 0], c[1, 0], c[2, 0]))

    xs = dict(
        it=jnp.arange(1, ny),
        d_main=c[0, 1:], d_sub=c[1, 1:], d_sup=c[2, 1:],
        l_main=c[3, 1:], l_sub=c[5, 1:], l_sup=c[6, 1:],
        u_main_prev=c[4, :-1], u_sub_prev=c[7, :-1], u_sup_prev=c[8, :-1],
    )

    def step(g_prev, row):
        gu = _col_op_gu_cpx(g_prev, row["u_main_prev"], row["u_sub_prev"],
                            row["u_sup_prev"])
        lgu = _row_op_lm_cpx(row["l_main"], row["l_sub"], row["l_sup"], gu)
        s_mat = _tri_dense_cpx(row["d_main"], row["d_sub"], row["d_sup"]) - lgu
        if schulz_steps <= 0:
            g = cpx.inv(s_mat)
        else:
            it = row["it"]
            g_try, err2 = _schulz_refine(g_prev, s_mat, schulz_steps)
            # Exact inverse for boundary-adjacent rows, periodic resets, and
            # any row whose warm start left the Schulz convergence basin
            # (err2 tracks the iterate's own residual; NaN/inf => diverged).
            use_exact = ((it < exact_head) | (it >= ny - exact_tail)
                         | (it % exact_every == 0)
                         | ~jnp.isfinite(err2) | (err2 > 1e-6))
            g = jax.lax.cond(
                use_exact,
                lambda args: cpx.inv(args[0]),
                lambda args: args[1],
                (s_mat, g_try))
        return g, g

    _, g_rest = jax.lax.scan(step, g0, xs)
    g = cpx.concat([Cpx(g0.re[None], g0.im[None]), g_rest], 0)
    factor = BandedFactorCpx(g=g, coeffs=coeffs)
    if precompute_sweeps:
        factor = factor._replace(sweeps=prepare_sweep_ops(factor))
    return factor


def _embed_real(x: Cpx) -> jnp.ndarray:
    """[[Re, -Im], [Im, Re]] real embedding, (..., n, n) -> (..., 2n, 2n)."""
    top = jnp.concatenate([x.re, -x.im], axis=-1)
    bot = jnp.concatenate([x.im, x.re], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def prepare_sweep_ops(factor: BandedFactorCpx) -> SweepOpsCpx:
    """Precompute the dense per-row sweep operators of the block-Thomas
    solve in real-embedded form.

    Why: the solve sweeps are latency-bound scans — each step of the stock
    path does a banded matvec (~6 elementwise ops) plus a split-complex
    gemv (4 real einsums), ~25 us/step on the targeted runtime. Folding the
    banded factors into dense per-row operators

        forward:  z_i = b_i - M_i z_{i-1};  x_i = (G z)_i - N_i x_{i+1}
        adjoint:  w_i = (G^H b)_i - R_i^H w_{i-1};  x_i = w_i - M_{i+1}^H x_next

    (with the G z / G^H b products hoisted out of the scan as ONE batched
    einsum) leaves a single real MXU matmul per scan step. The embeddings
    satisfy emb(A)^T = emb(A^H), so the adjoint sweeps reuse the same
    arrays with a transposed contraction — no extra memory. Products of a
    tridiagonal with a dense matrix are cheap VPU row/column combines.
    """
    g, c = factor.g, factor.coeffs
    m = jax.vmap(_row_op_lm_cpx)(c[3, 1:], c[5, 1:], c[6, 1:], g[:-1])
    n = jax.vmap(_col_op_gu_cpx)(g[:-1], c[4, :-1], c[7, :-1], c[8, :-1])
    r = jax.vmap(_row_op_lm_cpx)(c[4, :-1], c[7, :-1], c[8, :-1], g[1:])
    z1 = cpx.zeros((1,) + g.re.shape[1:])
    return SweepOpsCpx(
        ge=_embed_real(g),
        me=_embed_real(cpx.concat([z1, m], 0)),
        ne=_embed_real(cpx.concat([n, z1], 0)),
        ru=_embed_real(cpx.concat([z1, r], 0)),
    )


def _stack_vec(v: Cpx) -> jnp.ndarray:
    """(..., nx) Cpx -> (..., 2nx) f32 matching the real embedding."""
    return jnp.concatenate([v.re, v.im], axis=-1)


def _unstack_vec(v: jnp.ndarray) -> Cpx:
    nx = v.shape[-1] // 2
    return Cpx(v[..., :nx], v[..., nx:])


_EMB_PRECISION = jax.lax.Precision.HIGHEST


def _banded_solve_fast_cpx(sweeps: SweepOpsCpx, b: Cpx,
                           adjoint: bool) -> Cpx:
    """Sweep solve with precomputed operators (see prepare_sweep_ops)."""
    bt = _stack_vec(cpx.apply_parts(lambda p: jnp.moveaxis(p, 1, 0), b))
    # (ny, batch, 2nx) real

    def mv(mat, v):  # emb(A) v
        return jnp.einsum("ij,bj->bi", mat, v, precision=_EMB_PRECISION)

    def mvh(mat, v):  # emb(A)^T v = emb(A^H) v
        return jnp.einsum("ji,bj->bi", mat, v, precision=_EMB_PRECISION)

    if not adjoint:
        def fwd(z_prev, row):
            z = row["b"] - mv(row["m"], z_prev)
            return z, z

        _, z_rest = jax.lax.scan(fwd, bt[0], dict(m=sweeps.me[1:], b=bt[1:]))
        z = jnp.concatenate([bt[:1], z_rest], 0)
        gz = jnp.einsum("rij,rbj->rbi", sweeps.ge, z,
                        precision=_EMB_PRECISION)

        def bwd(x_next, row):
            x = row["gz"] - mv(row["n"], x_next)
            return x, x

        _, x_rest = jax.lax.scan(bwd, gz[-1],
                                 dict(n=sweeps.ne[:-1], gz=gz[:-1]),
                                 reverse=True)
        x = jnp.concatenate([x_rest, gz[-1:]], 0)
    else:
        gb = jnp.einsum("rji,rbj->rbi", sweeps.ge, bt,
                        precision=_EMB_PRECISION)

        def fwd(w_prev, row):
            w = row["gb"] - mvh(row["r"], w_prev)
            return w, w

        _, w_rest = jax.lax.scan(fwd, gb[0], dict(r=sweeps.ru[1:],
                                                  gb=gb[1:]))
        w = jnp.concatenate([gb[:1], w_rest], 0)

        def bwd(x_next, row):
            x = row["w"] - mvh(row["m_next"], x_next)
            return x, x

        _, x_rest = jax.lax.scan(bwd, w[-1], dict(m_next=sweeps.me[1:],
                                                  w=w[:-1]), reverse=True)
        x = jnp.concatenate([x_rest, w[-1:]], 0)

    return cpx.apply_parts(lambda p: jnp.moveaxis(p, 0, 1), _unstack_vec(x))


def _gemv(gmat: Cpx, v: Cpx) -> Cpx:
    return cpx.einsum("ij,bj->bi", gmat, v)


def _gemv_h(gmat: Cpx, v: Cpx) -> Cpx:
    return cpx.einsum("ji,bj->bi", gmat.conj(), v)


def banded_solve_cpx(factor: BandedFactorCpx, b: Cpx,
                     adjoint: bool = False) -> Cpx:
    """Split-complex sweeps (cf. banded.banded_solve). Uses the
    precomputed MXU sweep operators when the factor carries them
    (see prepare_sweep_ops)."""
    if factor.sweeps is not None:
        return _banded_solve_fast_cpx(factor.sweeps, b, adjoint)
    c = factor.coeffs
    g = factor.g
    bt = cpx.apply_parts(lambda p: jnp.moveaxis(p, 1, 0), b)  # (ny, batch, nx)

    if not adjoint:
        def fwd(z_prev, row):
            w = _gemv(row["g_prev"], z_prev)
            z = row["b"] - _tri_matvec_cpx(
                Cpx(row["l_main"].re[None], row["l_main"].im[None]),
                Cpx(row["l_sub"].re[None], row["l_sub"].im[None]),
                Cpx(row["l_sup"].re[None], row["l_sup"].im[None]), w)
            return z, z

        xs = dict(g_prev=g[:-1], b=bt[1:],
                  l_main=c[3, 1:], l_sub=c[5, 1:], l_sup=c[6, 1:])
        _, z_rest = jax.lax.scan(fwd, bt[0], xs)
        z = cpx.concat([bt[:1], z_rest], 0)

        x_last = _gemv(g[-1], z[-1])

        def bwd(x_next, row):
            rhs = row["z"] - _tri_matvec_cpx(
                Cpx(row["u_main"].re[None], row["u_main"].im[None]),
                Cpx(row["u_sub"].re[None], row["u_sub"].im[None]),
                Cpx(row["u_sup"].re[None], row["u_sup"].im[None]), x_next)
            x = _gemv(row["g"], rhs)
            return x, x

        xs = dict(g=g[:-1], z=z[:-1],
                  u_main=c[4, :-1], u_sub=c[7, :-1], u_sup=c[8, :-1])
        _, x_rest = jax.lax.scan(bwd, x_last, xs, reverse=True)
        x = cpx.concat([x_rest, Cpx(x_last.re[None], x_last.im[None])], 0)
    else:
        w0 = _gemv_h(g[0], bt[0])

        def fwd(w_prev, row):
            rhs = row["b"] - _tri_matvec_h_cpx(
                Cpx(row["u_main_prev"].re[None], row["u_main_prev"].im[None]),
                Cpx(row["u_sub_prev"].re[None], row["u_sub_prev"].im[None]),
                Cpx(row["u_sup_prev"].re[None], row["u_sup_prev"].im[None]),
                w_prev)
            w = _gemv_h(row["g"], rhs)
            return w, w

        xs = dict(g=g[1:], b=bt[1:],
                  u_main_prev=c[4, :-1], u_sub_prev=c[7, :-1],
                  u_sup_prev=c[8, :-1])
        _, w_rest = jax.lax.scan(fwd, w0, xs)
        w = cpx.concat([Cpx(w0.re[None], w0.im[None]), w_rest], 0)

        x_last = w[-1]

        def bwd(x_next, row):
            v = _tri_matvec_h_cpx(
                Cpx(row["l_main_next"].re[None], row["l_main_next"].im[None]),
                Cpx(row["l_sub_next"].re[None], row["l_sub_next"].im[None]),
                Cpx(row["l_sup_next"].re[None], row["l_sup_next"].im[None]),
                x_next)
            x = row["w"] - _gemv_h(row["g"], v)
            return x, x

        xs = dict(g=g[:-1], w=w[:-1],
                  l_main_next=c[3, 1:], l_sub_next=c[5, 1:],
                  l_sup_next=c[6, 1:])
        _, x_rest = jax.lax.scan(bwd, x_last, xs, reverse=True)
        x = cpx.concat([x_rest, Cpx(x_last.re[None], x_last.im[None])], 0)

    return cpx.apply_parts(lambda p: jnp.moveaxis(p, 0, 1), x)


# ---------------------------------------------------------------------------
# Convergent Born series (split form of born.born_series_solve)
# ---------------------------------------------------------------------------

def born_operator_cpx(vel, f, grid: Grid2D, pml: PMLConfig,
                      adjoint: bool = False, n_order: int = 9,
                      attenuation=None):
    """Split-complex CBS split (cf. born.born_operator; reference:
    solveHelmholtzBornSeries.m:16-58). ``attenuation``: optional alpha map
    [Np/m], k = omega/c + i*sgn*alpha (same convention as every engine)."""
    import math

    ny, nx = grid.ny, grid.nx
    dx, dy = grid.dx, grid.dy
    sign = float(pml.sign_convention) * (-1.0 if adjoint else 1.0)

    vel = jnp.asarray(vel, jnp.float32)
    k_real = 2 * jnp.pi * f / vel  # real interior wavenumber

    kx = (2 * jnp.pi * jnp.fft.fftfreq(nx, d=dx)).astype(jnp.float32)
    ky = (2 * jnp.pi * jnp.fft.fftfreq(ny, d=dy)).astype(jnp.float32)
    p2 = kx[None, :] ** 2 + ky[:, None] ** 2  # real

    # Polynomial absorbing boundary (complex k^2 increment).
    c_att = pml.a0 / pml.l_pml
    k0_b = jnp.sqrt(jnp.mean(k_real ** 2))  # real
    x = jnp.asarray(grid.x, jnp.float32)
    y = jnp.asarray(grid.y, jnp.float32)
    x_pml = jnp.maximum(jnp.abs(x) + pml.l_pml - (nx - 1) * dx / 2, 0.0)
    y_pml = jnp.maximum(jnp.abs(y) + pml.l_pml - (ny - 1) * dy / 2, 0.0)
    r_b = jnp.sqrt(x_pml[None, :] ** 2 + y_pml[:, None] ** 2)
    cr = c_att * r_b
    trunc_exp = jnp.ones_like(cr)
    for m in range(n_order, 0, -1):
        trunc_exp = 1 + trunc_exp * cr / m
    denom = math.factorial(n_order) * trunc_exp
    num = Cpx((c_att ** 2) * (n_order - cr) * cr ** (n_order - 1) / denom,
              (c_att ** 2) * (2 * k0_b * r_b * sign) * cr ** (n_order - 1) / denom)
    if attenuation is not None:
        alpha = jnp.asarray(attenuation, jnp.float32)
        # (k_real + i*sgn*alpha)^2 + shell curve (cf. born3d lossy branch).
        k2 = Cpx(k_real ** 2 - alpha ** 2 + num.re,
                 num.im + 2 * sign * alpha * k_real)
    else:
        k2 = Cpx(k_real ** 2 + num.re, num.im)
    k = cpx.sqrt(k2)

    k_0 = (jnp.min(k.re) + jnp.max(k.re)) / 2  # real scalar
    v_pot0 = Cpx(k2.re - k_0 ** 2, k2.im)
    eps = jnp.max(cpx.absval(v_pot0)) * sign
    v_pot = Cpx(v_pot0.re, v_pot0.im - eps)
    gamma = cpx.mul(Cpx(jnp.zeros_like(eps), 1.0 / eps), v_pot)

    pseudo_prop_len = 2 * k_0 / jnp.abs(eps)
    n_iter = jnp.ceil(jnp.float32(grid.diagonal) / pseudo_prop_len)

    g0 = cpx.reciprocal(Cpx(p2 - k_0 ** 2, -eps * jnp.ones_like(p2)))

    def greens(w: Cpx) -> Cpx:
        return cpx.ifft2(cpx.mul(g0, cpx.fft2(w)))

    return greens, v_pot, gamma, n_iter


def born_series_solve_cpx(vel, src: Cpx, f, grid: Grid2D,
                          pml: PMLConfig, adjoint: bool = False,
                          n_order: int = 9, iter_cap: int = 1000,
                          iter_scale: float = 1.0, attenuation=None):
    """Split-complex convergent Born series (cf. born.born_series_solve)."""
    greens, v_pot, gamma, n_heur = born_operator_cpx(vel, f, grid, pml,
                                                     adjoint, n_order,
                                                     attenuation=attenuation)
    n_iter = jnp.minimum((iter_scale * n_heur).astype(jnp.int32), iter_cap)
    src = cpx.of(src)

    def body(i, u):
        upd = u - greens(cpx.mul(v_pot, u) - src)
        return u - cpx.mul(gamma, upd)

    u0 = cpx.zeros(src.shape)
    u = jax.lax.fori_loop(0, n_iter, body, u0)
    return u, n_iter


def transpose_coefficients_cpx(coeffs: Cpx) -> Cpx:
    """Split form of apply.transpose_coefficients."""
    from .apply import _shift
    offset_to_slot = {off: i for i, off in enumerate(STENCIL_OFFSETS)}
    out_re = [None] * 9
    out_im = [None] * 9
    for s, (dy, dx) in enumerate(STENCIL_OFFSETS):
        t = offset_to_slot[(-dy, -dx)]
        out_re[t] = _shift(coeffs.re[s], -dy, -dx)
        out_im[t] = _shift(coeffs.im[s], -dy, -dx)
    return Cpx(jnp.stack(out_re), jnp.stack(out_im))


def adjoint_coefficients_cpx(coeffs: Cpx) -> Cpx:
    """Split form of apply.adjoint_coefficients (conjugate transpose)."""
    return transpose_coefficients_cpx(coeffs).conj()


