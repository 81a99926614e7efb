"""Fused Pallas TPU kernels: the block-Thomas solve sweeps.

The split-engine sweeps (:func:`.split_engine.banded_solve_cpx`) are two
``lax.scan`` passes whose per-row body is one (nx, nx) gemv over the RHS
batch plus a tridiagonal matvec — ~43 us of XLA dispatch floor per step on
the targeted runtime, i.e. ~26 ms per 256-RHS solve at 301^2 where the
actual MXU work is ~2 ms. Each pass here is ONE ``pallas_call`` with a
sequential grid over rows: the running vector persists in VMEM scratch and
each step is 4 MXU dots + VPU shifts.

Recurrences (same as banded_solve_cpx, planes convention of
ops/stencil.py):

  forward solve        adjoint solve (H^H)
  z_0 = b_0            w_0 = G_0^H b_0
  z_i = b_i - L_i G_{i-1} z_{i-1}
                       w_i = G_i^H (b_i - U_{i-1}^H w_{i-1})
  x_e = G_e z_e        x_e = w_e
  x_i = G_i (z_i - U_i x_{i+1})
                       x_i = w_i - G_i^H L_{i+1}^H x_{i+1}

Validated against banded_solve_cpx in tests/test_pallas_factor.py
(interpret mode) and on the real chip (PERF_NOTES.md round 2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cpx import Cpx
from .pallas_factor import _shift_cols_left, _shift_cols_right

_HI = jax.lax.Precision.HIGHEST


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _gemv(zr, zi, gr, gi, precision=_HI):
    """out[b, i] = sum_j G[i, j] z[b, j] — contract z dim 1 with G dim 1."""
    dn = (((1,), (1,)), ((), ()))
    d = lambda a, b: jax.lax.dot_general(a, b, dn, precision=precision,
                                         preferred_element_type=jnp.float32)
    return d(zr, gr) - d(zi, gi), d(zr, gi) + d(zi, gr)


def _gemv_h(zr, zi, gr, gi, precision=_HI):
    """out[b, i] = sum_j conj(G[j, i]) z[b, j] — z @ conj(G)."""
    dn = (((1,), (0,)), ((), ()))
    d = lambda a, b: jax.lax.dot_general(a, b, dn, precision=precision,
                                         preferred_element_type=jnp.float32)
    return d(zr, gr) + d(zi, gi), d(zi, gr) - d(zr, gi)


def _tri(m_re, m_im, s_re, s_im, p_re, p_im, wr, wi):
    """T w with T[j,j]=m[j], T[j,j-1]=s[j], T[j,j+1]=p[j]; w is (batch, n)."""
    t1r, t1i = _cmul(m_re, m_im, wr, wi)
    t2r, t2i = _cmul(s_re, s_im, _shift_cols_right(wr), _shift_cols_right(wi))
    t3r, t3i = _cmul(p_re, p_im, _shift_cols_left(wr), _shift_cols_left(wi))
    return t1r + t2r + t3r, t1i + t2i + t3i


def _tri_h(m_re, m_im, s_re, s_im, p_re, p_im, wr, wi):
    """T^H w: (T^H w)[j] = conj(m[j]) w[j] + conj(s[j+1]) w[j+1]
    + conj(p[j-1]) w[j-1]."""
    z1 = jnp.zeros((1, 1), m_re.dtype)
    sl = lambda v: jnp.concatenate([v[:, 1:], z1], axis=1)   # v[j+1]
    sr = lambda v: jnp.concatenate([z1, v[:, :-1]], axis=1)  # v[j-1]
    t1r, t1i = _cmul(m_re, -m_im, wr, wi)
    t2r, t2i = _cmul(sl(s_re), -sl(s_im),
                     _shift_cols_left(wr), _shift_cols_left(wi))
    t3r, t3i = _cmul(sr(p_re), -sr(p_im),
                     _shift_cols_right(wr), _shift_cols_right(wi))
    return t1r + t2r + t3r, t1i + t2i + t3i


def _plane(ref, k, nxp):
    return ref[0, k, :].reshape(1, nxp)


def _fwd_kernel(nxp: int, adjoint: bool, precision,
                g_re_ref, g_im_ref, p_re_ref, p_im_ref,
                b_re_ref, b_im_ref, z_re_ref, z_im_ref,
                c_re_ref, c_im_ref):
    """Forward pass. Forward solve: planes row = L of row i, G = G_{i-1}.
    Adjoint solve: planes row = U of row i-1, G = G_i."""
    i = pl.program_id(0)
    br, bi = b_re_ref[0], b_im_ref[0]
    gr, gi = g_re_ref[0], g_im_ref[0]
    if not adjoint:
        # z_i = b_i - L_i (G_{i-1} z_{i-1});   z_0 = b_0
        @pl.when(i == 0)
        def _():
            z_re_ref[0] = br
            z_im_ref[0] = bi
            c_re_ref[:] = br
            c_im_ref[:] = bi

        @pl.when(i > 0)
        def _():
            wr, wi = _gemv(c_re_ref[:], c_im_ref[:], gr, gi, precision)
            lm_re, lm_im = _plane(p_re_ref, 3, nxp), _plane(p_im_ref, 3, nxp)
            ls_re, ls_im = _plane(p_re_ref, 5, nxp), _plane(p_im_ref, 5, nxp)
            lp_re, lp_im = _plane(p_re_ref, 6, nxp), _plane(p_im_ref, 6, nxp)
            tr, ti = _tri(lm_re, lm_im, ls_re, ls_im, lp_re, lp_im, wr, wi)
            z_re_ref[0] = br - tr
            z_im_ref[0] = bi - ti
            c_re_ref[:] = br - tr
            c_im_ref[:] = bi - ti
    else:
        # w_i = G_i^H (b_i - U_{i-1}^H w_{i-1});   w_0 = G_0^H b_0
        um_re, um_im = _plane(p_re_ref, 4, nxp), _plane(p_im_ref, 4, nxp)
        us_re, us_im = _plane(p_re_ref, 7, nxp), _plane(p_im_ref, 7, nxp)
        up_re, up_im = _plane(p_re_ref, 8, nxp), _plane(p_im_ref, 8, nxp)

        @pl.when(i == 0)
        def _():
            wr, wi = _gemv_h(br, bi, gr, gi, precision)
            z_re_ref[0] = wr
            z_im_ref[0] = wi
            c_re_ref[:] = wr
            c_im_ref[:] = wi

        @pl.when(i > 0)
        def _():
            tr, ti = _tri_h(um_re, um_im, us_re, us_im, up_re, up_im,
                            c_re_ref[:], c_im_ref[:])
            wr, wi = _gemv_h(br - tr, bi - ti, gr, gi, precision)
            z_re_ref[0] = wr
            z_im_ref[0] = wi
            c_re_ref[:] = wr
            c_im_ref[:] = wi


def _bwd_kernel(nxp: int, adjoint: bool, precision,
                g_re_ref, g_im_ref, p_re_ref, p_im_ref,
                z_re_ref, z_im_ref, x_re_ref, x_im_ref,
                c_re_ref, c_im_ref):
    """Backward pass over rows r = ny-1-i. Forward solve: planes row = U of
    row r, G = G_r. Adjoint solve: planes row = L of row r+1, G = G_r."""
    i = pl.program_id(0)
    zr, zi = z_re_ref[0], z_im_ref[0]
    gr, gi = g_re_ref[0], g_im_ref[0]
    if not adjoint:
        # x_e = G_e z_e;   x_r = G_r (z_r - U_r x_{r+1})
        um_re, um_im = _plane(p_re_ref, 4, nxp), _plane(p_im_ref, 4, nxp)
        us_re, us_im = _plane(p_re_ref, 7, nxp), _plane(p_im_ref, 7, nxp)
        up_re, up_im = _plane(p_re_ref, 8, nxp), _plane(p_im_ref, 8, nxp)

        @pl.when(i == 0)
        def _():
            xr, xi = _gemv(zr, zi, gr, gi, precision)
            x_re_ref[0] = xr
            x_im_ref[0] = xi
            c_re_ref[:] = xr
            c_im_ref[:] = xi

        @pl.when(i > 0)
        def _():
            tr, ti = _tri(um_re, um_im, us_re, us_im, up_re, up_im,
                          c_re_ref[:], c_im_ref[:])
            xr, xi = _gemv(zr - tr, zi - ti, gr, gi, precision)
            x_re_ref[0] = xr
            x_im_ref[0] = xi
            c_re_ref[:] = xr
            c_im_ref[:] = xi
    else:
        # x_e = w_e;   x_r = w_r - G_r^H (L_{r+1}^H x_{r+1})
        lm_re, lm_im = _plane(p_re_ref, 3, nxp), _plane(p_im_ref, 3, nxp)
        ls_re, ls_im = _plane(p_re_ref, 5, nxp), _plane(p_im_ref, 5, nxp)
        lp_re, lp_im = _plane(p_re_ref, 6, nxp), _plane(p_im_ref, 6, nxp)

        @pl.when(i == 0)
        def _():
            x_re_ref[0] = zr
            x_im_ref[0] = zi
            c_re_ref[:] = zr
            c_im_ref[:] = zi

        @pl.when(i > 0)
        def _():
            tr, ti = _tri_h(lm_re, lm_im, ls_re, ls_im, lp_re, lp_im,
                            c_re_ref[:], c_im_ref[:])
            vr, vi = _gemv_h(tr, ti, gr, gi, precision)
            xr, xi = zr - vr, zi - vi
            x_re_ref[0] = xr
            x_im_ref[0] = xi
            c_re_ref[:] = xr
            c_im_ref[:] = xi


def _pass(kernel, ny, batch, nxp, g_maps, p_maps, v_map, out_map,
          g_re, g_im, planes_re, planes_im, v_re, v_im, interpret):
    g_spec = pl.BlockSpec((1, nxp, nxp), g_maps, memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((1, 9, nxp), p_maps, memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, batch, nxp), v_map, memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, batch, nxp), out_map, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(ny,),
        in_specs=[g_spec, g_spec, p_spec, p_spec, v_spec, v_spec],
        out_specs=[o_spec, o_spec],
        out_shape=[jax.ShapeDtypeStruct((ny, batch, nxp), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((batch, nxp), jnp.float32),
                        pltpu.VMEM((batch, nxp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(g_re, g_im, planes_re, planes_im, v_re, v_im)


@functools.partial(jax.jit, static_argnames=("adjoint", "interpret",
                                             "precision"))
def banded_solve_pallas(factor, b: Cpx, adjoint: bool = False,
                        interpret: bool = False,
                        precision=_HI) -> Cpx:
    """Fused-sweep solve through a BandedFactorCpx (same contract as
    split_engine.banded_solve_cpx). b: (batch, ny, nx).

    ``precision``: MXU precision of the per-row gemvs (Mosaic supports
    DEFAULT and HIGHEST only). DEFAULT (single-pass bf16) halves-to-thirds
    the sweep MXU time at ~1e-3 relative solution accuracy — fit for
    solves feeding only low-sensitivity scalars (the linearized
    line-search; see SolverConfig.fast_linesearch), NOT for the data-fit
    forward solve."""
    g, coeffs = factor.g, factor.coeffs
    ny, nx = coeffs.re.shape[1], coeffs.re.shape[2]
    batch = b.re.shape[0]

    g_pad = getattr(factor, "g_pad", None)
    if g_pad is not None:
        # padded factor from the fused factorization kernel — no re-pad
        nxp = g_pad.re.shape[-1]
        g_re, g_im = g_pad.re, g_pad.im
        pad = nxp - nx
    else:
        # pad to a sublane multiple (use 32 to match the factor kernel)
        nxp = -(-nx // 32) * 32
        pad = nxp - nx
        g_re, g_im = g.re, g.im
        if pad:
            g_re = jnp.pad(g_re, ((0, 0), (0, pad), (0, pad)))
            g_im = jnp.pad(g_im, ((0, 0), (0, pad), (0, pad)))
            # identity tail keeps the padded components decoupled
            eye_tail = (jnp.arange(nxp) >= nx).astype(jnp.float32)
            g_re = g_re + (jnp.eye(nxp, dtype=jnp.float32)[None]
                           * eye_tail[None, None, :] * eye_tail[None, :, None])

    def padx(a):
        if pad == 0:
            return a
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])

    planes_re = padx(jnp.moveaxis(coeffs.re, 0, 1))   # (ny, 9, nxp)
    planes_im = padx(jnp.moveaxis(coeffs.im, 0, 1))

    b_re = padx(jnp.moveaxis(b.re, 1, 0))             # (ny, batch, nxp)
    b_im = padx(jnp.moveaxis(b.im, 1, 0))

    fwd = functools.partial(_fwd_kernel, nxp, adjoint, precision)
    bwd = functools.partial(_bwd_kernel, nxp, adjoint, precision)

    if not adjoint:
        g_fwd = lambda i: (jnp.maximum(i - 1, 0), 0, 0)   # G_{i-1}
        p_fwd = lambda i: (i, 0, 0)                        # L_i
    else:
        g_fwd = lambda i: (i, 0, 0)                        # G_i
        p_fwd = lambda i: (jnp.maximum(i - 1, 0), 0, 0)    # U_{i-1}
    row_in = lambda i: (i, 0, 0)
    z_re, z_im = _pass(fwd, ny, batch, nxp, g_fwd, p_fwd, row_in, row_in,
                       g_re, g_im, planes_re, planes_im, b_re, b_im,
                       interpret)

    rev = lambda i: (ny - 1 - i, 0, 0)
    if not adjoint:
        p_bwd = rev                                        # U_r
    else:
        p_bwd = lambda i: (jnp.minimum(ny - i, ny - 1), 0, 0)  # L_{r+1}
    x_re, x_im = _pass(bwd, ny, batch, nxp, rev, p_bwd, rev, rev,
                       g_re, g_im, planes_re, planes_im, z_re, z_im,
                       interpret)

    x_re = jnp.moveaxis(x_re[..., :nx], 0, 1)
    x_im = jnp.moveaxis(x_im[..., :nx], 0, 1)
    return Cpx(x_re, x_im)
