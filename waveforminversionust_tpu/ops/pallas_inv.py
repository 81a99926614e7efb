"""Pallas TPU kernel: batched small-matrix Gauss-Jordan inversion.

Why a kernel: on the targeted runtime an XLA ``fori_loop`` iteration costs
~86 us *regardless of body size* (measured; see PERF_NOTES.md round 2), so
an n-step elimination loop can never beat ~n x 86 us at the XLA level —
that is exactly why ``jnp.linalg.inv`` is latency-bound here. Inside a
Pallas kernel the elimination loop runs entirely in VMEM with
Mosaic-compiled control flow, so the per-step cost drops to the actual VPU
work (~us). One kernel invocation inverts a whole batch.

Layout: matrices are carried as (b, b, batch) with the batch in the LANE
dimension (padded to multiples of 128), so every rank-1 elimination update
is a full-width VPU op and the row/column extractions slice only
sublane/outer dims. Complex arithmetic is split-complex (re, im) f32 —
the runtime has no complex support in Pallas anyway.

The elimination itself is the same cancellation-safe in-place Gauss-Jordan
as :func:`.batched_inv._batched_pivot_inv` (trailing update + direct
overwrite of pivot row/column); see that module for the numerics note.
Unpivoted: intended for the Helmholtz Schur/pivot blocks, which are far
from pivot breakdown (the whole solver stack is unpivoted at ~1e-6
residuals).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cpx import Cpx

_LANE = 128


def _gj_kernel(b: int, re_ref, im_ref, ore_ref, oim_ref):
    # Mosaic has no dynamic_slice on values; all dynamic row/column/pivot
    # extraction goes through pl.ds indexing on the (aliased) output refs.
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (b, b, 1), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (b, b, 1), 1)
    ore_ref[:] = re_ref[:]
    oim_ref[:] = im_ref[:]

    def step(j, carry):
        row_re = ore_ref[pl.ds(j, 1)]          # (1, b, Bt)
        row_im = oim_ref[pl.ds(j, 1)]
        col_re = ore_ref[:, pl.ds(j, 1)]       # (b, 1, Bt)
        col_im = oim_ref[:, pl.ds(j, 1)]
        piv_re = ore_ref[pl.ds(j, 1), pl.ds(j, 1)]  # (1, 1, Bt)
        piv_im = oim_ref[pl.ds(j, 1), pl.ds(j, 1)]

        den = jnp.maximum(piv_re * piv_re + piv_im * piv_im, 1e-38)
        pr, pi = piv_re / den, -piv_im / den

        s_re = col_re * pr - col_im * pi       # C * p^-1   (b, 1, Bt)
        s_im = col_re * pi + col_im * pr
        sr_re = row_re * pr - row_im * pi      # R * p^-1   (1, b, Bt)
        sr_im = row_re * pi + row_im * pr

        is_r = iota_r == j
        is_c = iota_c == j
        new_re = ore_ref[:] - (s_re * row_re - s_im * row_im)
        new_im = oim_ref[:] - (s_re * row_im + s_im * row_re)
        new_re = jnp.where(is_c, -s_re, new_re)
        new_im = jnp.where(is_c, -s_im, new_im)
        new_re = jnp.where(is_r, sr_re, new_re)
        new_im = jnp.where(is_r, sr_im, new_im)
        new_re = jnp.where(is_r & is_c, pr, new_re)
        new_im = jnp.where(is_r & is_c, pi, new_im)
        ore_ref[:] = new_re
        oim_ref[:] = new_im
        return carry

    jax.lax.fori_loop(0, b, step, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_small_inv_pallas(p: Cpx, interpret: bool = False) -> Cpx:
    """Invert a (B, b, b) batch of complex matrices in one Pallas call.

    b must be a multiple of 8 (sublane tiling). The batch is padded to a
    multiple of 128 (lanes) with identity matrices and chunked over a grid
    so each program's working set stays well under VMEM.
    """
    B, b, _ = p.re.shape
    bt = _LANE  # (b, b, 128) f32 x4 buffers: 16 MB VMEM holds b <= 128
    b_pad = -(-B // bt) * bt

    re = jnp.moveaxis(p.re, 0, -1)  # (b, b, B)
    im = jnp.moveaxis(p.im, 0, -1)
    if b_pad != B:
        re = jnp.pad(re, ((0, 0), (0, 0), (0, b_pad - B)))
        im = jnp.pad(im, ((0, 0), (0, 0), (0, b_pad - B)))
        # identity on the padded tail keeps the elimination well-defined
        eye = jnp.eye(b, dtype=jnp.float32)[:, :, None]
        tail = (jnp.arange(b_pad) >= B).astype(jnp.float32)[None, None, :]
        re = re + eye * tail

    grid = (b_pad // bt,)
    spec = pl.BlockSpec((b, b, bt), lambda i: (0, 0, i))
    # Double-buffered pipelining of 2 in + 2 out (b, b, 128) f32 blocks hits
    # the default 16 MB scoped-VMEM cap exactly at b=64; the chip has far
    # more VMEM than that, so raise the limit instead of shrinking blocks.
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    out_re, out_im = pl.pallas_call(
        functools.partial(_gj_kernel, b),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((b, b, b_pad), jnp.float32)] * 2,
        input_output_aliases={0: 0, 1: 1},
        compiler_params=params,
        interpret=interpret,
    )(re, im)

    out_re = jnp.moveaxis(out_re[:, :, :B], -1, 0)
    out_im = jnp.moveaxis(out_im[:, :, :B], -1, 0)
    return Cpx(out_re, out_im)
