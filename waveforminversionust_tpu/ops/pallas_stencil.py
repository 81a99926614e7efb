"""Pallas TPU kernel for the 9-point Helmholtz operator application.

The operator apply is the hot op of every Krylov/Born iteration and of the
banded solver's refinement passes. These kernels perform the nine complex
multiply-adds in one VMEM pass per transmit element. (XLA also fuses the
jnp version's nine shifted slices into a one-pass loop — measured round 5;
the kernels win where that fusion pays lane-masking at misaligned widths,
e.g. the 301^2 and 801^2 production grids, not on raw bytes.)

TPUs have no native complex arithmetic, so complex64 planes are carried as
(real, imag) float32 pairs (SURVEY.md section 7 'hard parts' (d)) and the
complex products are expanded manually:

    out_re = sum_s  c_re[s] * u_re(s) - c_im[s] * u_im(s)
    out_im = sum_s  c_re[s] * u_im(s) + c_im[s] * u_re(s)

where u(s) is the field shifted by the stencil offset. The shift is realized
by writing the field into a zero-initialized halo scratch buffer and taking
nine static slices — all shapes static, no gather.

One grid step per transmit element; VMEM budget at the reference 301x301
grid: field + halo + 9x2 coefficient planes ~ 8 MB < 16 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .stencil import STENCIL_OFFSETS

try:  # Pallas is TPU/interpret-only in some builds; degrade gracefully.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _kernel(cre_ref, cim_ref, ure_ref, uim_ref, ore_ref, oim_ref,
            halo_re, halo_im):
    ny = ure_ref.shape[-2]
    nx = ure_ref.shape[-1]

    # Zero halo ring, interior = field.
    halo_re[...] = jnp.zeros_like(halo_re)
    halo_im[...] = jnp.zeros_like(halo_im)
    halo_re[1:1 + ny, 1:1 + nx] = ure_ref[0]
    halo_im[1:1 + ny, 1:1 + nx] = uim_ref[0]

    out_re = jnp.zeros((ny, nx), jnp.float32)
    out_im = jnp.zeros((ny, nx), jnp.float32)
    for s, (dy, dx) in enumerate(STENCIL_OFFSETS):
        ur = halo_re[1 + dy:1 + dy + ny, 1 + dx:1 + dx + nx]
        ui = halo_im[1 + dy:1 + dy + ny, 1 + dx:1 + dx + nx]
        cr = cre_ref[s]
        ci = cim_ref[s]
        out_re = out_re + cr * ur - ci * ui
        out_im = out_im + cr * ui + ci * ur
    ore_ref[0] = out_re
    oim_ref[0] = out_im


def _apply_planes(cre, cim, ure, uim, interpret: bool):
    """Run the fused kernel on split f32 planes; returns (out_re, out_im)."""
    batch, ny, nx = ure.shape
    out_shape = (
        jax.ShapeDtypeStruct((batch, ny, nx), jnp.float32),
        jax.ShapeDtypeStruct((batch, ny, nx), jnp.float32),
    )
    return pl.pallas_call(
        _kernel,
        out_shape=out_shape,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((9, ny, nx), lambda i: (0, 0, 0)),
            pl.BlockSpec((9, ny, nx), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((ny + 2, nx + 2), jnp.float32),
            pltpu.VMEM((ny + 2, nx + 2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cre, cim, ure, uim)


# Whole-field kernel VMEM budget: 18 coefficient planes + in/out field pair
# + the 2 halo scratches, all f32. The naive ~(18 + 4 + 2) * 4 B/point
# estimate undercounts ~2x (Mosaic double-buffers the per-step blocks):
# measured on the real chip (round 4), 704^2 (495k px) compiles, 736^2
# (541k px) fails VMEM (118.8 MB > 100 MB limit at 801^2). Gate "auto" at
# the measured boundary; beyond it the y-TILED kernel below takes over
# (round-5 verdict item 4) — same one-pass traffic, VMEM bounded by the
# tile height instead of the whole field.
_FUSED_APPLY_MAX_PIX = 500_000  # 704^2 = 495k fits (measured); 736^2 does not


def fused_apply_fits(ny: int, nx: int) -> bool:
    """Whether the whole-field fused apply kernel fits VMEM at this grid."""
    return ny * nx <= _FUSED_APPLY_MAX_PIX


# ---------------------------------------------------------------------------
# y-tiled fused apply: removes the whole-field VMEM ceiling
# ---------------------------------------------------------------------------

def _tile_rows(ny: int, nx: int) -> int:
    """Tile height: 128 rows, halved while the per-step VMEM estimate
    (c blocks + field/out blocks, 2x double-buffered, both components)
    exceeds ~64 MB; floors at 8 (one f32 sublane tile)."""
    t = 128
    while t > 8 and (9 + 2) * t * nx * 4 * 2 * 2 > 64 * 1024 * 1024:
        t //= 2
    return t


def _tiled_kernel(tile, nxp, n_tiles,
                  cre_ref, cim_ref, ure_ref, uim_ref,
                  utr_ref, uti_ref, ubr_ref, ubi_ref,
                  ore_ref, oim_ref, halo_re, halo_im):
    """One grid step = one (tile of rows, transmit element). The halo
    scratch holds tile+2 rows x nxp+2 cols; the off-tile neighbor rows
    arrive as 8-row-aligned blocks (utr/ubr — Mosaic requires sublane
    blocks divisible by 8, so the single neighbor row rides in the 8-row
    block that contains it: the LAST row of the previous tile's last
    8-block, the FIRST row of the next tile's first 8-block), masked to
    zero at the grid's outer boundary — reproducing the whole-field
    kernel's zero halo."""
    t = pl.program_id(0)

    halo_re[...] = jnp.zeros_like(halo_re)
    halo_im[...] = jnp.zeros_like(halo_im)
    halo_re[1:1 + tile, 1:1 + nxp] = ure_ref[0]
    halo_im[1:1 + tile, 1:1 + nxp] = uim_ref[0]

    @pl.when(t > 0)
    def _():
        halo_re[0:1, 1:1 + nxp] = utr_ref[0, 7:8]
        halo_im[0:1, 1:1 + nxp] = uti_ref[0, 7:8]

    @pl.when(t < n_tiles - 1)
    def _():
        halo_re[tile + 1:tile + 2, 1:1 + nxp] = ubr_ref[0, 0:1]
        halo_im[tile + 1:tile + 2, 1:1 + nxp] = ubi_ref[0, 0:1]

    out_re = jnp.zeros((tile, nxp), jnp.float32)
    out_im = jnp.zeros((tile, nxp), jnp.float32)
    for s, (dy, dx) in enumerate(STENCIL_OFFSETS):
        ur = halo_re[1 + dy:1 + dy + tile, 1 + dx:1 + dx + nxp]
        ui = halo_im[1 + dy:1 + dy + tile, 1 + dx:1 + dx + nxp]
        cr = cre_ref[s]
        ci = cim_ref[s]
        out_re = out_re + cr * ur - ci * ui
        out_im = out_im + cr * ui + ci * ur
    ore_ref[0] = out_re
    oim_ref[0] = out_im


def _apply_planes_tiled(cre, cim, ure, uim, interpret: bool,
                        tile: int | None = None):
    """y-tiled fused apply on split f32 planes. Pads the row axis to a
    tile multiple (zero rows — exactly the whole-field kernel's zero-halo
    semantics), runs a (n_tiles, batch) grid with the batch axis INNER so
    each coefficient strip is fetched once per tile rather than once per
    transmit element, and crops the pad."""
    batch, ny, nx = ure.shape
    if tile is None:
        tile = _tile_rows(ny, nx)
    n_tiles = -(-ny // tile)
    nyp = n_tiles * tile
    if nyp != ny:
        pad = ((0, 0), (0, nyp - ny), (0, 0))
        cre = jnp.pad(cre, pad)
        cim = jnp.pad(cim, pad)
        ure = jnp.pad(ure, pad)
        uim = jnp.pad(uim, pad)

    c_spec = pl.BlockSpec((9, tile, nx), lambda t, b: (0, t, 0))
    u_spec = pl.BlockSpec((1, tile, nx), lambda t, b: (b, t, 0))
    # Neighbor-row blocks: Mosaic requires sublane block sizes divisible
    # by 8, so the single halo row rides in an 8-row block (block-index
    # units = 8 rows; tile is always a multiple of 8 — _tile_rows).
    # Top: the last 8-block of the previous tile (its row 7 is the row
    # just above this tile); bottom: the first 8-block of the next tile
    # (its row 0 is the row just below). Clamped at the boundary (the
    # kernel masks those steps to the zero halo instead).
    t8 = tile // 8
    n8 = n_tiles * t8
    top_spec = pl.BlockSpec(
        (1, 8, nx), lambda t, b: (b, jnp.maximum(t * t8 - 1, 0), 0))
    bot_spec = pl.BlockSpec(
        (1, 8, nx), lambda t, b: (b, jnp.minimum((t + 1) * t8, n8 - 1), 0))

    out_shape = (
        jax.ShapeDtypeStruct((batch, nyp, nx), jnp.float32),
        jax.ShapeDtypeStruct((batch, nyp, nx), jnp.float32),
    )
    ore, oim = pl.pallas_call(
        functools.partial(_tiled_kernel, tile, nx, n_tiles),
        out_shape=out_shape,
        grid=(n_tiles, batch),
        in_specs=[c_spec, c_spec, u_spec, u_spec,
                  top_spec, top_spec, bot_spec, bot_spec],
        out_specs=(u_spec, u_spec),
        scratch_shapes=[
            pltpu.VMEM((tile + 2, nx + 2), jnp.float32),
            pltpu.VMEM((tile + 2, nx + 2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cre, cim, ure, uim, ure, uim, ure, uim)
    if nyp != ny:
        ore = ore[:, :ny]
        oim = oim[:, :ny]
    return ore, oim


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def h_apply_tiled_cpx(coeffs, u, interpret: bool = False,
                      tile: int | None = None):
    """Split-complex y-tiled fused apply (same contract as
    :func:`h_apply_pallas_cpx`). Serves grids past the whole-field
    kernel's measured 704^2 VMEM ceiling — e.g. the 801^2+ refinement
    passes and GMRES matvecs. Measured on the chip (round 5,
    examples/tiled_apply_ab.py): XLA already fuses the jnp apply into one
    streamed pass, so this kernel wins only at MISALIGNED row widths
    where that fusion pays lane masking (801^2: 1.8x standalone, 1.09x on
    the refined solve; 8-aligned widths like 736/1024 favor the jnp
    apply; 1201^2 parity) — ops.solve._fused_apply_kernel encodes that
    gate."""
    from .cpx import Cpx
    if not _HAVE_PALLAS:  # pragma: no cover
        from .split_engine import h_apply_cpx
        return h_apply_cpx(coeffs, u)
    ore, oim = _apply_planes_tiled(coeffs.re, coeffs.im, u.re, u.im,
                                   interpret, tile)
    return Cpx(ore, oim)


@functools.partial(jax.jit, static_argnames=("interpret",))
def h_apply_pallas(coeffs, u, interpret: bool = False):
    """Pallas version of :func:`.apply.h_apply`.

    Args:
        coeffs: (9, ny, nx) complex64 operator planes.
        u: (batch, ny, nx) complex64 fields.
        interpret: run in interpreter mode (for CPU testing).
    """
    if not _HAVE_PALLAS:  # pragma: no cover
        from .apply import h_apply
        return h_apply(coeffs, u)

    cre = jnp.real(coeffs).astype(jnp.float32)
    cim = jnp.imag(coeffs).astype(jnp.float32)
    ure = jnp.real(u).astype(jnp.float32)
    uim = jnp.imag(u).astype(jnp.float32)
    ore, oim = _apply_planes(cre, cim, ure, uim, interpret)
    return (ore + 1j * oim).astype(jnp.complex64)


@functools.partial(jax.jit, static_argnames=("interpret",))
def h_apply_pallas_cpx(coeffs, u, interpret: bool = False):
    """Split-complex fused apply — the production-engine form (the axon
    TPU runtime has no complex64 data movement, so the hot paths carry
    ``ops.cpx.Cpx`` plane pairs; see SolverConfig.split_complex).

    Same math as :func:`.split_engine.h_apply_cpx` (whose nine shifted
    slices XLA fuses into one streamed pass — measured round 5; the win
    here is lane-alignment efficiency at odd widths, not bytes;
    utils.flops.h_apply_cost has the corrected traffic model). Used by
    the banded solver's iterative-refinement passes and the GMRES matvecs
    when ``SolverConfig.fused_apply`` allows (see ops.solve._make_apply_cpx).

    Args:
        coeffs: Cpx of (9, ny, nx) planes.
        u: Cpx of (batch, ny, nx) fields.
    """
    from .cpx import Cpx
    if not _HAVE_PALLAS:  # pragma: no cover
        from .split_engine import h_apply_cpx
        return h_apply_cpx(coeffs, u)
    ore, oim = _apply_planes(coeffs.re, coeffs.im, u.re, u.im, interpret)
    return Cpx(ore, oim)
