"""FLOP / HBM-byte cost models and roofline accounting for the production
solvers — the absolute-utilization side of the perf story.

The reference publishes wall-clock only (BASELINE.md; FinalPresentation.pdf
obj 103 is a timing table with no FLOP counts). This module prices each
production stage from first principles at the shapes ACTUALLY EXECUTED
(padded to the kernel tile sizes), so a measured time converts to achieved
TFLOP/s, fraction of chip peak (MFU), achieved HBM GB/s, and a named
binding constraint per regime.

Conventions (documented so every number below is reproducible):

* 1 complex multiply-add = 8 real flops (4 mul + 4 add); a lone complex
  multiply = 6. Real matmul (m, k) @ (k, n) = 2*m*k*n flops; a complex
  matmul built from 4 real MXU dots (ops.pallas_factor._cdot) = 8*m*k*n
  plus 4*m*n combine adds.
* Counts are ALGORITHMIC flops at executed shapes. TPU matmul precision
  multiplies HARDWARE work on top: DEFAULT = one bf16 pass (1x), HIGHEST
  = six passes (6x) — Mosaic exposes exactly these two (PERF_NOTES round
  3). ``roofline`` reports utilization against both the raw bf16 peak
  (standard MFU) and the precision-adjusted peak (how close the kernel is
  to the best any implementation at that precision could do).
* HBM bytes count the main streamed arrays (the factor G is the giant:
  2 f32 planes x nxp^2 per grid row); small per-row vectors and VMEM-
  resident tiles are ignored.

Chip model: TPU v5e (the targeted part) — 197 bf16 TFLOP/s per chip,
819 GB/s HBM, 16 GB HBM (public spec; jax-ml.github.io/scaling-book).
Override ``ChipSpec`` for other parts.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple


@dataclass(frozen=True)
class ChipSpec:
    name: str = "tpu-v5e"
    peak_bf16_flops: float = 197e12   # per chip, one bf16 MXU pass
    hbm_bytes_per_s: float = 819e9
    hbm_bytes: float = 16e9


V5E = ChipSpec()

# Hardware pass multiplier per jax.lax.Precision on the MXU.
PRECISION_PASSES = {"default": 1, "high": 3, "highest": 6}


class StageCost(NamedTuple):
    """Cost of one pipeline stage.

    Attributes:
        flops_mxu: algorithmic flops executed as MXU matmuls.
        flops_vpu: algorithmic flops executed as VPU elementwise work.
        bytes_hbm: HBM bytes streamed (reads + writes of the big arrays).
    """

    flops_mxu: float
    flops_vpu: float
    bytes_hbm: float

    @property
    def flops(self) -> float:
        return self.flops_mxu + self.flops_vpu

    def __add__(self, other: "StageCost") -> "StageCost":
        return StageCost(self.flops_mxu + other.flops_mxu,
                         self.flops_vpu + other.flops_vpu,
                         self.bytes_hbm + other.bytes_hbm)

    def scale(self, k: float) -> "StageCost":
        return StageCost(k * self.flops_mxu, k * self.flops_vpu,
                         k * self.bytes_hbm)


def _pad_up(n: int, mult: int) -> int:
    return -(-n // mult) * mult


# ---------------------------------------------------------------------------
# 2D banded direct method (ops.pallas_factor / ops.pallas_sweep)
# ---------------------------------------------------------------------------

def factor_cost(ny: int, nx: int, bk: int = 64) -> StageCost:
    """Block-Thomas factorization (ops.pallas_factor._factor_kernel).

    Per grid row: the tridiagonal products GU and LGU (VPU elementwise on
    (nxp, nxp)), then an unpivoted blocked Gauss-Jordan inverse — nxp/bk
    panels, each a scalar pivot GJ (VPU, serial) plus three complex MXU
    panel matmuls: P^-1 R (bk, bk)@(bk, nxp), C P^-1 (nxp, bk)@(bk, bk),
    and the rank-bk update C @ (P^-1 R) (nxp, bk)@(bk, nxp) — the update
    dominates at 8*nxp^2*bk per panel = 8*nxp^3 per row.
    """
    nxp = _pad_up(nx, bk)
    n_panels = nxp // bk
    # GU + LGU: each 3 complex elementwise muls + 2 complex adds on (nxp^2)
    vpu = 2 * (3 * 6 + 2 * 2) * nxp * nxp
    # pivot scalar GJ: bk rank-1 steps on the packed (bk, 2bk) block,
    # ~2 fused complex-style updates per element per step.
    vpu += n_panels * (12 * bk ** 3)
    # rank-bk update subtract + S assembly selects (2 planes each)
    vpu += n_panels * 4 * nxp * nxp + 4 * nxp * nxp
    # MXU panels: u = C @ rs dominates; rs and cs are the thin ones.
    mxu = n_panels * (8 * nxp * nxp * bk        # C @ (P^-1 R)
                      + 8 * bk * bk * nxp * 2)  # P^-1 R and C P^-1
    # HBM: write G out (2 f32 planes per row); coefficient planes are tiny.
    bytes_hbm = 2 * 4 * nxp * nxp
    return StageCost(mxu * ny, vpu * ny, float(bytes_hbm) * ny)


def solve_cost(ny: int, nx: int, batch: int, bk: int = 64) -> StageCost:
    """One banded direct solve = forward + backward sweep
    (ops.pallas_sweep): per grid row per sweep, one complex
    (batch, nxp) @ (nxp, nxp) MXU contraction plus a tridiagonal matvec.
    The sweeps re-read the full factor G once per sweep — the dominant
    HBM stream (arithmetic intensity ~= batch flops/byte, so small
    batches go bandwidth-bound and large batches MXU-bound).
    """
    nxp = _pad_up(nx, bk)
    per_row_sweep_mxu = 8 * batch * nxp * nxp
    per_row_sweep_vpu = (3 * 6 + 2 * 2) * batch * nxp
    bytes_per_sweep = 2 * 4 * nxp * nxp          # G read (2 f32 planes)
    bytes_fields = 2 * 2 * 4 * batch * nxp       # rhs read + x write
    return StageCost(2 * ny * per_row_sweep_mxu,
                     2 * ny * per_row_sweep_vpu,
                     float(2 * ny * bytes_per_sweep
                           + 2 * ny * bytes_fields))


def h_apply_cost(ny: int, nx: int, batch: int,
                 fused: bool = False, materialized: bool = False) -> StageCost:
    """One 9-point operator application (ops.apply.h_apply /
    ops.pallas_stencil kernels): 9 complex muls + 8 complex adds per grid
    point per RHS — pure VPU work.

    Traffic model (CORRECTED round 5, measured — examples/tiled_apply_ab
    .py): XLA fuses the jnp apply's nine shifted slices into ONE streamed
    pass, so the jnp and Pallas forms move the same HBM bytes (field in +
    out + the coefficient planes); the earlier 9-reads+9-writes model
    (288 B/point/RHS) was disproven on the chip — at 1024^2 x 16 RHS the
    jnp apply ran 2.92 ms where 9 materialized copies would need >= 6 ms
    of HBM time alone. The forms differ in *efficiency* at misaligned
    widths (lane masking), not in bytes; see ops.solve._fused_apply_kernel
    for the measured dispatch gate. ``materialized=True`` prices the
    hypothetical unfused 9-copy bound (kept for the what-if comparison
    only).
    """
    n = ny * nx * batch
    vpu = (9 * 6 + 8 * 2) * n
    del fused  # same bytes either way (see docstring); kept for API compat
    if materialized:
        # Hypothetical unfused bound: 9 shifted copies written + read back,
        # split planes.
        bytes_hbm = 9 * 2 * 2 * 4 * n + (2 + 2) * 4 * n
    else:
        bytes_hbm = (2 + 2) * 4 * n + 9 * 2 * 4 * ny * nx
    return StageCost(0.0, float(vpu), float(bytes_hbm))


def coefficient_cost(ny: int, nx: int) -> StageCost:
    """PML + stencil coefficient planes (ops.stencil): ~tens of
    elementwise ops per grid point building 9 complex planes."""
    n = ny * nx
    return StageCost(0.0, 80.0 * n, float(9 * 2 * 4 * n * 2))


def fwi_iteration_cost(ny: int, nx: int, batch: int, bk: int = 64,
                       refactor_every: int = 1,
                       refine: int = 0) -> StageCost:
    """One production nonlinear-CG FWI iteration (fwi.optimizers):
    coefficient build + (amortized) factorization + 3 direct solves
    (forward, adjoint, line search) + gradient/update elementwise.

    ``refactor_every=K`` amortizes the factor over K iterations and adds
    one iterative-refinement pass (operator apply + extra solve) to the
    forward and adjoint solves on the K-1 stale iterations
    (SolverConfig.refactor_every; PERF_NOTES round 3).
    ``refine`` adds unconditional refinement passes to every solve
    (SolverConfig.refine, the large-grid bf16-factor recovery).
    """
    k = max(1, int(refactor_every))
    cost = coefficient_cost(ny, nx)
    cost = cost + factor_cost(ny, nx, bk).scale(1.0 / k)
    one_solve = solve_cost(ny, nx, batch, bk)
    one_refine = h_apply_cost(ny, nx, batch) + one_solve
    cost = cost + one_solve.scale(3.0)
    if k > 1:
        cost = cost + one_refine.scale(2.0 * (k - 1) / k)
    if refine:
        cost = cost + one_refine.scale(3.0 * refine)
    # gradient, momentum, line-search scalars: ~30 elementwise passes
    cost = cost + StageCost(0.0, 30.0 * ny * nx * batch / max(batch, 1)
                            + 20.0 * ny * nx, 16.0 * 4 * ny * nx)
    return cost


# ---------------------------------------------------------------------------
# 3D spectral method (ops.born3d / parallel.fft3d)
# ---------------------------------------------------------------------------

def transform3d_cost(nz: int, ny: int, nx: int, batch: int,
                     spectral: str = "dft") -> StageCost:
    """One 3D spectral transform over a (batch, nz, ny, nx) complex field.

    ``dft``: per axis an (n, n) complex matmul contraction over the whole
    volume (ops.born3d DFT-as-matmul; MXU) = 8*n*N*batch flops per axis.
    ``fft``: 5*N*log2(N) flops per volume (the classic radix-2 count;
    VPU butterflies on this target).
    """
    n_vox = nz * ny * nx
    if spectral == "dft":
        mxu = 8.0 * (nz + ny + nx) * n_vox * batch
        return StageCost(mxu, 4.0 * 2 * n_vox * batch,
                         float(2 * 2 * 4 * n_vox * batch * 3))
    flops = 5.0 * n_vox * math.log2(max(n_vox, 2)) * batch
    return StageCost(0.0, flops, float(2 * 2 * 4 * n_vox * batch * 3))


def cbs_matvec_cost(nz: int, ny: int, nx: int, batch: int,
                    spectral: str = "dft") -> StageCost:
    """One CBS/GMRES operator application: forward + inverse 3D transform
    plus the elementwise Green's-function multiply and scattering-potential
    update (~30 real ops/voxel/RHS)."""
    t = transform3d_cost(nz, ny, nx, batch, spectral)
    n = nz * ny * nx * batch
    return t.scale(2.0) + StageCost(0.0, 30.0 * n, float(2 * 2 * 4 * n))


def gmres_cbs_solve_cost(nz: int, ny: int, nx: int, batch: int,
                         n_matvecs: int, restart: int = 8,
                         spectral: str = "dft") -> StageCost:
    """A GMRES-accelerated CBS solve: ``n_matvecs`` operator applications
    plus modified-Gram-Schmidt orthogonalization (~restart/2 basis dots
    per matvec, each 8 flops/voxel/RHS, reading the stored basis)."""
    mv = cbs_matvec_cost(nz, ny, nx, batch, spectral)
    n = nz * ny * nx * batch
    ortho_per_mv = StageCost(0.0, 8.0 * n * (restart / 2 + 1),
                             float(2 * 4 * n * (restart / 2 + 1)))
    return (mv + ortho_per_mv).scale(float(n_matvecs))


# ---------------------------------------------------------------------------
# Roofline accounting
# ---------------------------------------------------------------------------

def roofline(cost: StageCost, time_s: float, precision: str = "highest",
             chip: ChipSpec = V5E) -> dict:
    """Convert a (cost, measured time) pair into utilization numbers.

    Returns a dict with:
        tflops: achieved algorithmic TFLOP/s (cost.flops / time).
        mfu: fraction of the chip's raw bf16 peak (standard MFU — for
            HIGHEST-precision matmuls the hardware runs 6 passes, so the
            MFU ceiling of a HIGHEST kernel is ~1/6).
        mfu_precision_adjusted: fraction of the precision-adjusted peak
            (bf16 peak / passes) — how close the kernel is to the best
            possible at its numerical precision, counting MXU flops only.
        gbs: achieved HBM GB/s; hbm_frac: fraction of HBM peak.
        bound: the named binding constraint — "mxu" / "hbm" when the
            respective utilization exceeds 50%, "balanced (mxu+hbm)" when
            both sit in the 40%+ band (e.g. the 801^2 64-RHS sweeps), else
            "latency/serial-chain" (the regime where neither engine is
            near peak because per-step issue latency or the sequential
            row recurrence dominates — the measured story at 301^2,
            PERF_NOTES rounds 1-4).
    """
    passes = PRECISION_PASSES[precision]
    tflops = cost.flops / time_s / 1e12
    mfu = cost.flops / time_s / chip.peak_bf16_flops
    mfu_adj = (cost.flops_mxu / time_s) / (chip.peak_bf16_flops / passes)
    gbs = cost.bytes_hbm / time_s / 1e9
    hbm_frac = cost.bytes_hbm / time_s / chip.hbm_bytes_per_s
    if mfu_adj >= 0.4 and hbm_frac >= 0.4:
        bound = "balanced (mxu+hbm)"
    elif mfu_adj >= 0.5 and mfu_adj >= hbm_frac:
        bound = "mxu"
    elif hbm_frac >= 0.5:
        bound = "hbm"
    else:
        bound = "latency/serial-chain"
    return {
        "flops": cost.flops,
        "tflops": tflops,
        "mfu": mfu,
        "mfu_precision_adjusted": mfu_adj,
        "gbs": gbs,
        "hbm_frac": hbm_frac,
        "bound": bound,
        "chip": chip.name,
        "precision": precision,
    }
