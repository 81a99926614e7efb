"""FLOP/roofline model (utils.flops): internal consistency, scaling laws,
and a cross-check of the MXU matmul counts against XLA's own cost analysis
for an equivalent contraction (the model must price the dominant terms the
way the compiler does)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveforminversionust_tpu.utils.flops import (
    V5E, PRECISION_PASSES, StageCost, cbs_matvec_cost, coefficient_cost,
    factor_cost, fwi_iteration_cost, gmres_cbs_solve_cost, h_apply_cost,
    roofline, solve_cost, transform3d_cost)


def test_factor_scaling_cubic_in_nx_linear_in_ny():
    """Factor MXU flops ~ 8 * ny * nxp^3 (the rank-bk update term)."""
    c1 = factor_cost(301, 301)
    c2 = factor_cost(602, 301)
    assert c2.flops_mxu == pytest.approx(2 * c1.flops_mxu)
    # nx 256 -> 512 at bk=64: nxp exactly doubles, the dominant rank-bk
    # update term ~8x; the thin-panel matmuls (16*bk*nxp^2/row, a real
    # ~40% of the total at nxp=256) grow only 4x, landing the mix at ~6.7.
    a, b = factor_cost(64, 256), factor_cost(64, 512)
    ratio = b.flops_mxu / a.flops_mxu
    assert 6.0 < ratio < 8.0, ratio
    # dominant + thin-panel terms: 8*ny*nxp^3 + 16*bk*ny*nxp^2 exactly.
    nxp = 320  # 301 padded to bk=64
    assert c1.flops_mxu == pytest.approx(
        301 * (8 * nxp ** 3 + 16 * 64 * nxp ** 2))


def test_solve_scaling_linear_in_batch():
    c64 = solve_cost(301, 301, 64)
    c256 = solve_cost(301, 301, 256)
    assert c256.flops_mxu == pytest.approx(4 * c64.flops_mxu)
    # G is re-read once per sweep regardless of batch.
    nxp = 320
    assert c64.bytes_hbm >= 2 * 301 * 2 * 4 * nxp * nxp


def test_solve_mxu_matches_xla_cost_analysis():
    """The sweep model's per-row contraction (complex (batch, n) @ (n, n)
    as 4 real dots) must price like XLA's cost analysis of the same
    einsum to within the pad factor."""
    n, batch = 128, 32  # no padding at bk=64

    def sweeps(g_re, g_im, z_re, z_im):
        # one forward+backward sweep pair = 2 complex gemms per row
        def gemm(zr, zi):
            return (zr @ g_re - zi @ g_im, zr @ g_im + zi @ g_re)
        r1 = gemm(z_re, z_im)
        r2 = gemm(*r1)
        return r2

    g = np.zeros((n, n), np.float32)
    z = np.zeros((batch, n), np.float32)
    cost = jax.jit(sweeps).lower(g, g, z, z).compile().cost_analysis()
    xla_flops = cost["flops"]
    model = solve_cost(ny=1, nx=n, batch=batch)
    # model counts 2 sweeps/row incl. the tridiagonal matvec; XLA counts
    # the 8 real dots + combines. Same order, within 30%.
    assert model.flops_mxu == pytest.approx(xla_flops, rel=0.3)


def test_h_apply_traffic_model():
    """XLA fuses the jnp apply into one streamed pass (measured, round 5),
    so jnp and Pallas forms price identical bytes; the hypothetical
    materialized 9-copy bound stays ~8x above for the what-if ratio."""
    jnp_cost = h_apply_cost(301, 301, 256, fused=False)
    fused = h_apply_cost(301, 301, 256, fused=True)
    assert jnp_cost.flops_vpu == fused.flops_vpu  # same math
    assert jnp_cost.bytes_hbm == fused.bytes_hbm  # both one-pass (measured)
    mat = h_apply_cost(301, 301, 256, materialized=True)
    assert mat.bytes_hbm > 8 * fused.bytes_hbm  # 9 copies vs 1 stream


def test_fwi_iteration_composition():
    base = fwi_iteration_cost(301, 301, 256)
    frozen = fwi_iteration_cost(301, 301, 256, refactor_every=2)
    # K=2 saves half the factor but pays refinement on stale iterations.
    saved = factor_cost(301, 301).flops / 2
    paid = (h_apply_cost(301, 301, 256) + solve_cost(301, 301, 256)).flops
    assert frozen.flops == pytest.approx(base.flops - saved + paid, rel=1e-6)
    # components sum to the total
    assert base.flops >= (factor_cost(301, 301).flops
                          + 3 * solve_cost(301, 301, 256).flops)


def test_transform3d_dft_vs_fft():
    dft = transform3d_cost(64, 64, 64, 16, "dft")
    fft = transform3d_cost(64, 64, 64, 16, "fft")
    # DFT-as-matmul is O(n^4)-class, FFT O(n^3 log n): at 64^3 the DFT
    # does ~10x the algorithmic flops (and still wins on wall clock on the
    # MXU — PERF_NOTES round 3).
    assert dft.flops > 5 * fft.flops
    assert dft.flops_mxu == pytest.approx(8 * 3 * 64 * 64 ** 3 * 16)
    mv = cbs_matvec_cost(64, 64, 64, 16, "dft")
    assert mv.flops > 2 * dft.flops  # two transforms + elementwise
    sol = gmres_cbs_solve_cost(64, 64, 64, 16, n_matvecs=126)
    assert sol.flops == pytest.approx(126 * sol.scale(1 / 126).flops)


def test_roofline_classification():
    # A kernel at 80% of the HIGHEST-adjusted MXU peak: mxu-bound.
    c = StageCost(flops_mxu=1e12, flops_vpu=0.0, bytes_hbm=1e6)
    t = 1e12 / (0.8 * V5E.peak_bf16_flops / 6)
    r = roofline(c, t, precision="highest")
    assert r["bound"] == "mxu"
    assert r["mfu_precision_adjusted"] == pytest.approx(0.8)
    assert r["mfu"] == pytest.approx(0.8 / 6)
    # A stream at 90% of HBM: hbm-bound.
    c2 = StageCost(0.0, 1e9, bytes_hbm=0.9 * V5E.hbm_bytes_per_s)
    r2 = roofline(c2, 1.0, precision="default")
    assert r2["bound"] == "hbm"
    # Both engines in the 40%+ band: the balanced near-roofline regime
    # (the 801^2 64-RHS HIGHEST sweeps land here).
    c4 = StageCost(0.45 * V5E.peak_bf16_flops / 6, 0.0,
                   bytes_hbm=0.45 * V5E.hbm_bytes_per_s)
    assert roofline(c4, 1.0)["bound"] == "balanced (mxu+hbm)"
    # Both engines far from peak: the latency/serial-chain regime.
    c3 = StageCost(1e9, 1e9, 1e6)
    r3 = roofline(c3, 1.0)
    assert r3["bound"] == "latency/serial-chain"
    assert r3["tflops"] == pytest.approx(2e-3)
    assert PRECISION_PASSES["highest"] == 6


def test_coefficient_cost_positive():
    c = coefficient_cost(301, 301)
    assert c.flops > 0 and c.bytes_hbm > 0 and c.flops_mxu == 0
