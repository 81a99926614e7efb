"""y-tiled fused apply vs jnp apply: the chip A/B past 704^2.

Round-5 adopt-or-reject measurement for the y-tiled fused operator-apply
kernel (ops/pallas_stencil.py::h_apply_tiled_cpx). The whole-field fused
kernel's measured VMEM ceiling is 704^2 (fused_apply_fits), so before
this kernel the 801^2+ refinement passes and GMRES matvecs fell back to
the jnp apply. The hypothesis going in — that the jnp apply materializes
nine shifted copies per component (~9x one-pass traffic) — was DISPROVED
by this measurement: XLA fuses it into one streamed pass, so the Pallas
kernels win on lane-alignment efficiency at misaligned (odd production)
widths, not on bytes. utils.flops.h_apply_cost now prices both forms
identically (the hypothetical 9-copy bound survives as
materialized=True); the PERF_NOTES round-5 ledger entry has the outcome
and the empirical auto gate it produced.

Two modes (results print incrementally as JSON lines):

  standalone:  python examples/tiled_apply_ab.py 736 801 1024
      per scale, min-of-N apply timings for the jnp apply vs the y-tiled
      kernel (vs the whole-field kernel too at <= 704^2), rtt subtracted,
      plus parity (max |tiled - jnp| / max |jnp|).

  end-to-end:  python examples/tiled_apply_ab.py --e2e
      the 801^2 production solve recipe (factor_precision="default",
      refine=2, 64 RHS; PERF_NOTES round 3) with a prebuilt factor:
      refined-solve time at fused_apply "off" vs "auto" (-> tiled at
      801^2), plus true relative residual for both.

Reference context: solve_helmholtz.py:85-93 is the host-side scaling
wall this path replaces; the 801^2 grid is the reference's own synthesis
scale (SimulateData.m:8-11).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

RHS_PER_SCALE = {512: 64, 704: 64, 736: 64, 801: 64, 1024: 16, 1201: 16}


def _sync(x):
    """device_get a tiny slice (block_until_ready is a no-op on the
    targeted runtime; see .claude/skills/verify)."""
    np.asarray(jax.device_get(x))


def measure_rtt():
    one = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    _sync(f(one)[0, :1])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(f(one)[0, :1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _time_min(fn, sync_of, n=5):
    best = float("inf")
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        _sync(sync_of(out))
        best = min(best, time.perf_counter() - t0)
    return best, out


def standalone(n: int):
    from waveforminversionust_tpu import Grid2D, SolverConfig
    from waveforminversionust_tpu.models.phantom import smooth_blob_phantom
    from waveforminversionust_tpu.ops import cpx
    from waveforminversionust_tpu.ops.pallas_stencil import (
        fused_apply_fits, h_apply_pallas_cpx, h_apply_tiled_cpx, _tile_rows)
    from waveforminversionust_tpu.ops.split_engine import (
        h_apply_cpx, helmholtz_coefficients_cpx)

    nrhs = RHS_PER_SCALE.get(n, 64)
    dx = 240e-3 / (n - 1)
    grid = Grid2D.centered(120e-3, dx)
    assert grid.shape == (n, n)
    vel = smooth_blob_phantom(grid, radius=40e-3, dc=60)
    cfg = SolverConfig()
    coeffs = jax.jit(lambda v: helmholtz_coefficients_cpx(
        v, grid, 350e3, cfg.pml, cfg.stencil))(vel)
    _sync(coeffs.re[0, 0, :4])

    rng = np.random.default_rng(0)
    u = cpx.Cpx(jnp.asarray(rng.standard_normal((nrhs, n, n)), jnp.float32),
                jnp.asarray(rng.standard_normal((nrhs, n, n)), jnp.float32))
    u = jax.device_put(u)
    _sync(u.re[0, 0, :4])

    rtt = measure_rtt()
    rec = {"scale": n, "nrhs": nrhs, "rtt_ms": round(rtt * 1e3, 1),
           "tile_rows": _tile_rows(n, n)}

    jnp_apply = jax.jit(lambda c, x: h_apply_cpx(c, x))
    tiled = jax.jit(lambda c, x: h_apply_tiled_cpx(c, x))

    t_jnp, out_jnp = _time_min(lambda: jnp_apply(coeffs, u),
                               lambda o: o.re[0, 0, :4])
    rec["jnp_ms"] = round((t_jnp - rtt) * 1e3, 2)

    t_tiled, out_tiled = _time_min(lambda: tiled(coeffs, u),
                                   lambda o: o.re[0, 0, :4])
    rec["tiled_ms"] = round((t_tiled - rtt) * 1e3, 2)

    # Parity on the chip (tests pin interpret mode; this pins the real
    # Mosaic lowering).
    dmax = jax.jit(lambda a, b: jnp.maximum(
        jnp.max(jnp.abs(a.re - b.re)), jnp.max(jnp.abs(a.im - b.im))))
    ref = jax.jit(lambda o: jnp.maximum(jnp.max(jnp.abs(o.re)),
                                        jnp.max(jnp.abs(o.im))))
    rec["tiled_rel_err"] = float(np.asarray(jax.device_get(
        dmax(out_tiled, out_jnp) / ref(out_jnp))))

    if fused_apply_fits(n, n):
        whole = jax.jit(lambda c, x: h_apply_pallas_cpx(c, x))
        t_whole, out_whole = _time_min(lambda: whole(coeffs, u),
                                       lambda o: o.re[0, 0, :4])
        rec["whole_ms"] = round((t_whole - rtt) * 1e3, 2)
        rec["whole_rel_err"] = float(np.asarray(jax.device_get(
            dmax(out_whole, out_jnp) / ref(out_jnp))))

    rec["tiled_speedup_vs_jnp"] = round(
        rec["jnp_ms"] / rec["tiled_ms"], 2) if rec["tiled_ms"] > 0 else None
    print(json.dumps(rec), flush=True)


def e2e(n: int = 801):
    import dataclasses

    from waveforminversionust_tpu import Grid2D, SolverConfig
    from waveforminversionust_tpu.models.phantom import smooth_blob_phantom
    from waveforminversionust_tpu.ops import cpx
    from waveforminversionust_tpu.ops.solve import (helmholtz_operator_solve,
                                                    make_helmholtz_operator)
    from waveforminversionust_tpu.ops.split_engine import h_apply_cpx

    nrhs = RHS_PER_SCALE.get(n, 64)
    dx = 240e-3 / (n - 1)
    grid = Grid2D.centered(120e-3, dx)
    vel = smooth_blob_phantom(grid, radius=40e-3, dc=60)

    rng = np.random.default_rng(0)
    src = np.zeros((nrhs, n, n), np.complex64)
    for i in range(nrhs):
        src[i, rng.integers(150, n - 150), rng.integers(150, n - 150)] = 1.0
    src = jax.device_put(cpx.of(src))
    _sync(src.re[0, 0, :4])

    base = SolverConfig(split_complex=True, factor_precision="default",
                        refine=2)
    op = make_helmholtz_operator(vel, 350e3, grid, base)
    _sync(op.factor.g_pad.re[0, 0, :4])
    rtt = measure_rtt()

    for mode in ("off", "auto"):
        cfg = dataclasses.replace(base, fused_apply=mode)
        # op must be a jit ARGUMENT: as a closure constant its ~4.5 GB
        # factor would be serialized into the program and shipped to the
        # remote compiler (~6 MB/s through the relay).
        sv = jax.jit(lambda o, s: helmholtz_operator_solve(o, s, grid, cfg))
        t, u = _time_min(lambda: sv(op, src), lambda x: x.re[0, 0, :4])
        def relres(c, x, s, d):
            r = h_apply_cpx(c, x)
            num = jnp.sqrt(jnp.sum((r.re - s.re * d) ** 2
                                   + (r.im - s.im * d) ** 2))
            den = jnp.sqrt(jnp.sum((s.re * d) ** 2 + (s.im * d) ** 2))
            return num / den
        rr = jax.jit(relres)(op.coeffs, u, src, op.d_map)
        print(json.dumps({
            "e2e": f"{n}^2 refined solve ({nrhs} RHS), fused_apply={mode}",
            "solve_ms": round((t - rtt) * 1e3, 1),
            "rel_residual": float(np.asarray(jax.device_get(rr))),
        }), flush=True)


def main():
    args = sys.argv[1:]
    scales = [int(a) for a in args if a.isdigit()]
    for n in scales:
        standalone(n)
    if "--e2e" in args or not args:
        e2e()


if __name__ == "__main__":
    main()
