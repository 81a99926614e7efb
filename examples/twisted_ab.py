"""Twisted (two-sided) vs block-Thomas direct engine: the chip A/B.

Round-5 adopt-or-reject measurement for `SolverConfig(factorization=
"twisted")` (ops/twisted.py + ops/pallas_twisted.py), the lever aimed at
the "latency/serial-chain" bound the roofline table names for the
production 2D iteration: both the factorization and each solve sweep
eliminate from the two grid ends at once, so the dependent grid-step
chain halves (factor ny -> ~ny/2 steps; solve 2ny -> ~ny total sweep
steps) at identical algorithmic flops.

Two modes (composable; results print incrementally as JSON lines):

  standalone:  python examples/twisted_ab.py 301 601 801 1024
      per scale, min-of-N interleaved factor + 256/64/16-RHS solve
      timings for both engines (relay rtt measured and reported; solve
      at HIGHEST and DEFAULT sweep precision) + residual parity.

  end-to-end:  python examples/twisted_ab.py --e2e
      the bench.py workload (RecordedData.mat, 301^2, 256 tx, 10 CG
      iterations) at factorization {auto, twisted} x refactor_every
      {1, 2}: s/iter (min of 3) + reconstruction RMSE — including the
      twisted x frozen-factor composition (round-5 verdict item 6).

Reference context: these engines replace the reference's host SuperLU
multi-RHS direct solve (solve_helmholtz.py:85-93; solveHelmholtz.m:
128-137); the serial-chain latency is this framework's analog of the
reference's host factorization wall.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

RHS_PER_SCALE = {301: 256, 601: 256, 801: 64, 1024: 16}


def _sync(x):
    """device_get a tiny real slice (block_until_ready is a no-op on the
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


def _time_min(fn, sync_of, n=3):
    best = float("inf")
    out = None
    for _ in range(n):
        out = None  # drop the previous result BEFORE allocating the next
        # (two live 1024^2 factors = 2 x 8.6 GB would exhaust HBM)
        t0 = time.perf_counter()
        out = fn()
        _sync(sync_of(out))
        best = min(best, time.perf_counter() - t0)
    return best, out


def standalone(n: int):
    from waveforminversionust_tpu import Grid2D, SolverConfig
    from waveforminversionust_tpu.models.phantom import smooth_blob_phantom
    from waveforminversionust_tpu.ops import cpx
    from waveforminversionust_tpu.ops.pallas_factor import banded_factor_pallas
    from waveforminversionust_tpu.ops.pallas_sweep import banded_solve_pallas
    from waveforminversionust_tpu.ops.pallas_twisted import (
        twisted_factor_pallas, twisted_solve_pallas)
    from waveforminversionust_tpu.ops.split_engine import (
        h_apply_cpx, helmholtz_coefficients_cpx)

    HI = jax.lax.Precision.HIGHEST
    DEF = jax.lax.Precision.DEFAULT
    nrhs = RHS_PER_SCALE[n]
    # Production factor precision per PERF_NOTES: HIGHEST in-loop at
    # 301/601, DEFAULT (+refine outside this probe) at 801/1024.
    fprec = HI if n <= 601 else DEF

    dx = 240e-3 / (n - 1)
    grid = Grid2D.centered(120e-3, dx)
    assert grid.shape == (n, n)
    vel = smooth_blob_phantom(grid, radius=40e-3, dc=60)
    cfg = SolverConfig()
    coeffs = jax.jit(lambda v: helmholtz_coefficients_cpx(
        v, grid, 350e3, cfg.pml, cfg.stencil))(vel)
    _sync(coeffs.re[0, 0, :4])

    rng = np.random.default_rng(0)
    src = (rng.standard_normal((nrhs, n, n)).astype(np.float32),
           rng.standard_normal((nrhs, n, n)).astype(np.float32))
    rhs = jax.device_put(cpx.Cpx(jnp.asarray(src[0]), jnp.asarray(src[1])))
    _sync(rhs.re[0, 0, :4])

    fac_thomas = jax.jit(lambda c: banded_factor_pallas(
        c, panel_precision=fprec))
    fac_twisted = jax.jit(lambda c: twisted_factor_pallas(
        c, panel_precision=fprec))

    def solver(solve_fn, prec):
        return jax.jit(lambda f, b: solve_fn(f, b, precision=prec))

    rtt = measure_rtt()
    rec = {"scale": n, "nrhs": nrhs, "rtt_ms": round(rtt * 1e3, 1),
           "factor_precision": "highest" if fprec is HI else "default"}

    interleave = n <= 801  # both factors resident: 2x ~8.6 GB at 1024^2
    results = {}
    engines = [("thomas", fac_thomas, banded_solve_pallas),
               ("twisted", fac_twisted, twisted_solve_pallas)]

    apply_op = jax.jit(lambda c, x: h_apply_cpx(c, x))

    def _fac_probe(f):
        gd = getattr(f, "g_down", None)
        return gd.re[0, 0, :4] if gd is not None else f.g_pad.re[0, 0, :4]

    def run_engine(name, fac_fn, solve_fn, keep=True):
        t_fac, fac = _time_min(lambda: fac_fn(coeffs), _fac_probe)
        for pname, prec in (("hi", HI), ("def", DEF)):
            sv = solver(solve_fn, prec)
            t_sv, x = _time_min(lambda: sv(fac, rhs),
                                lambda x: x.re[0, 0, :4])
            results[f"{name}_solve_{pname}_ms"] = round(
                (t_sv - rtt) * 1e3, 1)
            if pname == "hi":
                r = apply_op(coeffs, x)
                num = jnp.sqrt(jnp.sum((r.re - rhs.re) ** 2
                                       + (r.im - rhs.im) ** 2))
                den = jnp.sqrt(jnp.sum(rhs.re ** 2 + rhs.im ** 2))
                results[f"{name}_relres"] = float(
                    np.asarray(jax.device_get(num / den)))
        results[f"{name}_factor_ms"] = round((t_fac - rtt) * 1e3, 1)
        print(f"# {n}^2 {name}: factor {results[f'{name}_factor_ms']} ms, "
              f"solve hi {results[f'{name}_solve_hi_ms']} / def "
              f"{results[f'{name}_solve_def_ms']} ms, relres "
              f"{results[f'{name}_relres']:.2e}", flush=True)
        return fac if keep else None

    import gc
    for name, ffn, sfn in engines:
        run_engine(name, ffn, sfn, keep=False)
        if not interleave:  # at 1024^2 both factors cannot be resident
            gc.collect()

    rec.update(results)
    for p in ("hi", "def"):
        a, b = results[f"thomas_solve_{p}_ms"], results[f"twisted_solve_{p}_ms"]
        rec[f"solve_{p}_speedup"] = round(a / b, 2) if b > 0 else None
    rec["factor_speedup"] = round(
        results["thomas_factor_ms"] / results["twisted_factor_ms"], 2)
    print(json.dumps(rec), flush=True)


def e2e():
    import dataclasses

    from waveforminversionust_tpu import (AcquisitionConfig, FWIConfig,
                                          SolverConfig)
    from waveforminversionust_tpu.data.matio import load_recorded_dataset
    from waveforminversionust_tpu.fwi.objective import build_fwi_data
    from waveforminversionust_tpu.fwi.optimizers import nonlinear_cg
    from waveforminversionust_tpu.fwi.runner import (default_inversion_grid,
                                                     reconstruction_rmse)
    from waveforminversionust_tpu.models.acquisition import \
        build_ring_acquisition
    from waveforminversionust_tpu.models.grid import Grid2D

    ds = load_recorded_dataset(
        "/root/reference/Lecture19_Fwi/RecordedData.mat")
    grid = default_inversion_grid()
    acq = build_ring_acquisition(grid, AcquisitionConfig(),
                                 x_elem=ds.x_circ, y_elem=ds.y_circ)
    split = jax.devices()[0].platform != "cpu"
    data = build_fwi_data(acq, ds.rec_data, ds.f, split=split)
    fwi = FWIConfig(num_iterations=10)
    vel0 = jnp.full(grid.shape, fwi.c_init, jnp.float32)
    true_grid = Grid2D.from_arrays(ds.x, ds.y)

    configs = [(fz, K) for fz in ("auto", "twisted") for K in (1, 2)]
    for fz, K in configs:
        solver = SolverConfig(split_complex=split, factorization=fz,
                              refactor_every=K)

        def run():
            r = nonlinear_cg(vel0, data, grid, solver, fwi,
                             num_iterations=10)
            loss = np.asarray(jax.device_get(r.metrics.loss))
            return r, loss

        run()  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r, loss = run()
            best = min(best, time.perf_counter() - t0)
            assert np.all(np.isfinite(loss)) and loss[-1] < loss[0], loss
        rmse = float(reconstruction_rmse(
            np.asarray(jax.device_get(r.velocity)), grid, ds.c, true_grid))
        print(json.dumps({
            "e2e": f"factorization={fz} K={K}",
            "sec_per_iter": round(best / 10, 4),
            "rmse_m_s": round(rmse, 2),
            "final_loss": float(loss[-1]),
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
