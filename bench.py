"""Headline benchmark: the reference workload on one TPU chip.

Workload (BASELINE.md): 10 nonlinear-CG FWI iterations, 256 transmit
elements (63 receivers excluded per tx -> 193 active), 301x301 grid at
0.8 mm, single frequency 350 kHz, RecordedData.mat acquisition. Reference
baseline: MATLAB 52.42 s total = 5.242 s/iteration on an M4 Pro CPU
(FinalPresentation.pdf obj 103); each iteration does three 90,601-unknown
multi-RHS Helmholtz solves.

Prints ONE JSON line carrying the full scorecard:
  * sec/FWI-iteration and the speedup vs the MATLAB baseline
    (vs_baseline > 1 means faster than the reference);
  * reconstruction quality: RMSE [m/s] of the 10-iteration result against
    the dataset's 801^2 true map inside the ring, asserted <= 15.5 (the
    demonstrated 14.86-15.09 band + noise margin) — a perf change that
    silently degrades reconstruction turns this artifact red;
  * intake-chain quality (rmse_intake_m_s): reciprocity compensation +
    calibrated background speed + bilinear receivers + illumination
    preconditioning, asserted <= 6.0 (demonstrated record: 4.19 m/s) —
    a regression in QC/calibration/receiver-model code turns this red;
  * roofline accounting (utils.flops): algorithmic TFLOP/s, MFU vs the
    v5e bf16 peak, achieved HBM GB/s, and the named binding constraint —
    the absolute-utilization story the wall-clock number alone can't tell;
  * 3D datapoints: cold and warm-started sec/CG-iteration of the
    volumetric 64^3 / 16-tx / 300 kHz GMRES-CBS inversion (the 3D
    production solver), with TFLOP/s from the measured matvec count.

Every phase runs under its own try/except with ONE retry (round-5
verdict item 2): a transient relay fault (e.g. "remote_compile: read
body" seen in BENCH_r04) can no longer drop metrics whose computation
did not actually fail; a phase that fails twice records
``<phase>_error`` and the remaining phases still run.
"""

import json
import os
import time

import numpy as np

BASELINE_SEC_PER_ITER = 52.42 / 10  # MATLAB, 10 iterations (BASELINE.md)
REFERENCE_DATA = "/root/reference/Lecture19_Fwi/RecordedData.mat"
N_ITER = 10
# Demonstrated reconstruction band over rounds 3-5: 14.86-15.09 m/s; the
# gate sits just above the noise band so a ~1 m/s silent regression
# (previous gate: 16.0) now turns the artifact red.
RMSE_GATE_M_S = 15.5
# Intake-chain record: 4.19-4.20 m/s (PERF_NOTES rounds 3-4); 5.07-5.51
# under 40-20 dB noise. Gate at 6.0 per the round-5 verdict.
RMSE_INTAKE_GATE_M_S = 6.0


def _phase(record, name, fn, retries=1):
    """Run one bench phase; on failure retry once (transient relay faults),
    then record the error without losing the other phases' metrics."""
    for attempt in range(retries + 1):
        try:
            fn()
            record.pop(f"{name}_error", None)
            return True
        except Exception as e:  # noqa: BLE001 — record, don't lose artifact
            record[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
            if attempt < retries:
                time.sleep(5.0)
    return False


def _load_or_synthesize():
    from waveforminversionust_tpu import (AcquisitionConfig, Grid2D,
                                          SolverConfig)
    from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
    from waveforminversionust_tpu.models.phantom import breast_phantom
    from waveforminversionust_tpu.ops.solve import auto_split

    if os.path.exists(REFERENCE_DATA):
        from waveforminversionust_tpu.data.matio import load_recorded_dataset
        return load_recorded_dataset(REFERENCE_DATA)
    # Fallback: synthesize an equivalent dataset (same ring, 0.6 mm grid).
    fine = Grid2D.centered(120e-3, 0.6e-3)
    vel = breast_phantom(fine)
    return synthesize_ring_dataset(vel, fine, AcquisitionConfig(), f=350e3,
                                   solver=auto_split(SolverConfig()), seed=0)


def bench_2d(record):
    import jax
    import jax.numpy as jnp

    from waveforminversionust_tpu import FWIConfig, SolverConfig
    from waveforminversionust_tpu.fwi.objective import build_fwi_data
    from waveforminversionust_tpu.fwi.optimizers import nonlinear_cg
    from waveforminversionust_tpu.fwi.runner import (default_inversion_grid,
                                                     reconstruction_rmse)
    from waveforminversionust_tpu.models.acquisition import build_ring_acquisition
    from waveforminversionust_tpu.models.grid import Grid2D
    from waveforminversionust_tpu.utils.flops import (fwi_iteration_cost,
                                                      roofline)
    from waveforminversionust_tpu import AcquisitionConfig

    ds = _load_or_synthesize()
    grid = default_inversion_grid()
    acq = build_ring_acquisition(grid, AcquisitionConfig(),
                                 x_elem=ds.x_circ, y_elem=ds.y_circ)
    # Split-complex engine on TPU (the targeted runtime supports complex64
    # only for a few compute ops; see waveforminversionust_tpu.ops.cpx).
    split = jax.devices()[0].platform != "cpu"
    data = build_fwi_data(acq, ds.rec_data, ds.f, split=split)
    # Production-tuned configuration (PERF_NOTES rounds 3-5): frozen-factor
    # CG at K=2 — factorize every other iteration, one refinement pass
    # against the current operator on stale iterations. Measured on this
    # workload: 0.0502 vs 0.0538 s/iter, reconstruction RMSE 14.95 vs
    # 15.09 m/s (noise band), loss monotone; K>=3 loses monotonicity.
    # The asserts below keep the bench honest about convergence AND
    # reconstruction quality.
    refactor_every = 2 if split else 1
    solver = SolverConfig(split_complex=split, refactor_every=refactor_every)
    fwi = FWIConfig(num_iterations=N_ITER)
    vel0 = jnp.full(grid.shape, fwi.c_init, jnp.float32)

    # Warm-up / compile. NOTE: on the axon runtime block_until_ready does not
    # actually synchronize, so every timing span ends with a device_get of a
    # small real array, which does.
    def run_and_sync():
        r = nonlinear_cg(vel0, data, grid, solver, fwi, num_iterations=N_ITER)
        loss = np.asarray(jax.device_get(r.metrics.loss))
        return r, loss

    run_and_sync()

    # Min of 3 timed runs: the relay/tunnel to the TPU adds multi-ms
    # jitter per dispatch, and min (not mean) is the standard estimator
    # for the machine's actual capability under one-sided noise.
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r, loss = run_and_sync()
        elapsed = min(elapsed, time.perf_counter() - t0)
        assert np.all(np.isfinite(loss)) and loss[-1] < loss[0], loss

    sec_per_iter = elapsed / N_ITER

    # Quality gate: score the final model against the dataset's 801^2 true
    # map (scale-matched resampling inside the ring). Nearly free — the
    # timed runs already produced the reconstruction.
    true_grid = Grid2D.from_arrays(ds.x, ds.y)
    rmse = float(reconstruction_rmse(np.asarray(jax.device_get(r.velocity)),
                                     grid, ds.c, true_grid))
    assert rmse <= RMSE_GATE_M_S, (
        f"reconstruction RMSE {rmse:.2f} m/s exceeds the {RMSE_GATE_M_S} "
        f"regression gate — a perf change degraded quality")

    # Roofline accounting (utils.flops): algorithmic flops of the executed
    # iteration (padded kernel shapes, K-amortized factor + refinement).
    ntx = int(np.asarray(ds.rec_data).shape[0])
    cost = fwi_iteration_cost(grid.ny, grid.nx, ntx,
                              refactor_every=refactor_every)
    # Production sweeps run DEFAULT precision (fast_* flags), the factor
    # HIGHEST; report vs the raw bf16 peak (standard MFU) — the honest
    # classification at this scale is latency/serial-chain-bound either
    # way (PERF_NOTES round-4 MFU table has the per-stage split).
    rl = roofline(cost, sec_per_iter, precision="default")

    record.update({
        "metric": "sec_per_fwi_iteration_301x301_256tx_350kHz",
        "value": round(sec_per_iter, 4),
        "unit": "s/iteration",
        "vs_baseline": round(BASELINE_SEC_PER_ITER / sec_per_iter, 2),
        "rmse_m_s": round(rmse, 2),
        "rmse_gate_m_s": RMSE_GATE_M_S,
        "gflop_per_iteration": round(cost.flops / 1e9, 1),
        "tflops": round(rl["tflops"], 2),
        "mfu": round(rl["mfu"], 4),
        "hbm_gbs": round(rl["gbs"], 1),
        "bound": rl["bound"],
        "chip_model": rl["chip"],
    })


def bench_intake(record):
    """Quality record under driver tracking (round-5 verdict item 5): the
    full intake chain — reciprocity QC compensation + calibrated
    background speed + bilinear receivers + illumination preconditioning —
    on the reference dataset, 10 CG iterations. A regression in any intake
    component (qc, calibrate, bilinear weights, illumination) turns this
    phase red. Demonstrated record: 4.19-4.20 m/s (PERF_NOTES)."""
    import dataclasses

    import jax

    from waveforminversionust_tpu import (AcquisitionConfig, FWIConfig,
                                          Grid2D, calibrate_background_speed)
    from waveforminversionust_tpu.data.qc import (compensate_reciprocity,
                                                  qc_report)
    from waveforminversionust_tpu.fwi.runner import (default_inversion_grid,
                                                     invert_dataset,
                                                     reconstruction_rmse)

    ds = _load_or_synthesize()
    rep = qc_report(ds.rec_data, exclude_each_side=31)
    ds = ds._replace(rec_data=compensate_reciprocity(ds.rec_data, rep.ratios))
    grid = default_inversion_grid()
    cal = calibrate_background_speed(
        ds, grid=grid, acquisition=AcquisitionConfig(tx_downsample=16),
        c_min=1400.0, c_max=1600.0, num=9, levels=2)
    res = invert_dataset(
        ds, grid=grid,
        acquisition=AcquisitionConfig(interpolation="bilinear"),
        fwi=FWIConfig(num_iterations=N_ITER, precondition="illumination"),
        c_init=cal.c0)
    true_grid = Grid2D.from_arrays(ds.x, ds.y)
    rmse = float(reconstruction_rmse(
        np.asarray(jax.device_get(res.velocity)), grid, ds.c, true_grid))
    assert rmse <= RMSE_INTAKE_GATE_M_S, (
        f"intake-chain RMSE {rmse:.2f} m/s exceeds the "
        f"{RMSE_INTAKE_GATE_M_S} gate (record: 4.19) — an intake component "
        f"(QC/calibration/bilinear/illumination) regressed")
    record["rmse_intake_m_s"] = round(rmse, 2)
    record["rmse_intake_gate_m_s"] = RMSE_INTAKE_GATE_M_S
    record["calibrated_c0_m_s"] = round(float(cal.c0), 2)


def bench_3d_setup(ctx, n: int = 64, d: float = 0.75e-3):
    """Shared 3D setup: 64^3 / 16-tx / 300 kHz volumetric workload
    (GMRES-CBS + DFT matmul transforms, the 3D production defaults).
    ``n``/``d`` are overridable so the smoke test can run a tiny volume on
    CPU. Fills ``ctx`` for the cold/warm timing phases."""
    import jax
    import jax.numpy as jnp

    from waveforminversionust_tpu import FWIConfig, PMLConfig
    from waveforminversionust_tpu.fwi.fwi3d import (build_fwi_data_3d,
                                                    nonlinear_cg_3d,
                                                    sample_receivers_3d)
    from waveforminversionust_tpu.models.acquisition3d import (
        build_acquisition3d, cylinder_positions, source_fields_3d)
    from waveforminversionust_tpu.models.grid3d import Grid3D
    from waveforminversionust_tpu.ops import cpx as cpxlib
    from waveforminversionust_tpu.ops.born3d import born_gmres_solve_3d

    f, c0 = 300e3, 1500.0
    grid = Grid3D(nx=n, ny=n, nz=n, dx=d, dy=d, dz=d,
                  x0=-(n - 1) * d / 2, y0=-(n - 1) * d / 2,
                  z0=-(n - 1) * d / 2)
    half = (n - 1) * d / 2
    pml = PMLConfig(a0=20.0, l_pml=8 * d)
    pos = cylinder_positions(n_rings=2, n_per_ring=8, radius=0.75 * half,
                             z_span=0.5 * half)
    acq = build_acquisition3d(grid, pos, min_angle=0.8)
    zz = grid.z0 + grid.dz * jnp.arange(grid.nz)
    yy = grid.y0 + grid.dy * jnp.arange(grid.ny)
    xx = grid.x0 + grid.dx * jnp.arange(grid.nx)
    r2 = (zz[:, None, None] ** 2 + yy[None, :, None] ** 2
          + xx[None, None, :] ** 2)
    vel_true = (c0 + 40.0 * jnp.exp(-r2 / (0.33 * half) ** 2)
                ).astype(jnp.float32)
    # One-hot-source denormal pitfall (PERF_NOTES): scale to normal range.
    src = cpxlib.scale(source_fields_3d(acq, grid), 1e6)
    spectral = "auto"

    def synth(v, s):
        return born_gmres_solve_3d(v, s, f, grid, pml, maxiter=400,
                                   tol=2e-3, restart=8, spectral=spectral)

    wv, matvecs = jax.jit(synth)(vel_true, src)
    rec_obs = sample_receivers_3d(wv, jnp.asarray(acq.rx_idx))
    matvecs = int(np.asarray(jax.device_get(matvecs)))
    data = build_fwi_data_3d(acq, rec_obs, f, grid)._replace(src=src)

    vel0 = jnp.full(grid.shape, c0, jnp.float32)
    fwi = FWIConfig(num_iterations=2,
                    clip_velocity=(c0 - 100.0, c0 + 100.0))
    # Production-tuned 3D warm configuration (PERF_NOTES round 5): BB
    # curvature-scalar step (skips the line-search solve on valid
    # iterations) + the nonmonotone watchdog (reverts truncation-floor
    # mispredictions; equal final RMSE 3.396 vs 3.406, 1.09-1.43x).
    from waveforminversionust_tpu import StepSizeFormula
    fwi_warm = FWIConfig(num_iterations=2,
                         clip_velocity=(c0 - 100.0, c0 + 100.0),
                         step_size=StepSizeFormula.BB,
                         reject_increase=1.5)

    def run_and_sync(num_it, warm):
        vel, metrics = nonlinear_cg_3d(vel0, data, grid,
                                       fwi_warm if warm else fwi, pml=pml,
                                       num_iterations=num_it,
                                       iter_cap=400, solver3d="gmres",
                                       spectral=spectral, warm_start=warm)
        loss = np.asarray(jax.device_get(metrics.loss))
        return vel, loss

    ctx.update(dict(n=n, matvecs=matvecs, ntx=src.re.shape[0],
                    run_and_sync=run_and_sync))


def bench_3d_cold(record, ctx):
    """Cold-start 3D metric (round-over-round continuity with BENCH_r03;
    also the run whose flop pricing from the synthesis-solve matvec count
    is exact — every solve is cold at the same tolerance)."""
    import jax

    from waveforminversionust_tpu.utils.flops import (gmres_cbs_solve_cost,
                                                      roofline)

    run_and_sync, n, ntx = ctx["run_and_sync"], ctx["n"], ctx["ntx"]
    n_it = 2
    run_and_sync(n_it, False)
    elapsed = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _, loss = run_and_sync(n_it, False)
        elapsed = min(elapsed, time.perf_counter() - t0)
        assert np.all(np.isfinite(loss)) and loss[-1] < loss[0], loss
    sec_per_iter = elapsed / n_it

    # Price the iteration from the MEASURED matvec count of the synthesis
    # solve (forward/adjoint/line-search solves run the same operator at
    # the same tolerance): 3 solves per CG iteration.
    on_tpu = jax.devices()[0].platform != "cpu"
    cost = gmres_cbs_solve_cost(n, n, n, ntx, n_matvecs=ctx["matvecs"],
                                spectral="dft" if on_tpu else "fft").scale(3)
    # The FWI-loop transforms run spectral_precision="auto" -> HIGH
    # (bf16x3, 3-pass; measured quality-neutral, PERF_NOTES round 5).
    rl = roofline(cost, sec_per_iter, precision="high")
    record.update({
        f"sec_per_iter_3d_{n}cube_{ntx}tx": round(sec_per_iter, 3),
        "matvecs_per_solve_3d": ctx["matvecs"],
        "tflops_3d": round(rl["tflops"], 3),
        "mfu_3d": round(rl["mfu"], 4),
        "bound_3d": rl["bound"],
    })


def bench_3d_warm(record, ctx):
    """Production steady-state: carried warm starts (each solve's field
    seeds the next iteration's GMRES x0, PERF_NOTES round 4) + the BB
    curvature-scalar step under the nonmonotone watchdog (PERF_NOTES
    round 5: line-search solves skipped on valid-curvature iterations,
    truncation-floor mispredictions reverted; equal final RMSE). Timed
    over 4 iterations so the cold first iteration doesn't dominate; no
    flop/MFU claims here — warm/BB iterations do fewer (uncounted)
    matvecs, so pricing them at the cold count would overstate
    utilization."""
    run_and_sync = ctx["run_and_sync"]
    n_warm = 4
    run_and_sync(n_warm, True)
    elapsed_w = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _, loss = run_and_sync(n_warm, True)
        elapsed_w = min(elapsed_w, time.perf_counter() - t0)
        # Progress guard, watchdog-aware: the recorded loss history shows
        # any BB misstep spike BEFORE the watchdog's revert (the model
        # itself is restored), so assert finiteness + real progress at
        # the best iterate rather than monotonicity or the last sample.
        assert np.all(np.isfinite(loss)) and np.min(loss) <= 0.5 * loss[0], loss
    record["sec_per_iter_3d_warm_start"] = round(elapsed_w / n_warm, 3)


def main():
    record = {}
    _phase(record, "bench_2d", lambda: bench_2d(record))
    if os.environ.get("BENCH_SKIP_INTAKE") != "1":
        _phase(record, "bench_intake", lambda: bench_intake(record))
    if os.environ.get("BENCH_SKIP_3D") != "1":
        ctx = {}
        if _phase(record, "bench_3d_setup", lambda: bench_3d_setup(ctx)):
            _phase(record, "bench_3d_cold", lambda: bench_3d_cold(record, ctx))
            _phase(record, "bench_3d_warm", lambda: bench_3d_warm(record, ctx))
    print(json.dumps(record))


if __name__ == "__main__":
    main()
