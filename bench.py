"""Headline benchmark: the reference workload on one TPU chip.

Workload (BASELINE.md): 10 nonlinear-CG FWI iterations, 256 transmit
elements (63 receivers excluded per tx -> 193 active), 301x301 grid at
0.8 mm, single frequency 350 kHz, RecordedData.mat acquisition. Reference
baseline: MATLAB 52.42 s total = 5.242 s/iteration on an M4 Pro CPU
(FinalPresentation.pdf obj 103); each iteration does three 90,601-unknown
multi-RHS Helmholtz solves.

Prints ONE JSON line: sec/FWI-iteration and the speedup vs the MATLAB
baseline (vs_baseline > 1 means faster than the reference).
"""

import json
import os
import time

import numpy as np

BASELINE_SEC_PER_ITER = 52.42 / 10  # MATLAB, 10 iterations (BASELINE.md)
REFERENCE_DATA = "/root/reference/Lecture19_Fwi/RecordedData.mat"
N_ITER = 10


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


def main():
    import jax
    import jax.numpy as jnp

    from waveforminversionust_tpu import FWIConfig, SolverConfig
    from waveforminversionust_tpu.fwi.objective import build_fwi_data
    from waveforminversionust_tpu.fwi.optimizers import nonlinear_cg
    from waveforminversionust_tpu.fwi.runner import default_inversion_grid
    from waveforminversionust_tpu.models.acquisition import build_ring_acquisition
    from waveforminversionust_tpu import AcquisitionConfig

    ds = _load_or_synthesize()
    grid = default_inversion_grid()
    acq = build_ring_acquisition(grid, AcquisitionConfig(),
                                 x_elem=ds.x_circ, y_elem=ds.y_circ)
    # Split-complex engine on TPU (the targeted runtime supports complex64
    # only for a few compute ops; see waveforminversionust_tpu.ops.cpx).
    split = jax.devices()[0].platform != "cpu"
    data = build_fwi_data(acq, ds.rec_data, ds.f, split=split)
    # Production-tuned configuration (PERF_NOTES round 3): frozen-factor
    # CG at K=2 — factorize every other iteration, one refinement pass
    # against the current operator on stale iterations. Measured on this
    # workload: 0.0502 vs 0.0538 s/iter, reconstruction RMSE 14.95 vs
    # 15.09 m/s (noise band), loss monotone; K>=3 loses monotonicity.
    # The assert below keeps the bench honest about convergence.
    solver = SolverConfig(split_complex=split,
                          refactor_every=2 if split else 1)
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

    print(json.dumps({
        "metric": "sec_per_fwi_iteration_301x301_256tx_350kHz",
        "value": round(sec_per_iter, 4),
        "unit": "s/iteration",
        "vs_baseline": round(BASELINE_SEC_PER_ITER / sec_per_iter, 2),
    }))


if __name__ == "__main__":
    main()
