"""BB curvature-scalar step vs linearized line search: the chip A/B.

Round-5 adopt-or-reject measurement for `FWIConfig(step_size=
StepSizeFormula.BB)` — the quadratic-model step with the BB2
inverse-curvature scalar, which skips the third Helmholtz solve per CG
iteration (the linearized forward on the search direction; reference:
FrequencyDomainFWI.m:149-172) whenever the curvature estimate is valid.
Bench configuration (RecordedData.mat, 301^2, 256 tx, 10 CG iterations,
frozen-factor K=2): s/iter (min of 3) + reconstruction RMSE + loss
trajectory for each formula.

Run: python examples/bb_ab.py   (TPU, ~6 min incl. compiles)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from waveforminversionust_tpu import (AcquisitionConfig, FWIConfig,
                                          SolverConfig, StepSizeFormula)
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
    solver = SolverConfig(split_complex=split, refactor_every=2 if split else 1)
    # Bench parity start (c_init=1480, the reference's own constant); pass
    # --c0 1500 to probe from a better background instead.
    c0 = 1480.0
    if "--c0" in sys.argv:
        c0 = float(sys.argv[sys.argv.index("--c0") + 1])
    vel0 = jnp.full(grid.shape, c0, jnp.float32)
    true_grid = Grid2D.from_arrays(ds.x, ds.y)

    for name, step in (("residual", StepSizeFormula.RESIDUAL),
                       ("bb", StepSizeFormula.BB)):
        fwi = FWIConfig(num_iterations=10, step_size=step)

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
            assert np.all(np.isfinite(loss)), loss
        rmse = float(reconstruction_rmse(
            np.asarray(jax.device_get(r.velocity)), grid, ds.c, true_grid))
        print(json.dumps({
            "step_size": name,
            "sec_per_iter": round(best / 10, 4),
            "rmse_m_s": round(rmse, 2),
            "loss_first_last": [float(loss[0]), float(loss[-1])],
            "monotone": bool(np.all(np.diff(loss) <= 0)),
        }), flush=True)


if __name__ == "__main__":
    main()
