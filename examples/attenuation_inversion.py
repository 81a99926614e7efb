"""Invert FOR the attenuation map (and optionally jointly for velocity).

The reference's physics is strictly lossless (solveHelmholtz.m builds
k = omega/c only); this framework's lossy Helmholtz solve is
differentiable in alpha, so the absorber map itself becomes an inversion
unknown: `fwi.lbfgs.run_lbfgs_attenuation` runs L-BFGS through the
custom-VJP lossy solve.

Synthesizes ring data through a Gaussian absorber in a known sound-speed
medium, then recovers alpha starting from a lossless model. ~1 minute on
CPU; runs on TPU unchanged (split engine auto-selected).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from waveforminversionust_tpu import (AcquisitionConfig, Grid2D, PMLConfig,
                                      SolverConfig)
from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
from waveforminversionust_tpu.fwi.lbfgs import run_lbfgs_attenuation
from waveforminversionust_tpu.fwi.objective import build_fwi_data
from waveforminversionust_tpu.models.acquisition import build_ring_acquisition
from waveforminversionust_tpu.ops.solve import auto_split


def main():
    f = 300e3
    c0 = 1500.0
    grid = Grid2D.centered(16e-3, 0.4e-3)            # 81 x 81
    solver = auto_split(SolverConfig(pml=PMLConfig(l_pml=3.2e-3)))
    acq_cfg = AcquisitionConfig(num_elements=16, radius=6e-3,
                                num_excluded_each_side=1)

    vel = np.full(grid.shape, c0, np.float32)        # known speed map
    yy, xx = np.meshgrid(np.arange(grid.ny) - grid.ny / 2,
                         np.arange(grid.nx) - grid.nx / 2, indexing="ij")
    alpha_true = (90.0 * np.exp(-(yy ** 2 + xx ** 2) / 8.0 ** 2)
                  ).astype(np.float32)

    ds = synthesize_ring_dataset(vel, grid, acq_cfg, f=f, solver=solver,
                                 seed=2, attenuation=alpha_true)
    acq = build_ring_acquisition(grid, acq_cfg, x_elem=ds.x_circ,
                                 y_elem=ds.y_circ)
    data = build_fwi_data(acq, ds.rec_data, f, split=solver.split_complex)

    res = run_lbfgs_attenuation(vel, np.zeros(grid.shape, np.float32), data,
                                grid, solver, num_iterations=8,
                                alpha_scale=50.0)
    losses = np.asarray(res.loss_history)
    err0 = np.linalg.norm(alpha_true)
    err = np.linalg.norm(np.asarray(res.attenuation) - alpha_true)
    print(f"misfit {losses[0]:.3e} -> {losses[-1]:.3e}")
    print(f"alpha error vs zero-model: {err:.1f} / {err0:.1f} Np/m "
          f"({100 * err / err0:.0f}%)")
    print(f"peak recovered alpha: {float(np.max(res.attenuation)):.1f} Np/m "
          f"(true {float(np.max(alpha_true)):.1f})")


if __name__ == "__main__":
    main()
