"""Invert velocity in a known lossy medium with TV regularization.

Demonstrates two framework additions beyond the reference (which models
lossless media and unregularized CG only; reference: SimulateData.m,
FrequencyDomainFWI.m):

  * a fixed attenuation map alpha [Np/m] — synthesis AND inversion run in
    the same lossy medium (`attenuation=...` end to end);
  * total-variation regularization in the CG gradient (`FWIConfig.reg_tv`),
    suppressing the high-wavenumber ring artifacts of single-frequency FWI.

Runs on CPU or TPU (the solver engine auto-selects). ~1 minute on CPU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from waveforminversionust_tpu import (AcquisitionConfig, FWIConfig, Grid2D,
                                      PMLConfig, SolverConfig)
from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
from waveforminversionust_tpu.fwi.regularization import tv_value
from waveforminversionust_tpu.fwi.runner import invert_dataset, reconstruction_rmse
from waveforminversionust_tpu.models.acquisition import (ring_positions,
                                                         snap_to_grid)
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom
from waveforminversionust_tpu.ops.solve import auto_split

F = 200e3
fine = Grid2D.centered(24e-3, 0.4e-3)     # synthesis grid (no inverse crime)
coarse = Grid2D.centered(24e-3, 0.8e-3)   # inversion grid
acq = AcquisitionConfig(num_elements=32, radius=9e-3, num_excluded_each_side=3)
solver = auto_split(SolverConfig(pml=PMLConfig(l_pml=3.2e-3)))

# Snap element positions to the inversion grid first (see the
# synthesize_ring_dataset docstring for why this matters).
xe, ye = ring_positions(acq.num_elements, acq.radius)
xi, yi = snap_to_grid(coarse, xe, ye)

vel_true = smooth_blob_phantom(fine, radius=6e-3, dc=30)
alpha_fine = np.full(fine.shape, 50.0, np.float32)     # uniform 50 Np/m
ds = synthesize_ring_dataset(vel_true, fine, acq, f=F, solver=solver, seed=5,
                             attenuation=alpha_fine,
                             x_elem=coarse.x[xi], y_elem=coarse.y[yi])

alpha_coarse = np.full(coarse.shape, 50.0, np.float32)
for label, fwi in [
    ("plain CG          ", FWIConfig(c_init=1500.0, num_iterations=8)),
    ("TV-regularized CG ", FWIConfig(c_init=1500.0, num_iterations=8,
                                     reg_tv=0.3)),
]:
    res = invert_dataset(ds, grid=coarse, acquisition=acq, solver=solver,
                         fwi=fwi, attenuation=alpha_coarse)
    rmse = reconstruction_rmse(res.velocity, coarse, vel_true, fine,
                               radius=8e-3)
    print(f"{label} loss {res.metrics['loss'][0]:.2e} -> "
          f"{res.metrics['loss'][-1]:.2e}   RMSE {rmse:5.2f} m/s   "
          f"TV {tv_value(res.velocity, coarse):,.0f}")
