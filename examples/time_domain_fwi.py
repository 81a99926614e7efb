"""Broadband time-domain acquisition -> multi-frequency FWI, end to end.

The reference inverts externally-prepared single-frequency data
(RecordedData.mat; its time-domain script TimeDomainSimulation.m:1-91 is a
forward-only demo from one element). Real UST scanners record broadband
time traces for every transmit element. This example runs that whole
workflow TPU-natively:

  1. synthesize (tx, rx, t) channel data over a known phantom — a lax.scan
     of batched multi-RHS Helmholtz solves over a frequency comb plus one
     MXU IDTFT matmul (data.timedomain.synthesize_time_domain_dataset);
  2. extract inversion frequencies from the traces by DFT quadrature —
     with NO source-spectrum deconvolution: the FWI objective's per-shot
     variable-projection source estimate absorbs the transmit spectrum,
     exactly as it absorbs the unknown element response of measured data;
  3. run low-to-high multi-frequency continuation through
     fwi.runner.invert_dataset.

Run:  python examples/time_domain_fwi.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from waveforminversionust_tpu import (AcquisitionConfig, ContinuationConfig,
                                      FWIConfig, Grid2D, PMLConfig,
                                      SolverConfig)
from waveforminversionust_tpu.data.timedomain import (
    synthesize_time_domain_dataset, timedomain_to_ring_datasets)
from waveforminversionust_tpu.fwi.runner import invert_dataset
from waveforminversionust_tpu.models.acquisition import (ring_positions,
                                                         snap_to_grid)
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom
from waveforminversionust_tpu.ops.solve import auto_split

C0 = 1500.0


def main():
    acq = AcquisitionConfig(num_elements=64, radius=18e-3,
                            num_excluded_each_side=7)
    solver = auto_split(SolverConfig(pml=PMLConfig(l_pml=4e-3)))
    # Element positions snapped to the inversion grid so synthesis (2x finer)
    # places them identically (see data.synthesize.synthesize_ring_dataset).
    coarse = Grid2D.centered(24e-3, 0.8e-3)
    xi, yi = snap_to_grid(coarse, *ring_positions(acq.num_elements, acq.radius))
    xs, ys = coarse.x[xi], coarse.y[yi]

    fine = Grid2D.centered(24e-3, 0.4e-3)
    true_vel = smooth_blob_phantom(fine, radius=8e-3, dc=30, c_bkgnd=C0)

    # 1. broadband acquisition: 120-280 kHz comb, Hann transmit spectrum.
    td = synthesize_time_domain_dataset(
        true_vel, fine, acq, f_low=0.12e6, f_high=0.28e6, df=0.02e6,
        solver=solver, seed=7, x_elem=xs, y_elem=ys)
    print(f"traces: {td.traces.shape} [tx, rx, t], "
          f"{len(td.freqs)} comb lines, nt={len(td.times)}")

    # 2. + 3. extract three inversion frequencies and run continuation.
    freqs = (0.14e6, 0.2e6, 0.26e6)
    datasets = timedomain_to_ring_datasets(td, freqs, deconvolve=False)
    res = invert_dataset(
        datasets, grid=coarse, acquisition=acq, solver=solver,
        fwi=FWIConfig(c_init=C0),
        continuation=ContinuationConfig(frequencies=freqs,
                                        iterations_per_frequency=5))

    truth_c = smooth_blob_phantom(coarse, radius=8e-3, dc=30, c_bkgnd=C0)
    rmse = float(np.sqrt(np.mean((res.velocity - np.asarray(truth_c)) ** 2)))
    rmse0 = float(np.sqrt(np.mean((C0 - np.asarray(truth_c)) ** 2)))
    print(f"loss history: {np.array2string(res.metrics['loss'], precision=3)}")
    print(f"velocity RMSE: init {rmse0:.2f} -> recovered {rmse:.2f} m/s")


if __name__ == "__main__":
    main()
