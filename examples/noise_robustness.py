"""Noise-robustness ladder on the reference dataset: plain CG vs the
intake chain at stated SNRs.

All quality records in PERF_NOTES rounds 1-3 are on noise-free synthetics
(the reference's only data perturbation is its random per-element source
amplitudes, SimulateData.m:26). This drive adds complex-Gaussian channel
noise to RecordedData.mat at 40 / 30 / 20 dB (power-matched over the
acceptance-masked entries) and scores three intakes at 10 CG iterations:

  * reference intake — raw data, hardcoded c_init = 1480 (the reference
    algorithm, fwi_script.py:90);
  * calibrated chain — raw data, calibrated background + bilinear
    receivers + illumination preconditioning (phase physics + receiver
    model, no reweighting);
  * full intake chain — reciprocity compensation on top (the round-3
    noise-free record config, 4.20 m/s).

Expected (tests/test_noise.py pins the mechanism on a CPU fixture): the
calibrated chain holds its advantage under noise; the compensation step
flips from help to harm as its shot equalization upweights low-SNR rows.

~10-15 minutes on the TPU (a calibration scan + 10-iteration inversion
per row; programs compile once per configuration).
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from waveforminversionust_tpu import (AcquisitionConfig, FWIConfig, Grid2D,
                                      calibrate_background_speed)
from waveforminversionust_tpu.data.qc import compensate_reciprocity, qc_report
from waveforminversionust_tpu.data.synthesize import add_complex_noise
from waveforminversionust_tpu.fwi.runner import (default_inversion_grid,
                                                 invert_dataset,
                                                 reconstruction_rmse)

REFERENCE_DATA = "/root/reference/Lecture19_Fwi/RecordedData.mat"
EXCL = 31


def load_dataset():
    if os.path.exists(REFERENCE_DATA):
        from waveforminversionust_tpu.data.matio import load_recorded_dataset
        return load_recorded_dataset(REFERENCE_DATA)
    from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
    from waveforminversionust_tpu.models.phantom import breast_phantom
    fine = Grid2D.centered(120e-3, 0.6e-3)
    return synthesize_ring_dataset(breast_phantom(fine), fine,
                                   AcquisitionConfig(), f=350e3, seed=0)


def main():
    ds0 = load_dataset()
    grid = default_inversion_grid()
    true_grid = Grid2D.from_arrays(ds0.x, ds0.y)
    acq = AcquisitionConfig()
    tuned = dataclasses.replace(acq, interpolation="bilinear")

    def rmse_of(rec_data, c_init, chain_cfg):
        ds = ds0._replace(rec_data=rec_data)
        res = invert_dataset(
            ds, grid=grid, acquisition=chain_cfg[0],
            fwi=FWIConfig(num_iterations=10, precondition=chain_cfg[1]),
            c_init=c_init)
        return reconstruction_rmse(np.asarray(res.velocity), grid, ds0.c,
                                   true_grid)

    print("snr_db | reference intake | calibrated chain | full intake chain"
          " | calibrated c0")
    for snr in (None, 40.0, 30.0, 20.0):
        m = (ds0.rec_data if snr is None else
             add_complex_noise(ds0.rec_data, snr, seed=7,
                               exclude_each_side=EXCL))
        rep = qc_report(m, exclude_each_side=EXCL, residual_floor=0.5)
        comp = compensate_reciprocity(m, rep.ratios)
        cal = calibrate_background_speed(
            ds0._replace(rec_data=comp), grid=grid,
            acquisition=dataclasses.replace(acq, tx_downsample=16),
            c_min=1400.0, c_max=1600.0, num=9, levels=2)
        r_ref = rmse_of(m, 1480.0, (acq, None))
        r_cal = rmse_of(m, cal.c0, (tuned, "illumination"))
        r_full = rmse_of(comp, cal.c0, (tuned, "illumination"))
        tag = "clean" if snr is None else f"{snr:.0f}"
        print(f"{tag:>6} | {r_ref:16.2f} | {r_cal:16.2f} | {r_full:18.2f}"
              f" | {cal.c0:.2f}")


if __name__ == "__main__":
    main()
