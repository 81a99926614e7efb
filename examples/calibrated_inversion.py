"""Production intake workflow: QC -> compensate -> calibrate -> invert.

The reference pipeline trusts its inputs: REC_DATA is loaded unchecked and
the starting model is a hardcoded 1480 m/s (reference: fwi_script.py:17-26,
90). This example runs the framework's data-intake chain on the reference
dataset (or a synthesized stand-in):

  1. reciprocity QC (`data.qc.qc_report`) — estimate per-element response
     ratios from the asymmetry of the (tx, rx) matrix, screen for bad
     channels, and symmetrize the data;
  2. background (water) speed calibration
     (`fwi.calibrate.calibrate_background_speed`) — the projected
     homogeneous-medium misfit scanned over a speed ladder (one jitted
     program) with parabolic sub-grid refinement;
  3. FWI started at the calibrated speed.

Runs on CPU or TPU (engines auto-select). A few minutes on TPU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from waveforminversionust_tpu import (AcquisitionConfig, FWIConfig, Grid2D,
                                      calibrate_background_speed)
from waveforminversionust_tpu.data.qc import compensate_reciprocity, qc_report
from waveforminversionust_tpu.fwi.runner import (default_inversion_grid,
                                                 invert_dataset,
                                                 reconstruction_rmse)

REFERENCE_DATA = "/root/reference/Lecture19_Fwi/RecordedData.mat"


def load_or_synthesize():
    if os.path.exists(REFERENCE_DATA):
        from waveforminversionust_tpu.data.matio import load_recorded_dataset
        return load_recorded_dataset(REFERENCE_DATA), AcquisitionConfig()
    from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
    from waveforminversionust_tpu.models.phantom import breast_phantom
    fine = Grid2D.centered(120e-3, 0.6e-3)
    ds = synthesize_ring_dataset(breast_phantom(fine), fine,
                                 AcquisitionConfig(), f=350e3, seed=0)
    return ds, AcquisitionConfig()


def main():
    ds, acq_cfg = load_or_synthesize()

    # 1. Acquisition QC + reciprocity compensation (host-side numpy).
    rep = qc_report(ds.rec_data, exclude_each_side=31)
    print(f"reciprocity asymmetry: raw {rep.asymmetry_raw:.4g} -> "
          f"compensated {rep.asymmetry_compensated:.4g}; "
          f"bad channels: {rep.bad_elements.tolist() or 'none'}")
    ds = ds._replace(rec_data=compensate_reciprocity(ds.rec_data, rep.ratios))

    # 2. Background-speed calibration on a transmitter subset (the misfit
    #    minimum is insensitive to tx downsampling; 16x cuts the scan cost).
    grid = default_inversion_grid()
    cal = calibrate_background_speed(
        ds, grid=grid,
        acquisition=acq_cfg.__class__(tx_downsample=16),
        c_min=1400.0, c_max=1600.0, num=9, levels=2)
    print(f"calibrated background speed: {cal.c0:.2f} m/s "
          f"(reference hardcode: 1480)")

    # 3. Invert, started at the calibrated speed, with the measured best
    #    receiver/preconditioning configuration (PERF_NOTES: 4.20 m/s RMSE
    #    at 10 iterations on the reference dataset; the reference
    #    configuration scores 15.09).
    import dataclasses
    res = invert_dataset(
        ds, grid=grid,
        acquisition=dataclasses.replace(acq_cfg, interpolation="bilinear"),
        fwi=FWIConfig(num_iterations=10, precondition="illumination"),
        c_init=cal.c0)
    print("loss history:", np.array2string(res.metrics["loss"], precision=3))
    if ds.c is not None:
        true_grid = Grid2D.from_arrays(ds.x, ds.y)
        rmse = reconstruction_rmse(res.velocity, grid, ds.c, true_grid)
        print(f"reconstruction RMSE vs truth: {rmse:.2f} m/s")


if __name__ == "__main__":
    main()
