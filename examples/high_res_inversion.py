"""Invert the reference's own dataset at 2x its resolution on one chip.

The reference reconstructs RecordedData.mat on a 301x301 / 0.8 mm grid
(reference: fwi_script.py:46-49) — at 350 kHz that is 5.4 points per
wavelength, the edge of what the 9-point optimal stencil tolerates. This
example runs the same inversion on a 601x601 / 0.4 mm grid (10.7 ppw):
each CG iteration does three direct solves of a 361,201-unknown system
with 256 right-hand sides — far past what the reference's host SuperLU
path could factor per iteration, routine for the fused Pallas block-Thomas
kernels (the 601-row factorization streams through one pallas_call; see
ops/pallas_factor.py).

Uses the measured-best quality configuration (PERF_NOTES round 3):
bilinear receiver placement + illumination-preconditioned gradient.

Usage: python examples/high_res_inversion.py [RecordedData.mat] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import waveforminversionust_tpu as wi
from waveforminversionust_tpu.data.matio import load_recorded_dataset
from waveforminversionust_tpu.fwi.runner import (invert_dataset,
                                                 reconstruction_rmse)


def main():
    path = (sys.argv[1] if len(sys.argv) > 1
            else "/root/reference/Lecture19_Fwi/RecordedData.mat")
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    ds = load_recorded_dataset(path)
    grid = wi.Grid2D.centered(120e-3, 0.4e-3)   # 601x601, 2x the reference
    acq = wi.AcquisitionConfig(interpolation="bilinear")
    fwi = wi.FWIConfig(num_iterations=iters, precondition="illumination")
    print(f"inverting {ds.rec_data.shape[0]} elements at {ds.f/1e3:.0f} kHz "
          f"on {grid.shape} ({2*np.pi*1500/(2*np.pi*ds.f)/grid.dx:.1f} ppw)")

    result = invert_dataset(ds, grid=grid, acquisition=acq, fwi=fwi)
    # warm timing: the second call reuses the in-process compile cache
    t0 = time.perf_counter()
    result = invert_dataset(ds, grid=grid, acquisition=acq, fwi=fwi)
    elapsed = time.perf_counter() - t0  # invert_dataset device_gets = synced

    true_grid = wi.Grid2D.from_arrays(ds.x, ds.y)
    rmse = reconstruction_rmse(result.velocity, grid, ds.c, true_grid)
    print("loss history:",
          np.array2string(result.metrics["loss"], precision=3))
    print(f"{elapsed/iters:.3f} s/iteration warm, "
          f"reconstruction RMSE {rmse:.2f} m/s")


if __name__ == "__main__":
    main()
