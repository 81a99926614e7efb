"""Acceptance-mask construction walk-through — the reference's freqdebug.m
(a standalone repro of the first 30 lines of FrequencyDomainFWI.m, written
while debugging MATLAB<->Python indexing). Here the geometry is a first-class
object, so the 'debug' is three asserts.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import waveforminversionust_tpu as wi
from waveforminversionust_tpu.models.acquisition import (acceptance_mask,
                                                         build_ring_acquisition)


def main():
    mask = acceptance_mask(256, 31)
    assert mask.shape == (256, 256)
    assert (mask.sum(1) == 193).all()          # 63 excluded per transmitter
    assert not mask[0, 0] and not mask[0, 31] and mask[0, 32]

    grid = wi.Grid2D.centered(120e-3, 0.8e-3)
    acq = build_ring_acquisition(grid, wi.AcquisitionConfig())
    print("tx 0 active receivers:", acq.rx_indices[0][:8], "...")
    print("element 0 pixel:", (acq.y_idx[0], acq.x_idx[0]))
    r = np.hypot(grid.x[acq.x_idx], grid.y[acq.y_idx])
    print(f"snapped ring radius: {r.min()*1e3:.2f}..{r.max()*1e3:.2f} mm "
          "(target 110.00)")


if __name__ == "__main__":
    main()
