"""Synthesize a dataset from a phantom on a fine grid, then invert it on a
coarser grid — the reference's SimulateData.m -> FrequencyDomainFWI.m loop
as one script, with a quantitative score.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import waveforminversionust_tpu as wi
from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
from waveforminversionust_tpu.fwi.runner import (invert_dataset,
                                                 reconstruction_rmse)
from waveforminversionust_tpu.models.phantom import breast_phantom


def main():
    # Fine simulation grid (0.3 mm, like SimulateData.m) vs 0.8 mm inversion.
    fine = wi.Grid2D.centered(120e-3, 0.3e-3)
    phantom = breast_phantom(fine, seed=7)
    print("synthesizing 256-element acquisition on", fine.shape, "...")
    from waveforminversionust_tpu.ops.solve import auto_split
    ds = synthesize_ring_dataset(phantom, fine, wi.AcquisitionConfig(),
                                 f=350e3, seed=7,
                                 solver=auto_split(wi.SolverConfig()))

    result = invert_dataset(ds, fwi=wi.FWIConfig(num_iterations=10))
    rmse = reconstruction_rmse(result.velocity, result.grid, phantom, fine)
    print(f"RMSE vs phantom inside the ring: {rmse:.2f} m/s")
    print("loss history:", np.array2string(result.metrics["loss"], precision=3))


if __name__ == "__main__":
    main()
