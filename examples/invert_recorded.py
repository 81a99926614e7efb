"""Invert a recorded ring-array dataset — the framework's equivalent of the
reference's main entry point (reference: fwi_script.py, 'python fwi_script.py'
per README.md:36-39).

Usage: python examples/invert_recorded.py [RecordedData.mat] [output.png]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import waveforminversionust_tpu as wi
from waveforminversionust_tpu import viz
from waveforminversionust_tpu.data.matio import load_recorded_dataset
from waveforminversionust_tpu.fwi.runner import (invert_dataset,
                                                 reconstruction_rmse)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "RecordedData.mat"
    out = sys.argv[2] if len(sys.argv) > 2 else "reconstruction.png"

    ds = load_recorded_dataset(path)
    print(f"loaded {path}: {ds.rec_data.shape[0]} elements, "
          f"f = {ds.f / 1e3:.0f} kHz")

    result = invert_dataset(ds, fwi=wi.FWIConfig(num_iterations=10))
    print("loss history:", np.array2string(result.metrics["loss"], precision=3))

    true_grid = wi.Grid2D.from_arrays(ds.x, ds.y)
    rmse = reconstruction_rmse(result.velocity, result.grid, ds.c, true_grid)
    print(f"reconstruction RMSE vs true map: {rmse:.2f} m/s")

    viz.plot_reconstruction(result.grid, result.velocity, true_map=ds.c,
                            true_grid=true_grid, path=out)
    viz.plot_convergence(result.metrics, path=out.replace(".png", "_conv.png"))
    print("wrote", out)


if __name__ == "__main__":
    main()
