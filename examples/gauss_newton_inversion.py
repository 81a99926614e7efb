"""Truncated Gauss-Newton vs nonlinear CG on the reference dataset.

Runs both optimizers on RecordedData.mat at the reference's 301x301 grid
(bilinear receivers; CG additionally gets illumination preconditioning —
its measured-best configuration) and writes the side-by-side
reconstruction figure (docs/gn_vs_cg_tpu.png in this repo was produced by
this script on the real chip: CG-10 12.47 m/s, GN-10 12.23 m/s).

Usage: python examples/gauss_newton_inversion.py [RecordedData.mat] [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import waveforminversionust_tpu as wi
from waveforminversionust_tpu import viz
from waveforminversionust_tpu.data.matio import load_recorded_dataset
from waveforminversionust_tpu.fwi.objective import build_fwi_data
from waveforminversionust_tpu.fwi.runner import (default_inversion_grid,
                                                 reconstruction_rmse)
from waveforminversionust_tpu.models.acquisition import build_ring_acquisition
from waveforminversionust_tpu.ops.solve import auto_split


def main():
    import jax
    import jax.numpy as jnp

    path = (sys.argv[1] if len(sys.argv) > 1
            else "/root/reference/Lecture19_Fwi/RecordedData.mat")
    out = sys.argv[2] if len(sys.argv) > 2 else "gn_vs_cg.png"

    ds = load_recorded_dataset(path)
    grid = default_inversion_grid()
    true_grid = wi.Grid2D.from_arrays(ds.x, ds.y)
    solver = auto_split(wi.SolverConfig())
    acq = build_ring_acquisition(
        grid, wi.AcquisitionConfig(interpolation="bilinear"),
        x_elem=ds.x_circ, y_elem=ds.y_circ)
    data = build_fwi_data(acq, ds.rec_data, ds.f, split=solver.split_complex)
    vel0 = jnp.full(grid.shape, 1480.0, jnp.float32)

    cg = wi.nonlinear_cg(vel0, data, grid, solver,
                         wi.FWIConfig(precondition="illumination"),
                         num_iterations=10)
    vcg = np.asarray(jax.device_get(cg.velocity))
    gn = wi.run_gauss_newton(vel0, data, grid, solver, fwi=wi.FWIConfig(),
                             num_iterations=10, cg_iters=6, reg_smooth=0.3)
    vgn = np.asarray(jax.device_get(gn.velocity))
    r_cg = reconstruction_rmse(vcg, grid, ds.c, true_grid)
    r_gn = reconstruction_rmse(vgn, grid, ds.c, true_grid)
    print(f"CG-10 (bilinear+illumination): {r_cg:.2f} m/s; "
          f"GN-10 (bilinear): {r_gn:.2f} m/s")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axs = plt.subplots(1, 3, figsize=(14, 4.4))
    kw = dict(cmap="viridis", rng=(1420, 1580))
    viz.imagesc(axs[0], true_grid, np.asarray(ds.c), title="true map", **kw)
    viz.imagesc(axs[1], grid, vcg,
                title=f"CG-10 + illum (RMSE {r_cg:.1f} m/s)", **kw)
    viz.imagesc(axs[2], grid, vgn,
                title=f"Gauss-Newton-10 (RMSE {r_gn:.1f} m/s)", **kw)
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print("wrote", out)


if __name__ == "__main__":
    main()
