"""Model appraisal of the reference acquisition: point-spread functions and
the data-constraint density map.

The reference validates reconstructions visually; this example computes the
quantitative appraisal tools (fwi/resolution.py) for its own acquisition
geometry (RecordedData.mat ring, 350 kHz): PSFs of the damped Gauss-Newton
inverse at three radii, and the Hutchinson estimate of diag(J^H J) — where
the data actually constrains the model.

Usage: python examples/resolution_map.py [RecordedData.mat] [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import waveforminversionust_tpu as wi
from waveforminversionust_tpu import viz
from waveforminversionust_tpu.data.matio import load_recorded_dataset
from waveforminversionust_tpu.fwi.objective import build_fwi_data
from waveforminversionust_tpu.fwi.resolution import (hessian_diag_probe,
                                                     psf_probe)
from waveforminversionust_tpu.fwi.runner import default_inversion_grid
from waveforminversionust_tpu.models.acquisition import build_ring_acquisition
from waveforminversionust_tpu.ops.solve import auto_split


def main():
    path = (sys.argv[1] if len(sys.argv) > 1
            else "/root/reference/Lecture19_Fwi/RecordedData.mat")
    out = sys.argv[2] if len(sys.argv) > 2 else "resolution.png"
    import jax.numpy as jnp

    ds = load_recorded_dataset(path)
    grid = default_inversion_grid()
    acq = build_ring_acquisition(grid, wi.AcquisitionConfig(),
                                 x_elem=ds.x_circ, y_elem=ds.y_circ)
    solver = auto_split(wi.SolverConfig())
    data = build_fwi_data(acq, ds.rec_data, ds.f, split=solver.split_complex)
    vel = np.full(grid.shape, 1480.0, np.float32)  # appraisal at the start

    # Gaussian probes (1.6 mm sigma) at center, mid-radius, near the ring
    yy, xx = np.mgrid[:grid.ny, :grid.nx]
    c = grid.ny // 2
    spots = [(c, c), (c, c + 62), (c, c + 120)]  # 0, 50, 96 mm off-center
    probes = np.stack([
        np.exp(-((yy - py) ** 2 + (xx - px) ** 2) / (2.0 ** 2))
        for py, px in spots]).astype(np.float32)

    psfs = np.asarray(psf_probe(jnp.asarray(vel), data, grid, solver,
                                probes=jnp.asarray(probes), cg_iters=12))
    dens = np.asarray(hessian_diag_probe(jnp.asarray(vel), data, grid,
                                         solver, num_probes=8))
    for (py, px), psf, probe in zip(spots, psfs, probes):
        pk = np.unravel_index(np.argmax(np.abs(psf)), psf.shape)
        corr = float((psf * probe).sum()
                     / (np.linalg.norm(psf) * np.linalg.norm(probe) + 1e-30))
        r_mm = abs(px - c) * grid.dx * 1e3
        print(f"probe at r={r_mm:5.1f} mm: PSF peak at {pk} "
              f"(probe ({py}, {px})), probe-correlation {corr:.2f}")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axs = plt.subplots(1, 4, figsize=(18, 4.2))
    for ax, psf, (py, px) in zip(axs[:3], psfs, spots):
        viz.imagesc(ax, grid, psf, cmap="RdBu_r",
                       title=f"PSF at ({py}, {px})")
    viz.imagesc(axs[3], grid, np.log10(np.maximum(dens, dens.max() * 1e-8)),
                   cmap="magma", title="log10 diag(J^H J)")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print("wrote", out)


if __name__ == "__main__":
    main()
