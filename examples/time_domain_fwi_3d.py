"""Volumetric broadband acquisition -> travel-time init -> 3D FWI.

The full 3D workflow a real UST scanner needs, end to end on device
(the reference is strictly 2D and single-frequency — SURVEY.md preamble):

  1. synthesize (tx, rx, t) channel traces for a cylinder array over a
     known volume — a lax.scan of Krylov-accelerated CBS solves over a
     frequency comb plus one MXU IDTFT matmul
     (data.timedomain3d.synthesize_time_domain_dataset_3d);
  2. pick direct arrivals and build a travel-time starting volume
     (fwi.traveltime3d.traveltime_init_3d);
  3. extract inversion frequencies (DFT quadrature, no deconvolution —
     source estimation absorbs the transmit spectrum) and run
     low-to-high continuation through the turnkey 3D driver
     (fwi.runner3d.invert_dataset_3d, GMRES-CBS).

Run:  python examples/time_domain_fwi_3d.py       (TPU: a few minutes)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from waveforminversionust_tpu import (ContinuationConfig, FWIConfig,
                                      PMLConfig)
from waveforminversionust_tpu.data.timedomain3d import (
    synthesize_time_domain_dataset_3d, timedomain_to_fwi_data_3d)
from waveforminversionust_tpu.fwi.runner3d import invert_dataset_3d
from waveforminversionust_tpu.fwi.traveltime3d import traveltime_init_3d
from waveforminversionust_tpu.models.acquisition3d import cylinder_positions
from waveforminversionust_tpu.models.grid3d import Grid3D

C0 = 1500.0


def main():
    grid = Grid3D.centered(24e-3, 0.75e-3)            # 65^3
    pos = cylinder_positions(n_rings=3, n_per_ring=16, radius=18e-3,
                             z_span=12e-3)            # 48 elements
    pml = PMLConfig(a0=20.0, l_pml=9e-3)

    Z, Y, X = grid.meshgrid()
    r2 = (X - 3e-3) ** 2 + Y ** 2 + Z ** 2
    vel_true = (C0 + 90.0 * np.exp(-r2 / (2 * 4e-3 ** 2))).astype(np.float32)

    # 1. broadband cylinder acquisition: 150-400 kHz comb (>=4.9 points
    # per wavelength on this grid), Hann transmit spectrum, random
    # per-element complex amplitudes (unknown element response).
    t0 = time.time()
    td = synthesize_time_domain_dataset_3d(
        vel_true, grid, pos, f_low=0.15e6, f_high=0.40e6, df=0.025e6,
        pml=pml, seed=11)
    print(f"traces {td.traces.shape} [tx, rx, t], {len(td.freqs)} comb "
          f"lines  ({time.time() - t0:.1f} s)")

    # model RMSE inside the array (the region the data constrains)
    from waveforminversionust_tpu.fwi.runner3d import reconstruction_rmse_3d
    rmse = lambda v: reconstruction_rmse_3d(v, grid, vel_true,
                                            radius=16.5e-3,
                                            z_halfspan=7.5e-3)

    # 2. travel-time starting volume from picked direct arrivals. NOTE:
    # this demo aperture is only ~6-11 wavelengths across — picking is
    # diffraction-limited here and the init is a QC step, not a win; at
    # clinical scale (hundreds of wavelengths) it is the standard
    # cycle-skipping defense.
    t0 = time.time()
    c_init = traveltime_init_3d(td, grid, min_angle=0.7,
                                clip_velocity=(C0 - 120.0, C0 + 120.0))
    print(f"travel-time init: model RMSE {rmse(np.full(grid.shape, C0)):.2f}"
          f" (homogeneous) -> {rmse(c_init):.2f} m/s"
          f"  ({time.time() - t0:.1f} s)")

    # 3. two-frequency continuation through the turnkey 3D driver
    # (fwi.runner3d.invert_dataset_3d), Krylov-CBS solver.
    freqs = (0.2e6, 0.325e6)
    _, datasets = timedomain_to_fwi_data_3d(td, freqs, grid, min_angle=0.7)
    t0 = time.time()
    res = invert_dataset_3d(
        datasets, grid, FWIConfig(clip_velocity=(C0 - 150.0, C0 + 150.0)),
        continuation=ContinuationConfig(frequencies=freqs,
                                        iterations_per_frequency=4),
        c_init=c_init, pml=pml, solver3d="gmres", iter_cap=400,
        callback=lambda i, f, v, m: print(
            f"{f / 1e3:.0f} kHz: loss {np.asarray(m.loss)[0]:.3e} -> "
            f"{np.asarray(m.loss)[-1]:.3e}, model RMSE {rmse(v):.2f} m/s"))
    print(f"final: {rmse(res.velocity):.2f} m/s vs homogeneous-start "
          f"reference {rmse(np.full(grid.shape, C0)):.2f} "
          f"({time.time() - t0:.1f} s)")


if __name__ == "__main__":
    main()
