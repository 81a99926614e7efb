"""Travel-time tomography starting model -> waveform inversion, end to end.

The production UST workflow at strong contrasts: pick direct-arrival times
from the broadband channel data, invert them into a smooth sound-speed map
(linear straight-ray tomography — fwi.traveltime), and START waveform
inversion from that map instead of the reference's homogeneous 1480 m/s
(reference: fwi_script.py:90). Travel-time initialization is the standard
defense against cycle skipping: FWI converges to the nearest local minimum,
and a kinematically-correct background keeps the data residual inside half
a cycle.

This demo uses a +150 m/s (10 %) contrast. Measured (one v5e chip): the
travel-time tomogram alone reaches 5.2 m/s model RMSE vs 21.8 for the
homogeneous start, and after 10 single-frequency CG iterations the
travel-time start finishes at 4.6 m/s with 33 % lower misfit than the
homogeneous start's 6.2 m/s — at stronger contrasts or higher
frequencies the gap becomes cycle-skip vs converge. The chain:

  1. synthesize broadband (tx, rx, t) traces over the phantom
     (data.timedomain.synthesize_time_domain_dataset);
  2. gate the direct arrival (direct_arrival_gate) and build the starting
     model (fwi.traveltime.traveltime_init);
  3. extract a single inversion frequency from the SAME traces and run FWI
     twice — homogeneous start vs travel-time start (invert_dataset's
     c_init parameter).

Run:  python examples/traveltime_init_fwi.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from waveforminversionust_tpu import (AcquisitionConfig, FWIConfig, Grid2D,
                                      PMLConfig, SolverConfig)
from waveforminversionust_tpu.data.timedomain import (
    direct_arrival_gate, synthesize_time_domain_dataset,
    timedomain_to_ring_datasets)
from waveforminversionust_tpu.fwi.runner import invert_dataset
from waveforminversionust_tpu.fwi.traveltime import traveltime_init
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom
from waveforminversionust_tpu.ops.solve import auto_split

C0 = 1500.0


def main():
    acq = AcquisitionConfig(num_elements=48, radius=18e-3,
                            num_excluded_each_side=5)
    solver = auto_split(SolverConfig(pml=PMLConfig(l_pml=4e-3)))
    grid = Grid2D.centered(24e-3, 0.8e-3)          # inversion grid (61x61)
    fine = Grid2D.centered(24e-3, 0.4e-3)          # synthesis grid (2x finer)
    true_vel = smooth_blob_phantom(fine, radius=8e-3, dc=150, c_bkgnd=C0)
    true_coarse = smooth_blob_phantom(grid, radius=8e-3, dc=150, c_bkgnd=C0)

    # Element positions snapped to the inversion grid so the 2x-finer
    # synthesis places them identically (see synthesize_ring_dataset).
    from waveforminversionust_tpu.models.acquisition import (ring_positions,
                                                             snap_to_grid)
    xi, yi = snap_to_grid(grid, *ring_positions(acq.num_elements, acq.radius))
    xs, ys = grid.x[xi], grid.y[yi]

    # 1. broadband acquisition: 150-450 kHz comb.
    td = synthesize_time_domain_dataset(
        true_vel, fine, acq, f_low=0.15e6, f_high=0.45e6, df=0.0125e6,
        solver=solver, seed=7, x_elem=xs, y_elem=ys)
    print(f"traces {td.traces.shape} [tx, rx, t], "
          f"record {td.times[-1] * 1e6:.1f} us")

    # 2. direct-arrival gate + travel-time tomogram on the inversion grid.
    gated = direct_arrival_gate(td, c_ref=C0, pre=2e-6, post=5e-6,
                                taper=2e-6)
    c_tt = traveltime_init(gated, grid,
                           num_excluded_each_side=acq.num_excluded_each_side,
                           c_ref=C0, clip_velocity=(1400.0, 1750.0))
    rmse = lambda c: float(np.sqrt(np.mean((np.asarray(c) - true_coarse) ** 2)))
    print(f"model RMSE: homogeneous {rmse(np.full(grid.shape, C0)):.1f} "
          f"-> travel-time init {rmse(c_tt):.1f} m/s")

    # 3. single-frequency FWI at 350 kHz from both starts.
    datasets = timedomain_to_ring_datasets(td, [350e3], deconvolve=False)
    ds = datasets[350e3]
    fwi = FWIConfig(num_iterations=10, c_init=C0,
                    clip_velocity=(1400.0, 1750.0))
    res_h = invert_dataset(ds, grid=grid, acquisition=acq, solver=solver,
                           fwi=fwi)
    res_tt = invert_dataset(ds, grid=grid, acquisition=acq, solver=solver,
                            fwi=fwi, c_init=c_tt)
    print(f"FWI RMSE after 10 iterations: homogeneous start "
          f"{rmse(res_h.velocity):.1f} m/s, travel-time start "
          f"{rmse(res_tt.velocity):.1f} m/s")
    print(f"final loss: homogeneous {res_h.metrics['loss'][-1]:.3e}, "
          f"travel-time {res_tt.metrics['loss'][-1]:.3e}")


if __name__ == "__main__":
    main()
