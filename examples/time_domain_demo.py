"""Multi-frequency sweep + time-domain wavefield movie — the reference's
TimeDomainSimulation.m demo (81 frequencies, Hann weighting, inverse DTFT).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import waveforminversionust_tpu as wi
from waveforminversionust_tpu import viz
from waveforminversionust_tpu import SolverConfig
from waveforminversionust_tpu.data.timedomain import simulate_time_domain
from waveforminversionust_tpu.ops.solve import auto_split
from waveforminversionust_tpu.models.phantom import breast_phantom


def main():
    grid = wi.Grid2D.centered(120e-3, 1.0e-3)  # 241x241 like the reference
    vel = breast_phantom(grid, seed=7)
    res = simulate_time_domain(vel, grid, element_idx=64,
                               solver=auto_split(SolverConfig()))
    print(f"{res.wavefields_t.shape[0]} time frames over "
          f"{len(res.freqs)} frequencies")
    viz.plot_time_snapshots(grid, res, path="time_domain.png")
    print("wrote time_domain.png")


if __name__ == "__main__":
    main()
