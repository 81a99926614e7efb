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

Flags (round 4 — stack the intake chain and the large-grid perf levers
onto the high-res inversion; measured results in PERF_NOTES round 4):
  --intake              reciprocity compensation + calibrated background
                        speed before inverting (data.qc + fwi.calibrate —
                        the round-3 quality-record chain, here at 601^2)
  --refactor-every K    frozen-factor CG (factorize every K iterations,
                        refine stale solves; SolverConfig.refactor_every)
  --factor-precision P  "highest" | "default" (bf16 factor panels;
                        pair with --refine 2 at >=601^2)
  --refine N            iterative-refinement passes per solve
  --method M            cg | gn | lbfgs

Usage: python examples/high_res_inversion.py [RecordedData.mat] [iters]
                                             [flags]
"""

import argparse
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
    p = argparse.ArgumentParser()
    p.add_argument("path", nargs="?",
                   default="/root/reference/Lecture19_Fwi/RecordedData.mat")
    p.add_argument("iters", nargs="?", type=int, default=10)
    p.add_argument("--intake", action="store_true")
    p.add_argument("--refactor-every", type=int, default=1)
    p.add_argument("--factor-precision", default="highest",
                   choices=("highest", "default"))
    p.add_argument("--refine", type=int, default=0)
    p.add_argument("--method", default="cg", choices=("cg", "gn", "lbfgs"))
    args = p.parse_args()

    ds = load_recorded_dataset(args.path)
    grid = wi.Grid2D.centered(120e-3, 0.4e-3)   # 601x601, 2x the reference
    acq = wi.AcquisitionConfig(interpolation="bilinear")
    fwi = wi.FWIConfig(num_iterations=args.iters,
                       precondition="illumination")
    solver = wi.SolverConfig(refactor_every=args.refactor_every,
                             factor_precision=args.factor_precision,
                             refine=args.refine)
    print(f"inverting {ds.rec_data.shape[0]} elements at {ds.f/1e3:.0f} kHz "
          f"on {grid.shape} ({2*np.pi*1500/(2*np.pi*ds.f)/grid.dx:.1f} ppw)")

    c_init = None
    if args.intake:
        from waveforminversionust_tpu.data.qc import (compensate_reciprocity,
                                                      qc_report)
        rep = qc_report(ds.rec_data, exclude_each_side=31)
        ds = ds._replace(rec_data=compensate_reciprocity(ds.rec_data,
                                                         rep.ratios))
        cal = wi.calibrate_background_speed(
            ds, grid=wi.Grid2D.centered(120e-3, 0.8e-3),  # scan at 301^2
            acquisition=wi.AcquisitionConfig(tx_downsample=16),
            c_min=1400.0, c_max=1600.0, num=9, levels=2)
        c_init = cal.c0
        print(f"intake: asymmetry {rep.asymmetry_raw:.3g} -> "
              f"{rep.asymmetry_compensated:.3g}; calibrated c0 = {cal.c0:.2f}")

    kw = dict(grid=grid, acquisition=acq, solver=solver, fwi=fwi,
              method=args.method, c_init=c_init)
    result = invert_dataset(ds, **kw)
    # warm timing: the second call reuses the in-process compile cache
    t0 = time.perf_counter()
    result = invert_dataset(ds, **kw)
    elapsed = time.perf_counter() - t0  # invert_dataset device_gets = synced

    true_grid = wi.Grid2D.from_arrays(ds.x, ds.y)
    rmse = reconstruction_rmse(result.velocity, grid, ds.c, true_grid)
    print("loss history:",
          np.array2string(result.metrics["loss"], precision=3))
    print(f"{elapsed/args.iters:.3f} s/iteration warm, "
          f"reconstruction RMSE {rmse:.2f} m/s")


if __name__ == "__main__":
    main()
