"""Grid-sharded (domain-decomposed) FWI: the 'grid' mesh axis end to end.

Runs a full nonlinear-CG inversion whose Helmholtz factorizations and
solves are y-slab-sharded over a device mesh via the distributed SPIKE
direct solver (parallel/spike.py) — the configuration for reconstruction
grids beyond one chip's HBM (>= 1024^2-class; the reference's host solver
tops out at 301^2, solve_helmholtz.py:85-93).

Self-provisions an 8-device virtual CPU mesh so it runs anywhere:

    python examples/grid_sharded_inversion.py

On a real multi-chip TPU slice, drop the XLA_FLAGS override and the same
code runs with one slab per chip (the SPIKE slab factorization uses the
fused Pallas kernel per device off-CPU).
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if jax.default_backend() == "cpu" and len(jax.devices()) < 8:
    raise SystemExit("re-run with XLA_FLAGS=--xla_force_host_platform_"
                     "device_count=8")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from waveforminversionust_tpu import (AcquisitionConfig, FWIConfig, Grid2D,
                                      PMLConfig, SolverConfig)
from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
from waveforminversionust_tpu.fwi.objective import build_fwi_data
from waveforminversionust_tpu.fwi.optimizers import nonlinear_cg
from waveforminversionust_tpu.models.acquisition import build_ring_acquisition
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom
from waveforminversionust_tpu.parallel.sharding import (grid_mesh,
                                                        shard_fwi_data_grid)


def main():
    import dataclasses

    mesh = grid_mesh()
    n_dev = mesh.shape["grid"]
    # ny must divide by the mesh size (one contiguous slab per device).
    grid = Grid2D.centered(20e-3, 0.8e-3, ymax=25.2e-3)   # ny=64, nx=51
    assert grid.ny % n_dev == 0
    print(f"grid {grid.shape}, {n_dev}-device mesh, "
          f"{grid.ny // n_dev}-row slabs")

    acq_cfg = AcquisitionConfig(num_elements=16, radius=15e-3,
                                num_excluded_each_side=2)
    solver = SolverConfig(split_complex=True, factorization="spike",
                          pml=PMLConfig(l_pml=3.2e-3))
    vel_true = smooth_blob_phantom(grid, radius=7e-3, dc=40)
    ds = synthesize_ring_dataset(
        vel_true, grid, acq_cfg, f=300e3, seed=7,
        solver=dataclasses.replace(solver, factorization="auto"))
    acq = build_ring_acquisition(grid, acq_cfg, x_elem=ds.x_circ,
                                 y_elem=ds.y_circ)
    data = shard_fwi_data_grid(
        build_fwi_data(acq, ds.rec_data, 300e3, split=True), mesh)

    vel0 = jnp.full(grid.shape, 1500.0, jnp.float32)
    res = nonlinear_cg(vel0, data, grid, solver, FWIConfig(num_iterations=5),
                       mesh=mesh)
    loss = np.asarray(res.metrics.loss)
    err0 = float(np.sqrt(np.mean((np.asarray(vel0) - vel_true) ** 2)))
    err = float(np.sqrt(np.mean((np.asarray(res.velocity) - vel_true) ** 2)))
    print(f"loss {loss[0]:.3e} -> {loss[-1]:.3e}")
    print(f"model RMSE {err0:.2f} -> {err:.2f} m/s")
    assert loss[-1] < loss[0] and err < err0


if __name__ == "__main__":
    main()
