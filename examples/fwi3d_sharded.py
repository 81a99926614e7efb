"""Grid-sharded 3D FWI demo: z-slab volumes over a device mesh.

The 3D CBS operator is global in k-space, so its grid axis shards through
the distributed pencil-decomposed FFT (parallel/fft3d.py: local FFTs +
one all_to_all re-transpose per direction) rather than halo exchange.
This demo runs a tiny volumetric inversion twice — single-device and
z-slab-sharded over an 8-way mesh — and prints the matching trajectories.

On a CPU host it self-provisions 8 virtual devices; on a real pod slice
the same code shards over the physical chips. (The reference is strictly
2D and single-process; SURVEY.md section 2.)

Run: python examples/fwi3d_sharded.py     (~2 min on CPU)
"""

import os
import sys

if not any("xla_force_host_platform_device_count"
           in os.environ.get(v, "") for v in ("XLA_FLAGS",)):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Demo default: the virtual 8-device CPU mesh (works everywhere). On a
# real multi-chip slice, delete this line — the same code shards over the
# physical chips.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from waveforminversionust_tpu import FWIConfig, PMLConfig
from waveforminversionust_tpu.fwi.fwi3d import (build_fwi_data_3d,
                                                nonlinear_cg_3d,
                                                sample_receivers_3d)
from waveforminversionust_tpu.models.acquisition3d import (
    build_acquisition3d, cylinder_positions, source_fields_3d)
from waveforminversionust_tpu.models.grid3d import Grid3D
from waveforminversionust_tpu.ops import cpx
from waveforminversionust_tpu.ops.born3d import born_series_solve_3d


def main():
    C0, F = 1500.0, 200e3
    pml = PMLConfig(a0=20.0, l_pml=6e-3)
    nz, ny, nx = 24, 24, 25
    grid = Grid3D(nx=nx, ny=ny, nz=nz, dx=1e-3, dy=1e-3, dz=1e-3,
                  x0=-(nx - 1) * 0.5e-3, y0=-(ny - 1) * 0.5e-3,
                  z0=-(nz - 1) * 0.5e-3)
    z = grid.z0 + grid.dz * np.arange(nz)
    y = grid.y0 + grid.dy * np.arange(ny)
    x = grid.x0 + grid.dx * np.arange(nx)
    r2 = (z[:, None, None] ** 2 + y[None, :, None] ** 2
          + x[None, None, :] ** 2)
    vel_true = (C0 + 40 * np.exp(-r2 / 4e-3 ** 2)).astype(np.float32)

    acq = build_acquisition3d(grid, cylinder_positions(1, 8, 8e-3, 0.0),
                              min_angle=0.8)
    src = source_fields_3d(acq, grid)
    wv, _ = born_series_solve_3d(vel_true, src, F, grid, pml, iter_cap=500)
    rec_obs = sample_receivers_3d(wv, jnp.asarray(acq.rx_idx))
    data = build_fwi_data_3d(acq, rec_obs, F, grid)
    # Keep |drec|^2 in f32's normal range (exact rescale; see
    # tests/test_fft3d.py on the denormal pitfall of one-hot sources).
    data = data._replace(src=cpx.scale(data.src, 1e6),
                         rec_obs=cpx.scale(data.rec_obs, 1e6))

    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    fwi = FWIConfig(num_iterations=3, estimate_source_strength=False,
                    clip_velocity=(C0 - 100.0, C0 + 100.0))

    v1, m1 = nonlinear_cg_3d(vel0, data, grid, fwi, pml=pml, iter_cap=500)
    print("single-device loss:", np.asarray(m1.loss))

    mesh = Mesh(np.array(jax.devices()[:8]), ("grid",))
    v8, m8 = nonlinear_cg_3d(vel0, data, grid, fwi, pml=pml, iter_cap=500,
                             mesh=mesh)
    print("8-slab-sharded loss:", np.asarray(m8.loss))
    rel = (np.linalg.norm(np.asarray(v8) - np.asarray(v1))
           / np.linalg.norm(np.asarray(v1) - C0))
    print(f"velocity-update mismatch sharded vs single: {rel:.2e}")


if __name__ == "__main__":
    main()
