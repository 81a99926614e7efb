"""Single-chip large-grid direct Helmholtz solve: 1024^2 on one TPU.

The reference's host SuperLU path tops out at its 801^2 synthesis grid
(90,601-unknown inversion grid; reference: SimulateData.m:8-11,
solve_helmholtz.py:85-93). On one TPU chip the fused Pallas block-Thomas
factorization handles a 1,048,576-unknown 1024^2 grid directly: the
single-G padded factor is ~8.6 GB of HBM, and `SolverConfig(
factor_precision="default", refine=2)` runs the O(nx^3/row) MXU panel
updates in bf16 with two iterative-refinement passes recovering
direct-solver-grade residuals (see PERF_NOTES round 3: 801^2 solve
603 -> 422 ms at equal residual; 1024^2 factor+16-RHS solve 638 ms at
2.2e-5 measured on a v5e).

Beyond this size the factor exceeds one chip's HBM; use the grid-sharded
SPIKE path instead (examples/grid_sharded_inversion.py).

Run: python examples/large_grid_solve.py   (~2 min incl. compile on TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from waveforminversionust_tpu import Grid2D, SolverConfig, solve_helmholtz
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom


def main():
    n = 1024
    dx = 240e-3 / (n - 1)
    grid = Grid2D.centered(120e-3, dx)
    assert grid.shape == (n, n), grid.shape
    vel = smooth_blob_phantom(grid, radius=40e-3, dc=60)

    # A few interior point sources (kept complex on the host; the split
    # engine carries them as (re, im) pairs on TPU).
    rng = np.random.default_rng(0)
    src = np.zeros((16, n, n), np.complex64)
    for i in range(16):
        src[i, rng.integers(200, n - 200), rng.integers(200, n - 200)] = 1.0

    on_tpu = jax.devices()[0].platform != "cpu"
    cfg = SolverConfig(split_complex=on_tpu,
                       factor_precision="default" if on_tpu else "highest",
                       refine=2 if on_tpu else 0)

    if on_tpu:
        # Pre-split and upload the sources ONCE: 134 MB through the relay
        # would otherwise dominate the warm timing below.
        from waveforminversionust_tpu.ops import cpx
        src = jax.device_put(cpx.of(src))
        jax.block_until_ready(src.re)

    u, info = solve_helmholtz(vel, src, 350e3, grid, cfg)
    jax.device_get(info.rel_residual)  # sync (block_until_ready is a no-op
    # on the targeted runtime; see .claude/skills/verify)
    t0 = time.perf_counter()
    u, info = solve_helmholtz(vel, src, 350e3, grid, cfg)
    res = np.asarray(jax.device_get(info.rel_residual)).max()
    dt = time.perf_counter() - t0
    print(f"{n}^2 direct solve, 16 RHS: {dt * 1e3:.0f} ms warm, "
          f"max rel residual {res:.2e}")


if __name__ == "__main__":
    main()
