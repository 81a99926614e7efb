"""3D iteration cost ladder: transform precision, restart, tolerance.

Round-5 verdict item 3: the 3D production iteration (64^3 / 16 tx /
300 kHz GMRES-CBS with DFT matmul transforms) runs at 1.4% MFU — the
utilization floor of the framework — with every transform at HIGHEST
(6-pass) MXU precision. This ladder measures, at the warm-started
production operating point, the same discipline the 2D loop got
(fast_* flags, PERF_NOTES round 3):

  1. spectral_precision in {highest, high, default} — the DFT matmuls
     are ~all the MXU work of a matvec; HIGH (bf16x3) halves the passes,
     DEFAULT (single-pass bf16) is 6x fewer. Quality-gated on the final
     model RMSE vs the known phantom, not on per-solve accuracy.
  2. gmres_restart in {8, 16} — longer recurrences cut restarts (and
     total matvecs) at O(restart) extra Arnoldi volume passes.
  3. gmres_tol in {2e-3, 5e-3} — the matvec-count lever; gated on RMSE.

Each config: 4 warm-started CG iterations, min-of-2 timing, one JSON
line. Run: python examples/ladder3d.py   (TPU, ~15-25 min incl compiles)

`python examples/ladder3d.py --eps` instead probes the CBS damping scale
(born_gmres_solve_3d(eps_scale=...)): one forward solve at the same
operating point per scale — matvec count, wall time, and solution parity
vs the classical eps (all solves share tol, so converged solutions agree
to ~tol by construction; the ladder checks it).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def eps_ladder(n=64, d=0.75e-3):
    from waveforminversionust_tpu import PMLConfig
    from waveforminversionust_tpu.models.acquisition3d import (
        build_acquisition3d, cylinder_positions, source_fields_3d)
    from waveforminversionust_tpu.models.grid3d import Grid3D
    from waveforminversionust_tpu.ops import cpx as cpxlib
    from waveforminversionust_tpu.ops.born3d import born_gmres_solve_3d

    f, c0 = 300e3, 1500.0
    grid = Grid3D(nx=n, ny=n, nz=n, dx=d, dy=d, dz=d,
                  x0=-(n - 1) * d / 2, y0=-(n - 1) * d / 2,
                  z0=-(n - 1) * d / 2)
    half = (n - 1) * d / 2
    pml = PMLConfig(a0=20.0, l_pml=8 * d)
    pos = cylinder_positions(n_rings=2, n_per_ring=8, radius=0.75 * half,
                             z_span=0.5 * half)
    acq = build_acquisition3d(grid, pos, min_angle=0.8)
    zz = grid.z0 + grid.dz * jnp.arange(grid.nz)
    yy = grid.y0 + grid.dy * jnp.arange(grid.ny)
    xx = grid.x0 + grid.dx * jnp.arange(grid.nx)
    r2 = (zz[:, None, None] ** 2 + yy[None, :, None] ** 2
          + xx[None, None, :] ** 2)
    vel = (c0 + 40.0 * jnp.exp(-r2 / (0.33 * half) ** 2)).astype(jnp.float32)
    src = cpxlib.scale(source_fields_3d(acq, grid), 1e6)

    # vel/src as jit ARGUMENTS (closure constants would serialize ~34 MB
    # into each program for the remote compiler); eps_scale stays static
    # (it feeds stop_gradient'd scalars that shape the compiled operator).
    def solve(v, s, scale):
        return born_gmres_solve_3d(v, s, f, grid, pml, maxiter=400,
                                   tol=2e-3, restart=8, spectral="auto",
                                   spectral_precision="high",
                                   eps_scale=scale)

    solve_jit = jax.jit(solve, static_argnames=("scale",))

    u_ref = None
    for scale in (1.0, 0.85, 0.7, 0.5, 0.35, 1.25):
        def run():
            return solve_jit(vel, src, scale)
        u, mv = run()  # compile
        np.asarray(jax.device_get(u.re[0, 0, 0, :4]))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            u, mv = run()
            np.asarray(jax.device_get(u.re[0, 0, 0, :4]))
            best = min(best, time.perf_counter() - t0)
        if u_ref is None:
            u_ref = u
        rel = jax.jit(lambda a, b: jnp.sqrt(
            jnp.sum((a.re - b.re) ** 2 + (a.im - b.im) ** 2)
            / jnp.sum(b.re ** 2 + b.im ** 2)))(u, u_ref)
        print(json.dumps({
            "eps_scale": scale,
            "matvecs": int(np.asarray(jax.device_get(mv))),
            "solve_s": round(best, 3),
            "rel_diff_vs_eps1": float(np.asarray(jax.device_get(rel))),
        }), flush=True)


def main(n=64, d=0.75e-3):
    from waveforminversionust_tpu import FWIConfig, PMLConfig
    from waveforminversionust_tpu.fwi.fwi3d import (build_fwi_data_3d,
                                                    nonlinear_cg_3d,
                                                    sample_receivers_3d)
    from waveforminversionust_tpu.models.acquisition3d import (
        build_acquisition3d, cylinder_positions, source_fields_3d)
    from waveforminversionust_tpu.models.grid3d import Grid3D
    from waveforminversionust_tpu.ops import cpx as cpxlib
    from waveforminversionust_tpu.ops.born3d import born_gmres_solve_3d

    f, c0 = 300e3, 1500.0
    grid = Grid3D(nx=n, ny=n, nz=n, dx=d, dy=d, dz=d,
                  x0=-(n - 1) * d / 2, y0=-(n - 1) * d / 2,
                  z0=-(n - 1) * d / 2)
    half = (n - 1) * d / 2
    pml = PMLConfig(a0=20.0, l_pml=8 * d)
    pos = cylinder_positions(n_rings=2, n_per_ring=8, radius=0.75 * half,
                             z_span=0.5 * half)
    acq = build_acquisition3d(grid, pos, min_angle=0.8)
    zz = grid.z0 + grid.dz * jnp.arange(grid.nz)
    yy = grid.y0 + grid.dy * jnp.arange(grid.ny)
    xx = grid.x0 + grid.dx * jnp.arange(grid.nx)
    r2 = (zz[:, None, None] ** 2 + yy[None, :, None] ** 2
          + xx[None, None, :] ** 2)
    vel_true = (c0 + 40.0 * jnp.exp(-r2 / (0.33 * half) ** 2)
                ).astype(jnp.float32)
    src = cpxlib.scale(source_fields_3d(acq, grid), 1e6)

    # Synthesis at HIGHEST (data must not share the inversion's precision
    # shortcut — that would hide transform bias by inverse crime).
    def synth(v, s):
        return born_gmres_solve_3d(v, s, f, grid, pml, maxiter=400,
                                   tol=2e-3, restart=8, spectral="auto")

    wv, mv = jax.jit(synth)(vel_true, src)
    rec_obs = sample_receivers_3d(wv, jnp.asarray(acq.rx_idx))
    print(f"# synthesis matvecs: {int(np.asarray(jax.device_get(mv)))}",
          flush=True)
    data = build_fwi_data_3d(acq, rec_obs, f, grid)._replace(src=src)
    vel0 = jnp.full(grid.shape, c0, jnp.float32)
    n_it = 4
    fwi = FWIConfig(num_iterations=n_it,
                    clip_velocity=(c0 - 100.0, c0 + 100.0))

    def run(prec, restart, tol):
        vel, metrics = nonlinear_cg_3d(
            vel0, data, grid, fwi, pml=pml, num_iterations=n_it,
            iter_cap=400, solver3d="gmres", spectral="auto",
            warm_start=True, spectral_precision=prec,
            gmres_restart=restart, gmres_tol=tol)
        loss = np.asarray(jax.device_get(metrics.loss))
        return vel, loss

    configs = [("highest", 8, 2e-3),   # production baseline (bench r4)
               ("high", 8, 2e-3),
               ("default", 8, 2e-3),
               ("high", 16, 2e-3),
               ("high", 8, 5e-3)]
    for prec, restart, tol in configs:
        vel, loss = run(prec, restart, tol)  # compile
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            vel, loss = run(prec, restart, tol)
            best = min(best, time.perf_counter() - t0)
        rmse = float(jnp.sqrt(jnp.mean((vel - vel_true) ** 2)))
        print(json.dumps({
            "config": f"prec={prec} restart={restart} tol={tol}",
            "sec_per_iter": round(best / n_it, 3),
            "rmse_m_s": round(rmse, 3),
            "loss": [float(x) for x in loss],
        }), flush=True)


if __name__ == "__main__":
    if "--eps" in sys.argv[1:]:
        eps_ladder()
    else:
        main()
