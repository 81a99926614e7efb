"""Turnkey 3D inversion driver: multi-frequency continuation over the
volumetric optimizer family.

The 3D counterpart of :mod:`.runner` (reference driver: fwi_script.py —
strictly 2D, single frequency). Takes the ``{frequency: FWIData3D}``
mapping :func:`~..data.timedomain3d.timedomain_to_fwi_data_3d` produces
(or a single dataset), runs low-to-high warm-started stages through the
chosen optimizer (CG / Gauss-Newton / L-BFGS — the same method surface as
the 2D ``invert_dataset``), and collects per-iteration histories.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np

from ..config import ContinuationConfig, FWIConfig, PMLConfig
from ..models.grid3d import Grid3D
from .fwi3d import FWIData3D, nonlinear_cg_3d


class InversionResult3D(NamedTuple):
    velocity: np.ndarray          # (nz, ny, nx) reconstructed speed [m/s]
    metrics: dict                 # per-iteration scalar histories
    grid: Grid3D
    frequencies: tuple            # continuation schedule actually used


def reconstruction_rmse_3d(velocity, grid: Grid3D, true_map,
                           true_grid: Grid3D | None = None,
                           radius: float = 100e-3,
                           z_halfspan: float | None = None) -> float:
    """RMSE between a recovered volume and a (possibly different-grid)
    truth, evaluated inside the array cylinder (|r_xy| < radius, |z| <
    z_halfspan) — the volumetric analogue of :func:`.runner.
    reconstruction_rmse` (the region outside the array carries no data
    constraint and would dominate an unmasked score)."""
    v = np.asarray(velocity)
    if true_grid is None or true_grid == grid:
        interp = np.asarray(true_map)
    else:
        t = np.asarray(true_map)
        fz = np.clip((grid.z - true_grid.z0) / true_grid.dz, 0,
                     true_grid.nz - 1 - 1e-6)
        fy = np.clip((grid.y - true_grid.y0) / true_grid.dy, 0,
                     true_grid.ny - 1 - 1e-6)
        fx = np.clip((grid.x - true_grid.x0) / true_grid.dx, 0,
                     true_grid.nx - 1 - 1e-6)
        iz, iy, ix = (f.astype(int) for f in (fz, fy, fx))
        wz = (fz - iz)[:, None, None]
        wy = (fy - iy)[None, :, None]
        wx = (fx - ix)[None, None, :]

        def g(dz_, dy_, dx_):
            return t[np.ix_(iz + dz_, iy + dy_, ix + dx_)]

        interp = ((g(0, 0, 0) * (1 - wx) + g(0, 0, 1) * wx) * (1 - wy)
                  + (g(0, 1, 0) * (1 - wx) + g(0, 1, 1) * wx) * wy
                  ) * (1 - wz) + (
                  (g(1, 0, 0) * (1 - wx) + g(1, 0, 1) * wx) * (1 - wy)
                  + (g(1, 1, 0) * (1 - wx) + g(1, 1, 1) * wx) * wy) * wz
    Z, Y, X = grid.meshgrid()
    inside = np.hypot(X, Y) < radius
    if z_halfspan is not None:
        inside &= np.abs(Z) < z_halfspan
    return float(np.sqrt(np.mean((v - interp)[inside] ** 2)))


def _initial_velocity_3d(c_init, fwi: FWIConfig, grid: Grid3D):
    """None -> homogeneous fwi.c_init; scalar -> homogeneous; (nz, ny, nx)
    volume (e.g. fwi.traveltime3d.traveltime_init_3d) -> as given."""
    if c_init is None:
        return jnp.full(grid.shape, jnp.float32(fwi.c_init))
    arr = jnp.asarray(c_init, jnp.float32)
    if arr.ndim == 0:
        return jnp.full(grid.shape, arr)
    if arr.shape != grid.shape:
        raise ValueError(f"c_init shape {arr.shape} != grid {grid.shape}")
    return arr


def invert_dataset_3d(datasets, grid: Grid3D,
                      fwi: FWIConfig = FWIConfig(),
                      continuation: ContinuationConfig | None = None,
                      method: str = "cg",
                      c_init=None,
                      pml: PMLConfig = PMLConfig(a0=20.0, l_pml=12e-3),
                      iter_cap: int = 600,
                      solver3d: str = "gmres", gmres_tol: float = 2e-3,
                      gmres_restart: int = 8, spectral: str = "auto",
                      mesh=None, grid_axis: str = "grid",
                      encode: int | None = None, encode_seed: int = 0,
                      chunk_iterations: int | None = None,
                      callback: Callable | None = None,
                      cg_iters: int = 6, lm_damping: float = 0.1,
                      reg_smooth: float = 1.0,
                      num_iterations: int | None = None,
                      checkpoint_dir: str | None = None,
                      resume_from: str | None = None) -> InversionResult3D:
    """Invert one or many per-frequency 3D datasets.

    Args:
        datasets: a single :class:`~.fwi3d.FWIData3D` or a
            ``{frequency: FWIData3D}`` mapping (e.g. from
            ``timedomain_to_fwi_data_3d``).
        method: "cg" (:func:`~.fwi3d.nonlinear_cg_3d`; supports ``mesh``
            grid sharding and ``encode`` supershots), "gn"
            (:func:`~.newton.run_gauss_newton_3d`; ``cg_iters``/
            ``lm_damping``/``reg_smooth`` are its knobs), "lbfgs"
            (:func:`~.lbfgs.run_lbfgs_3d`), or "alpha"/"joint"
            (:func:`~.lbfgs.run_lbfgs_attenuation_3d`: attenuation-map
            inversion in the fixed c_init medium / jointly with velocity;
            the recovered map lands in ``metrics['attenuation']``).
        continuation: optional schedule; each listed frequency (which must
            be a key of ``datasets``) runs ``iterations_per_frequency``
            iterations warm-started from the previous stage. When None,
            every dataset runs once in ascending frequency order with the
            method's default iteration count (or ``num_iterations``).
        c_init: starting volume — None (homogeneous ``fwi.c_init``),
            scalar, or an (nz, ny, nx) array (e.g. ``traveltime_init_3d``).
        callback: ``callback(stage_idx, frequency, velocity,
            stage_metrics)`` after every stage.
        checkpoint_dir: save the full driver state (velocity, alpha,
            histories, completed stage) to ``<dir>/latest`` after every
            stage; ``resume_from`` a saved state restarts at the next
            stage with identical trajectories (stage granularity — 3D
            stages are the expensive unit; the 2D driver checkpoints
            within stages too).

    Returns:
        :class:`InversionResult3D` with ``metrics['loss']`` /
        ``metrics['frequency']`` concatenated over stages.
    """
    if isinstance(datasets, FWIData3D):
        datasets = {float(np.asarray(datasets.f)): datasets}
    elif isinstance(datasets, (list, tuple)):
        # e.g. the list timedomain_to_fwi_data_3d returns
        datasets = {float(np.asarray(d.f)): d for d in datasets}
    if continuation is not None and continuation.frequencies:
        # Tolerant key match: dataset keys round-trip through the float32
        # FWIData3D.f while user schedules are float64 (np.arange emits
        # 300000.00000000004-style values) — exact dict lookup would
        # spuriously miss.
        keys = np.array(sorted(datasets))
        schedule = []
        for f in continuation.frequencies:
            i = int(np.argmin(np.abs(keys - float(f))))
            if abs(keys[i] - float(f)) > 1e-6 * max(abs(float(f)), 1.0):
                raise ValueError(f"continuation frequency {f} not in "
                                 f"datasets ({sorted(datasets)})")
            schedule.append((float(keys[i]),
                             continuation.iterations_per_frequency))
    else:
        schedule = [(f, num_iterations) for f in sorted(datasets)]

    vel = _initial_velocity_3d(c_init, fwi, grid)
    alpha = jnp.zeros(grid.shape, jnp.float32)   # alpha/joint warm start
    losses, freq_trace = [], []
    start_stage = 0
    if resume_from is not None:
        from ..utils.checkpoint import load_state
        st = load_state(resume_from)
        vel = jnp.asarray(st["velocity"], jnp.float32)
        alpha = jnp.asarray(st["attenuation"], jnp.float32)
        start_stage = int(st["stage"]) + 1        # that stage completed
        losses = [np.asarray(st["loss"])]
        freq_trace = [np.asarray(st["freq_trace"])]
    if checkpoint_dir is not None:
        import os

        from ..utils.checkpoint import save_state
        os.makedirs(checkpoint_dir, exist_ok=True)

    for stage_idx, (f, iters) in enumerate(schedule):
        if stage_idx < start_stage:
            continue
        data = datasets[f]
        if data.rec_ref is not None and method not in ("cg", "lbfgs"):
            raise ValueError(
                "scattered-field data (rec_ref) is supported by the "
                "cg and lbfgs methods; gn/alpha/joint would compare the "
                "total simulation against scattered observations")
        if method == "cg":
            vel, metrics = nonlinear_cg_3d(
                vel, data, grid, fwi, num_iterations=iters, pml=pml,
                iter_cap=iter_cap, mesh=mesh, grid_axis=grid_axis,
                solver3d=solver3d, gmres_tol=gmres_tol,
                gmres_restart=gmres_restart, spectral=spectral,
                encode=encode, encode_seed=encode_seed + stage_idx,
                chunk_iterations=chunk_iterations)
            stage_loss = np.asarray(metrics.loss)
        elif method == "gn":
            from .newton import run_gauss_newton_3d
            if mesh is not None or encode is not None:
                raise ValueError("mesh/encode are CG-path options; "
                                 "pre-encode GN data with "
                                 "fwi3d.encode_supershots instead")
            vel, metrics = run_gauss_newton_3d(
                vel, data, grid, fwi,
                num_iterations=(iters if iters is not None else 5),
                cg_iters=cg_iters, lm_damping=lm_damping,
                reg_smooth=reg_smooth, pml=pml, iter_cap=iter_cap,
                solver3d=solver3d, gmres_tol=gmres_tol,
                gmres_restart=gmres_restart, spectral=spectral)
            stage_loss = np.asarray(metrics.loss)
        elif method == "lbfgs":
            from .lbfgs import run_lbfgs_3d
            if mesh is not None or encode is not None:
                raise ValueError("mesh/encode are CG-path options")
            res = run_lbfgs_3d(
                vel, data, grid, pml, iter_cap=iter_cap, spectral=spectral,
                use_gmres=(solver3d == "gmres"), tol=gmres_tol,
                restart=gmres_restart,
                num_iterations=(iters if iters is not None else 10))
            vel, metrics = res.velocity, res
            stage_loss = np.asarray(res.loss_history)
        elif method in ("alpha", "joint"):
            from .lbfgs import run_lbfgs_attenuation_3d
            if mesh is not None or encode is not None:
                raise ValueError("mesh/encode are CG-path options")
            res = run_lbfgs_attenuation_3d(
                vel, alpha, data, grid, pml, iter_cap=iter_cap,
                spectral=spectral, use_gmres=(solver3d == "gmres"),
                tol=gmres_tol, restart=gmres_restart,
                num_iterations=(iters if iters is not None else 10),
                invert_velocity=(method == "joint"))
            vel, alpha, metrics = res.velocity, res.attenuation, res
            stage_loss = np.asarray(res.loss_history)
        else:
            raise ValueError(f"unknown method {method!r} (expected 'cg', "
                             "'gn', 'lbfgs', 'alpha' or 'joint')")
        if fwi.clip_velocity is not None:
            vel = jnp.clip(vel, *fwi.clip_velocity)
        losses.append(stage_loss)
        freq_trace.append(np.full(len(stage_loss), f))
        if checkpoint_dir is not None:
            save_state(os.path.join(checkpoint_dir, "latest"), {
                "velocity": np.asarray(vel, np.float32),
                "attenuation": np.asarray(alpha, np.float32),
                "stage": np.int32(stage_idx),
                "loss": np.concatenate(losses),
                "freq_trace": np.concatenate(freq_trace),
            })
        if callback is not None:
            callback(stage_idx, f, vel, metrics)

    metrics_out = {"loss": np.concatenate(losses),
                   "frequency": np.concatenate(freq_trace)}
    if method in ("alpha", "joint"):
        metrics_out["attenuation"] = np.asarray(alpha)
    return InversionResult3D(
        velocity=np.asarray(vel), metrics=metrics_out,
        grid=grid, frequencies=tuple(f for f, _ in schedule))
