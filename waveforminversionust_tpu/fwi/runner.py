"""High-level inversion drivers: dataset -> reconstruction.

The reference's driver scripts (reference: fwi_script.py:13-131,
FrequencyDomainFWI.m:1-75) hand-assemble grid, masks, indices and sources
inline; here :func:`invert_dataset` does the whole load->preprocess->invert
pipeline in one call, including multi-frequency continuation (the reference's
stated future work) and optional checkpointing.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops.solve import auto_split
from ..config import (AcquisitionConfig, ContinuationConfig, FWIConfig,
                      SolverConfig)
from ..models.acquisition import build_ring_acquisition
from ..models.grid import Grid2D
from .lbfgs import run_lbfgs
from .objective import build_fwi_data
from .optimizers import CGMetrics, nonlinear_cg


class InversionResult(NamedTuple):
    velocity: np.ndarray          # (ny, nx) reconstructed speed [m/s]
    metrics: dict                 # per-iteration scalar histories
    grid: Grid2D
    frequencies: tuple            # continuation schedule actually used


def default_inversion_grid() -> Grid2D:
    """The reference's 301x301 / 0.8 mm reconstruction grid
    (reference: fwi_script.py:46-49)."""
    return Grid2D.centered(120e-3, 0.8e-3)


def invert_dataset(dataset, grid: Grid2D | None = None,
                   acquisition: AcquisitionConfig = AcquisitionConfig(),
                   solver: SolverConfig = SolverConfig(),
                   fwi: FWIConfig = FWIConfig(),
                   continuation: ContinuationConfig | None = None,
                   method: str = "cg",
                   callback: Callable | None = None,
                   attenuation=None) -> InversionResult:
    """Invert a RingDataset (loaded or synthesized).

    Args:
        dataset: :class:`~..data.synthesize.RingDataset`.
        grid: reconstruction grid (defaults to the reference's 301x301).
        method: "cg" (nonlinear conjugate gradient, the reference's primary
            path) or "lbfgs" (autodiff quasi-Newton).
        continuation: optional multi-frequency schedule; each stage runs
            ``iterations_per_frequency`` iterations at one frequency,
            warm-starting from the previous stage (low-to-high ordering
            recommended). When None, a single stage at ``dataset.f`` runs
            ``fwi.num_iterations`` iterations.
        callback: called as callback(stage_index, frequency, velocity,
            stage_metrics) after each stage (host-side; use for logging /
            checkpointing / plotting).
        attenuation: optional known attenuation alpha [Np/m] — a scalar
            (uniform medium) or an (ny, nx) map on the RECONSTRUCTION grid;
            velocity is inverted in this fixed lossy medium (FD methods
            only).
    """
    # ``dataset`` may be a single RingDataset or a {frequency: RingDataset}
    # mapping for broadband acquisitions (per-stage observed data). The
    # reference schema is single-frequency; the mapping form feeds
    # multi-frequency continuation with true per-frequency recordings.
    per_freq = isinstance(dataset, dict)
    if attenuation is not None and np.ndim(attenuation) == 0:
        attenuation = (None if float(attenuation) == 0.0 else
                       np.full((grid or default_inversion_grid()).shape,
                               float(attenuation), np.float32))
    ds0 = next(iter(dataset.values())) if per_freq else dataset
    grid = grid or default_inversion_grid()
    acq = build_ring_acquisition(grid, acquisition,
                                 x_elem=ds0.x_circ, y_elem=ds0.y_circ)
    # Auto-select the split-complex engine off-CPU (see ops.cpx), unless the
    # caller pinned it explicitly in the solver config.
    solver = auto_split(solver)

    if continuation is None or not continuation.frequencies:
        stages = [(float(ds0.f), int(fwi.num_iterations))]
    else:
        stages = [(float(f), int(continuation.iterations_per_frequency))
                  for f in continuation.frequencies]

    vel = jnp.full(grid.shape, fwi.c_init, jnp.float32)
    histories: list[CGMetrics] = []
    losses_lbfgs: list[np.ndarray] = []
    for stage_idx, (freq, n_iter) in enumerate(stages):
        stage_ds = dataset[freq] if per_freq else dataset
        data = build_fwi_data(acq, stage_ds.rec_data, freq,
                              split=solver.split_complex,
                              attenuation=attenuation)
        if method == "cg":
            res = nonlinear_cg(vel, data, grid, solver, fwi,
                               num_iterations=n_iter)
            vel = res.velocity
            histories.append(res.metrics)
            stage_metrics = res.metrics
        elif method == "lbfgs":
            res = run_lbfgs(vel, data, grid, solver, num_iterations=n_iter,
                            fwi=fwi)
            vel = res.velocity
            losses_lbfgs.append(np.asarray(res.loss_history))
            stage_metrics = res.loss_history
        else:
            raise ValueError(f"unknown method {method!r}")
        if callback is not None:
            callback(stage_idx, freq, vel, stage_metrics)

    if method == "cg":
        metrics = {
            "loss": np.concatenate([np.asarray(m.loss) for m in histories]),
            "grad_norm": np.concatenate([np.asarray(m.grad_norm) for m in histories]),
            "beta": np.concatenate([np.asarray(m.beta) for m in histories]),
            "step_size": np.concatenate([np.asarray(m.step_size) for m in histories]),
        }
    else:
        metrics = {"loss": np.concatenate(losses_lbfgs)}

    return InversionResult(velocity=np.asarray(vel), metrics=metrics,
                           grid=grid, frequencies=tuple(f for f, _ in stages))


def reconstruction_rmse(velocity, grid: Grid2D, true_map, true_grid: Grid2D,
                        radius: float = 100e-3) -> float:
    """RMSE between a reconstruction and a (possibly finer-grid) truth map,
    evaluated inside the ring — the quantitative score the reference never
    computed (it compared images visually; SURVEY.md section 4)."""
    # bilinear-sample the truth onto the reconstruction grid
    tx = (grid.x - true_grid.x0) / true_grid.dx
    ty = (grid.y - true_grid.y0) / true_grid.dy
    ix = np.clip(tx.astype(int), 0, true_grid.nx - 2)
    iy = np.clip(ty.astype(int), 0, true_grid.ny - 2)
    wx = np.clip(tx - ix, 0, 1)[None, :]
    wy = np.clip(ty - iy, 0, 1)[:, None]
    t = np.asarray(true_map)
    interp = (t[np.ix_(iy, ix)] * (1 - wx) * (1 - wy)
              + t[np.ix_(iy, ix + 1)] * wx * (1 - wy)
              + t[np.ix_(iy + 1, ix)] * (1 - wx) * wy
              + t[np.ix_(iy + 1, ix + 1)] * wx * wy)
    X, Y = grid.meshgrid()
    inside = np.hypot(X, Y) < radius
    return float(np.sqrt(np.mean((np.asarray(velocity) - interp)[inside] ** 2)))


def make_logging_callback(every: int = 1, prefix: str = "[fwi]"):
    """A simple stage callback printing loss trajectories (the reference
    prints per-iteration wall-clock only; SURVEY.md section 5)."""
    import numpy as _np

    def callback(stage_idx, freq, velocity, stage_metrics):
        if stage_idx % every:
            return
        loss = getattr(stage_metrics, "loss", stage_metrics)
        loss = _np.asarray(loss)
        print(f"{prefix} stage {stage_idx} f={freq / 1e3:.0f} kHz "
              f"loss {loss[0]:.3e} -> {loss[-1]:.3e}")

    return callback
