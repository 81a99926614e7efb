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


def _initial_velocity(c_init, fwi: FWIConfig, grid: Grid2D):
    """Starting model: None -> homogeneous fwi.c_init; scalar -> homogeneous;
    (ny, nx) map (e.g. fwi.traveltime.traveltime_init) -> as given."""
    if c_init is None:
        return jnp.full(grid.shape, fwi.c_init, jnp.float32)
    c = jnp.asarray(c_init, jnp.float32)
    if c.ndim == 0:
        return jnp.full(grid.shape, c, jnp.float32)
    if c.shape != grid.shape:
        raise ValueError(f"c_init shape {c.shape} != grid shape {grid.shape}")
    return c


def invert_dataset(dataset, grid: Grid2D | None = None,
                   acquisition: AcquisitionConfig = AcquisitionConfig(),
                   solver: SolverConfig = SolverConfig(),
                   fwi: FWIConfig = FWIConfig(),
                   continuation: ContinuationConfig | None = None,
                   method: str = "cg",
                   callback: Callable | None = None,
                   attenuation=None,
                   checkpoint_dir: str | None = None,
                   checkpoint_every: int | None = None,
                   resume_from: str | None = None,
                   live_every: int | None = None,
                   live_callback: Callable | None = None,
                   c_init=None,
                   mesh=None, grid_axis: str = "grid",
                   receiver_calibration: bool = False) -> InversionResult:
    """Invert a RingDataset (loaded or synthesized).

    Args:
        dataset: :class:`~..data.synthesize.RingDataset`.
        grid: reconstruction grid (defaults to the reference's 301x301).
        method: "cg" (nonlinear conjugate gradient, the reference's primary
            path), "lbfgs" (autodiff quasi-Newton), "gn" (truncated
            Gauss-Newton, fwi.newton — fewer outer iterations to a given
            misfit), or "joint-multifreq"
            (all frequencies of a {frequency: dataset} mapping inverted
            JOINTLY — summed misfits/gradients per iteration — instead of
            warm-started sequential continuation).
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
        checkpoint_dir / checkpoint_every: when both are set (CG method),
            each stage runs in chunks of ``checkpoint_every`` iterations and
            the FULL resumable CG state (velocity, search direction,
            previous gradient, stage/iteration counters, metrics so far) is
            written to ``checkpoint_dir/latest`` after every chunk — a
            10-hour run that dies mid-stage loses at most
            ``checkpoint_every`` iterations. The per-stage ``callback``
            still fires at stage boundaries.
        resume_from: path of a ``latest`` checkpoint saved as above; the
            inversion continues from the exact saved point (completed
            stages are skipped, the interrupted stage restarts at the saved
            iteration with the saved CG carry) and reproduces the
            uninterrupted trajectory. Returned metrics include the restored
            history of the interrupted stage onward.
        c_init: initial velocity model — None (homogeneous at
            ``fwi.c_init``, the reference's start: fwi_script.py:90), a
            scalar [m/s], or an (ny, nx) map on the reconstruction grid,
            e.g. a travel-time tomogram from
            fwi.traveltime.traveltime_init (the production defense
            against cycle skipping at strong contrasts).
        receiver_calibration: estimate and divide out per-element receiver
            sensitivities (fwi.calibrate.estimate_receiver_sensitivities)
            against the current model at every stage boundary — removes the
            per-receiver response term that per-shot source estimation
            cannot absorb. Off by default (the reference has no receiver
            model; synthetic data is receiver-ideal).
        mesh / grid_axis: with ``solver.factorization == "spike"`` (CG and
            GN methods), the whole inversion runs grid-sharded over the mesh's
            ``grid_axis`` — one y-slab of the reconstruction grid per device
            (distributed SPIKE direct solves; see parallel.spike) — lifting
            the single-chip grid-size limit. ``grid.ny`` must divide by the
            mesh axis size.
        live_every / live_callback: the reference's live-plot cadence
            (FrequencyDomainFWI.m:176-188 redraws the reconstruction every
            iteration). ``live_callback(stage_idx, frequency, iteration,
            velocity, chunk_metrics)`` fires every ``live_every`` CG
            iterations, host-side between jitted chunks (``live_every=1``
            is the MATLAB cadence; see viz.make_live_plot_callback).
    """
    # ``dataset`` may be a single RingDataset or a {frequency: RingDataset}
    # mapping for broadband acquisitions (per-stage observed data). The
    # reference schema is single-frequency; the mapping form feeds
    # multi-frequency continuation with true per-frequency recordings.
    per_freq = isinstance(dataset, dict)
    if mesh is not None and method not in ("cg", "gn"):
        raise ValueError("grid-sharded (mesh=) inversion is implemented for "
                         "the CG and GN methods")
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

    if method == "joint-multifreq":
        # Joint inversion over ALL frequencies at once (summed misfits and
        # gradients per iteration) — the alternative to warm-started
        # sequential continuation; needs the {frequency: dataset} form.
        if not per_freq:
            raise ValueError("method='joint-multifreq' needs a "
                             "{frequency: RingDataset} mapping")
        from .multifreq import nonlinear_cg_multifreq, stack_frequencies
        datas = [build_fwi_data(acq, dataset[f].rec_data, f,
                                split=solver.split_complex,
                                attenuation=attenuation)
                 for f in sorted(dataset)]
        mf = stack_frequencies(datas)
        vel0 = _initial_velocity(c_init, fwi, grid)
        vel, m = nonlinear_cg_multifreq(vel0, mf, grid, solver, fwi)
        metrics = {f: np.asarray(getattr(m, f)) for f in CGMetrics._fields}
        if callback is not None:
            callback(0, tuple(sorted(dataset)), vel, m)
        return InversionResult(velocity=np.asarray(vel), metrics=metrics,
                               grid=grid,
                               frequencies=tuple(sorted(dataset)))

    if continuation is None or not continuation.frequencies:
        stages = [(float(ds0.f), int(fwi.num_iterations))]
    else:
        stages = [(float(f), int(continuation.iterations_per_frequency))
                  for f in continuation.frequencies]

    vel = _initial_velocity(c_init, fwi, grid)
    histories: list[CGMetrics] = []
    losses_lbfgs: list[np.ndarray] = []

    start_stage, start_iter = 0, 0
    init_sd = init_gp = None
    resumed_parts: list[CGMetrics] = []
    if resume_from is not None:
        from ..utils.checkpoint import load_state
        st = load_state(resume_from)
        vel = jnp.asarray(st["velocity"], jnp.float32)
        start_stage = int(st["stage"])
        start_iter = int(st["iteration"])
        init_sd = st.get("search_dir")
        init_gp = st.get("grad_prev")
        m = st.get("metrics")
        if m is not None and start_iter > 0:
            resumed_parts = [CGMetrics(loss=np.asarray(m["loss"]),
                                       grad_norm=np.asarray(m["grad_norm"]),
                                       beta=np.asarray(m["beta"]),
                                       step_size=np.asarray(m["step_size"]))]

    checkpointing = (checkpoint_dir is not None and checkpoint_every
                     and method == "cg")
    live = live_callback is not None and live_every and method == "cg"
    if checkpointing:
        import os

        from ..utils.checkpoint import save_state
        latest_path = os.path.join(checkpoint_dir, "latest")

    def _cat_metrics(parts: list[CGMetrics]) -> CGMetrics:
        return CGMetrics(*(np.concatenate([np.asarray(getattr(p, f))
                                           for p in parts])
                           for f in CGMetrics._fields))

    for stage_idx, (freq, n_iter) in enumerate(stages):
        if stage_idx < start_stage:
            continue
        resuming_here = stage_idx == start_stage and resume_from is not None
        stage_it = start_iter if resuming_here else 0
        sd0 = init_sd if resuming_here else None
        gp0 = init_gp if resuming_here else None
        parts = list(resumed_parts) if resuming_here else []
        if resuming_here and stage_it >= n_iter:
            # The checkpoint landed exactly on this stage's boundary: the
            # stage is complete; carry its restored history forward.
            if parts:
                histories.append(_cat_metrics(parts))
            continue
        stage_ds = dataset[freq] if per_freq else dataset
        data = build_fwi_data(acq, stage_ds.rec_data, freq,
                              split=solver.split_complex,
                              attenuation=attenuation)
        if receiver_calibration:
            # Re-estimate per-element receiver sensitivities against the
            # CURRENT model at every stage boundary (host-side, one forward
            # solve; fwi.calibrate) — residual model error in the estimate
            # shrinks as continuation sharpens the model.
            from .calibrate import estimate_receiver_sensitivities
            _, data = estimate_receiver_sensitivities(data, acq, vel, grid,
                                                      solver)
        if method == "cg":
            sd, gp = sd0, gp0
            while stage_it < n_iter:
                chunk = n_iter - stage_it
                if checkpointing:
                    chunk = min(chunk, int(checkpoint_every))
                if live:
                    chunk = min(chunk, int(live_every))
                res = nonlinear_cg(vel, data, grid, solver, fwi,
                                   num_iterations=chunk,
                                   init_search_dir=sd, init_grad_prev=gp,
                                   iteration_offset=jnp.int32(stage_it),
                                   mesh=mesh, grid_axis=grid_axis)
                vel = res.velocity
                sd, gp = res.search_dir, res.gradient
                parts.append(res.metrics)
                stage_it += chunk
                if live and (stage_it % int(live_every) == 0
                             or stage_it >= n_iter):
                    live_callback(stage_idx, freq, stage_it,
                                  np.asarray(vel), res.metrics)
                if checkpointing:
                    m_sofar = _cat_metrics(parts)
                    save_state(latest_path, {
                        "velocity": np.asarray(vel),
                        "search_dir": np.asarray(sd),
                        "grad_prev": np.asarray(gp),
                        "stage": np.int32(stage_idx),
                        "iteration": np.int32(stage_it),
                        "frequency": np.float64(freq),
                        "metrics": {f: np.asarray(getattr(m_sofar, f))
                                    for f in CGMetrics._fields},
                    })
            stage_metrics = _cat_metrics(parts)
            histories.append(stage_metrics)
        elif method == "lbfgs":
            res = run_lbfgs(vel, data, grid, solver, num_iterations=n_iter,
                            fwi=fwi)
            vel = res.velocity
            losses_lbfgs.append(np.asarray(res.loss_history))
            stage_metrics = res.loss_history
        elif method == "gn":
            from .newton import run_gauss_newton
            res = run_gauss_newton(vel, data, grid, solver, fwi=fwi,
                                   num_iterations=n_iter, mesh=mesh,
                                   grid_axis=grid_axis)
            vel = res.velocity
            losses_lbfgs.append(np.asarray(res.metrics.loss))
            stage_metrics = res.metrics
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
