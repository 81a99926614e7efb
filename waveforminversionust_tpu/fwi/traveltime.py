"""Travel-time tomography initialization — beyond the reference.

The reference initializes FWI from a homogeneous 1480 m/s medium
(reference: fwi_script.py:90, FrequencyDomainFWI.m:46), which is viable at
its single 350 kHz frequency only because the breast-phantom contrast is
mild (~6 %). Production UST pipelines first invert direct-arrival travel
times into a smooth sound-speed map and start waveform inversion from
that — it is the standard defense against cycle skipping and it costs a
tiny linear solve. This module completes that workflow TPU-natively on
top of the broadband acquisition pipeline (data/timedomain.py):

  1. :func:`pick_arrival_times` — sub-sample direct-arrival picks from the
     complex analytic channel traces (circular envelope peak + parabolic
     refinement, unwrapped to absolute time with the straight-ray
     prediction; the comb-synthesized record is periodic with T = 1/df).
  2. :func:`straight_ray_times` — the linear forward map t = integral of
     slowness along straight tx->rx rays (midpoint rule, bilinear
     interpolation), one jitted gather/contract over all pairs: the (npair,
     n_samples, 4)-gather and the reductions are XLA-fused, batched work.
  3. :func:`invert_travel_times` — ray-density-preconditioned linear CG on
     the smoothed normal equations for the slowness perturbation (the
     transpose comes from ``jax.vjp`` of the forward map — exact, since the
     map is linear).
  4. :func:`traveltime_init` — the turnkey composition
     TimeDomainDataset -> c_init for fwi.runner.invert_dataset.

Straight rays are the right fidelity for an INITIAL model at soft-tissue
contrasts (<10 %): ray bending perturbs path length at second order in the
contrast, while the travel-time perturbation being inverted is first
order. For stronger contrasts :func:`invert_travel_times_bent` upgrades
the same linear machinery to BENT-ray tomography: each outer pass solves
the eikonal equation per source (fwi/eikonal.py), traces Fermat rays by
steepest descent on the travel-time fields, and re-solves the linear
problem along the new (fixed) paths — the standard production UST
tomography loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.grid import Grid2D
from .newton import _laplacian_ltl


def _predicted_times(x_elem, y_elem, c_ref: float) -> np.ndarray:
    """(ne, ne) straight-ray arrival predictions |pos_tx - pos_rx| / c_ref."""
    pos = np.stack([np.asarray(x_elem), np.asarray(y_elem)], axis=1)
    dist = np.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    return dist / c_ref


def pick_arrival_times(traces, times, df, t_ref,
                       search_halfwidth: float | None = None) -> np.ndarray:
    """Sub-sample direct-arrival times from complex analytic channel traces.

    For each trace the pick is the peak of the envelope ``|trace|`` on the
    circular time axis (the comb-synthesized record is periodic with
    ``T = 1/df``; see data/timedomain.py), refined to sub-sample precision
    by a parabolic fit through the peak's two circular neighbors, then
    unwrapped to an absolute time by adding the multiple of T closest to
    the straight-ray prediction ``t_ref``:

        t_abs = t_peak + round((t_ref - t_peak) / T) * T.

    Unwrapping is exact while the true arrival deviates from t_ref by less
    than T/2 — at soft-tissue contrasts the deviation is d*dc/c^2 (a few
    microseconds across a 220 mm ring), far inside typical records.

    Args:
        traces: (..., nt) complex analytic traces (for measured real-valued
            traces form the analytic signal first, e.g. scipy.signal.hilbert;
            the magnitude of a real trace is not its envelope). Gate the
            traces first (data.timedomain.direct_arrival_gate) when late
            reverberation can out-peak the direct arrival.
        times: (nt,) uniform sample times spanning one period 1/df.
        df: comb spacing [Hz]; the record period is 1/df.
        t_ref: (...,) straight-ray predictions, broadcastable to the trace
            batch shape — both the unwrap reference and the search center.
        search_halfwidth: restrict the peak search to the circular window
            ``t_ref +- search_halfwidth`` [s] (None = whole period). Use a
            window when gating is impossible and multiples are strong.

    Returns:
        (...,) float64 absolute arrival times [s].

    Host-side preprocessing of host-resident traces (numpy), like
    data.timedomain.extract_frequency_data.
    """
    env = np.abs(np.asarray(traces))
    t = np.asarray(times, np.float64)
    nt = env.shape[-1]
    if nt < 3:
        raise ValueError("picking needs at least 3 time samples")
    period = 1.0 / float(df)
    dt = period / nt
    t_ref = np.asarray(t_ref, np.float64)

    if search_halfwidth is not None:
        # circular distance from each sample to the (wrapped) prediction
        tr = np.broadcast_to(t_ref, env.shape[:-1]).reshape(-1)
        d = np.mod(t[None, :] - tr[:, None] + 0.5 * period,
                   period) - 0.5 * period
        masked = np.where(np.abs(d) <= search_halfwidth,
                          env.reshape(-1, nt), -np.inf)
        k = np.argmax(masked, axis=-1).reshape(env.shape[:-1])
    else:
        k = np.argmax(env, axis=-1)

    # parabolic sub-sample refinement through the circular neighbors
    flat = env.reshape(-1, nt)
    idx = np.arange(flat.shape[0])
    kf = k.reshape(-1)
    e0 = flat[idx, (kf - 1) % nt]
    e1 = flat[idx, kf]
    e2 = flat[idx, (kf + 1) % nt]
    denom = e0 - 2 * e1 + e2
    offs = np.where(np.abs(denom) > 1e-30 * np.maximum(e1, 1e-300),
                    0.5 * (e0 - e2) / denom, 0.0)
    offs = np.clip(offs, -0.5, 0.5).reshape(k.shape)

    t_peak = (k + offs) * dt  # in [0, T)
    wraps = np.round((t_ref - t_peak) / period)
    return t_peak + wraps * period


def _mean_slowness(slowness, pts, grid: Grid2D):
    """Mean of bilinearly-sampled ``slowness`` along each point path.

    ``pts`` is (npair, n_samples, 2) physical sample points; returns
    (npair,). LINEAR in ``slowness``.
    """
    fx = jnp.clip((pts[..., 0] - grid.x0) / grid.dx, 0.0, grid.nx - 1 - 1e-6)
    fy = jnp.clip((pts[..., 1] - grid.y0) / grid.dy, 0.0, grid.ny - 1 - 1e-6)
    ix = jnp.clip(fx.astype(jnp.int32), 0, grid.nx - 2)
    iy = jnp.clip(fy.astype(jnp.int32), 0, grid.ny - 2)
    wx = fx - ix
    wy = fy - iy
    s = ((1 - wx) * (1 - wy) * slowness[iy, ix]
         + wx * (1 - wy) * slowness[iy, ix + 1]
         + (1 - wx) * wy * slowness[iy + 1, ix]
         + wx * wy * slowness[iy + 1, ix + 1])
    return jnp.mean(s, axis=-1)


@partial(jax.jit, static_argnames=("grid", "n_samples"))
def straight_ray_times(slowness, tx_pos, rx_pos, grid: Grid2D,
                       n_samples: int = 512):
    """Travel times of straight rays through a slowness map (midpoint rule).

        t_i = |rx_i - tx_i| * mean_k slowness(tx_i + a_k (rx_i - tx_i)),
        a_k = (k + 1/2) / n_samples

    with bilinear interpolation of ``slowness`` at every sample point.
    LINEAR in ``slowness`` — its exact adjoint is ``jax.vjp`` of this
    function (used by :func:`invert_travel_times`).

    Args:
        slowness: (ny, nx) [s/m].
        tx_pos, rx_pos: (npair, 2) physical (x, y) endpoints [m].
        n_samples: quadrature points per ray; resolve the grid by choosing
            >= 2 * max(ny, nx) (the default suits reference-scale grids).

    Returns:
        (npair,) float32 travel times [s].
    """
    slowness = jnp.asarray(slowness, jnp.float32)
    tx = jnp.asarray(tx_pos, jnp.float32)
    rx = jnp.asarray(rx_pos, jnp.float32)
    alpha = (jnp.arange(n_samples, dtype=jnp.float32) + 0.5) / n_samples
    # (npair, n_samples, 2) sample points; fused into the gathers below
    p = tx[:, None, :] + alpha[None, :, None] * (rx - tx)[:, None, :]
    dist = jnp.linalg.norm(rx - tx, axis=-1)
    return dist * _mean_slowness(slowness, p, grid)


def _normal_eq_solve(b_apply, r0, grid: Grid2D, lam_smooth, cg_iters: int):
    """Smoothed normal equations (B^T B + reg L^T L) ds = B^T r0 by PCG.

    ``b_apply`` must be a NORMALIZED linear ray map (each row a mean of the
    slowness perturbation along its path — entries summing to 1), so
    diag(B^T B) is O(coverage) and one smoothing knob serves every
    geometry. Preconditioner: the ray-coverage map B^T 1. Traced inside
    the callers' jit.
    """
    bt_apply = jax.linear_transpose(b_apply, jnp.zeros(grid.shape, jnp.float32))
    rhs = bt_apply(r0)[0]
    density = bt_apply(jnp.ones_like(r0))[0]        # ray-coverage map
    diag = density + 1e-3 * jnp.max(density)
    # ||L^T L||_inf = 4 * ndim (8 in 2D, 12 in 3D — this core is shared
    # with fwi/traveltime3d.py)
    s_reg = lam_smooth * jnp.mean(density) / (4.0 * len(grid.shape))

    def hvp(ds):
        return bt_apply(b_apply(ds))[0] + s_reg * _laplacian_ltl(ds)

    # diagonally-preconditioned CG (same scheme as newton._pcg; the system
    # is SPD by construction)
    x = jnp.zeros(grid.shape, jnp.float32)
    r = rhs
    z = r / diag
    p = z
    rz = jnp.sum(r * z)
    b2 = jnp.maximum(jnp.sum(rhs * rhs), 1e-38)
    tol2 = 1e-10 * b2

    def step(carry, _):
        x, r, p, rz = carry
        live = jnp.sum(r * r) > tol2
        ap = hvp(p)
        alpha = rz / jnp.maximum(jnp.sum(p * ap), 1e-38)
        x1 = x + alpha * p
        r1 = r - alpha * ap
        z1 = r1 / diag
        rz1 = jnp.sum(r1 * z1)
        p1 = z1 + (rz1 / jnp.maximum(rz, 1e-38)) * p
        new = tuple(jnp.where(live, a, b_)
                    for a, b_ in zip((x1, r1, p1, rz1), (x, r, p, rz)))
        return new, None

    (x, r, _, _), _ = jax.lax.scan(step, (x, r, p, rz), None, length=cg_iters)
    relres = jnp.sqrt(jnp.sum(r * r) / b2)
    return x, relres


@partial(jax.jit, static_argnames=("grid", "n_samples", "cg_iters"))
def _invert_travel_times_jit(t_obs, tx_pos, rx_pos, grid: Grid2D,
                             c_ref, lam_smooth, n_samples: int,
                             cg_iters: int):
    s0 = 1.0 / jnp.asarray(c_ref, jnp.float32)
    dist = jnp.linalg.norm(jnp.asarray(rx_pos, jnp.float32)
                           - jnp.asarray(tx_pos, jnp.float32), axis=-1)
    dist = jnp.maximum(dist, 1e-12)

    def b_apply(ds):
        return straight_ray_times(ds, tx_pos, rx_pos, grid,
                                  n_samples=n_samples) / dist

    # mean-slowness residuals of the homogeneous background
    r0 = jnp.asarray(t_obs, jnp.float32) / dist - s0
    x, relres = _normal_eq_solve(b_apply, r0, grid, lam_smooth, cg_iters)
    return 1.0 / (s0 + x), relres


def invert_travel_times(t_obs, tx_pos, rx_pos, grid: Grid2D,
                        c_ref: float = 1500.0, lam_smooth: float = 1.0,
                        n_samples: int | None = None, cg_iters: int = 100,
                        clip_velocity: tuple[float, float] | None = None):
    """Linear straight-ray tomography: travel times -> sound-speed map.

    Solves the smoothed normal equations for the slowness perturbation
    ``ds`` about the homogeneous background ``1/c_ref``

        (B^T B + lam * mean(density)/8 * L^T L) ds = B^T (t_obs/d - 1/c_ref)

    with B the per-ray MEAN-slowness map (rows of the straight-ray operator
    divided by ray length — scale-free, so ``lam_smooth`` is geometry-
    portable), L^T L the forward-difference Laplacian (newton._laplacian_ltl)
    and ray-density-preconditioned linear CG as the solver. One jitted
    program; the forward map's transpose is ``jax.linear_transpose`` (exact).

    Args:
        t_obs: (npair,) picked absolute travel times [s]
            (:func:`pick_arrival_times`).
        tx_pos, rx_pos: (npair, 2) physical endpoints [m].
        lam_smooth: smoothing weight; 1.0 recovers smooth ~5 % contrasts
            without ray-streak artifacts on ring geometries.
        n_samples: quadrature points per ray (default 2 * max(ny, nx)).
        cg_iters: CG iteration cap (early exit at relres 1e-5).
        clip_velocity: optional (lo, hi) bounds on the returned map [m/s].

    Returns:
        (velocity (ny, nx) float32 [m/s], cg relative residual).
    """
    if n_samples is None:
        n_samples = 2 * max(grid.ny, grid.nx)
    vel, relres = _invert_travel_times_jit(
        np.asarray(t_obs, np.float32), np.asarray(tx_pos, np.float32),
        np.asarray(rx_pos, np.float32), grid, float(c_ref),
        float(lam_smooth), int(n_samples), int(cg_iters))
    if clip_velocity is not None:
        vel = jnp.clip(vel, *clip_velocity)
    return vel, relres


@partial(jax.jit, static_argnames=("grid", "cg_iters"))
def _invert_bent_step_jit(t_obs, pts, lengths, s_cur, grid: Grid2D,
                          lam_smooth, cg_iters: int):
    lengths = jnp.maximum(jnp.asarray(lengths, jnp.float32), 1e-12)
    pts = jnp.asarray(pts, jnp.float32)

    def b_apply(ds):
        return _mean_slowness(ds, pts, grid)

    # residual of the CURRENT model along the current (fixed) bent paths,
    # in mean-slowness units
    r0 = jnp.asarray(t_obs, jnp.float32) / lengths - b_apply(s_cur)
    ds, relres = _normal_eq_solve(b_apply, r0, grid, lam_smooth, cg_iters)
    return s_cur + ds, relres


def invert_travel_times_bent(t_obs, tx_pos, rx_pos, grid: Grid2D,
                             c_ref: float = 1500.0, lam_smooth: float = 1.0,
                             n_outer: int = 3, cg_iters: int = 100,
                             n_samples: int | None = None,
                             step: float | None = None,
                             clip_velocity: tuple[float, float] = (1300.0, 1800.0)):
    """Bent-ray (eikonal) travel-time tomography — beyond the reference.

    Outer fixed-point over the ray geometry: solve ``|grad T| = s`` per
    unique source (fwi.eikonal.eikonal_solve, Jacobi upwind sweeps), trace
    the Fermat paths by steepest descent on T (fwi.eikonal.trace_rays),
    then re-solve the linearized problem with the paths FIXED — the same
    smoothed, ray-density-preconditioned normal equations as
    :func:`invert_travel_times`, with path-mean rows along the bent rays.
    The first pass starts from the homogeneous ``c_ref`` (straight rays),
    so ``n_outer=1`` reduces to straight-ray tomography up to quadrature.

    Straight rays underestimate anomalies at second order in the contrast;
    bent rays honor Fermat's principle at any contrast. Use this above
    ~10 % contrast, or whenever the straight-ray tomogram shows smearing
    through a strong inclusion.

    Args:
        t_obs: (npair,) picked absolute first-arrival times [s].
        tx_pos, rx_pos: (npair, 2) physical endpoints [m]; rays are traced
            from each receiver back to its transmitter (one eikonal field
            per UNIQUE transmitter position).
        n_outer: ray-geometry refinements (2-3 suffice; geometry converges
            quadratically by Fermat stationarity).
        step: ray-march step [m] (default ``min(dx, dy) / 2``).
        clip_velocity: (lo, hi) bounds applied between passes — keeps the
            eikonal slowness positive and the march stable.

    Returns:
        (velocity (ny, nx) float32 [m/s], final linear-CG relative residual).
    """
    from .eikonal import eikonal_solve_batch, trace_rays

    if n_samples is None:
        n_samples = 2 * max(grid.ny, grid.nx)
    if step is None:
        step = 0.5 * min(grid.dx, grid.dy)
    tx = np.asarray(tx_pos, np.float32)
    rx = np.asarray(rx_pos, np.float32)
    t_obs = np.asarray(t_obs, np.float32)

    # unique transmitter positions -> one eikonal field each
    src_unique, src_idx = np.unique(tx, axis=0, return_inverse=True)
    src_idx = src_idx.astype(np.int32)

    # scan length: longest straight chord with a 1.6x bending margin
    max_d = float(np.max(np.linalg.norm(rx - tx, axis=-1)))
    n_steps = int(np.ceil(1.6 * max_d / step)) + 16

    # Pass 1 rays are straight anyway (homogeneous start) — use EXACT
    # chords, not traced ones: discrete tracing's per-pair arc-length
    # noise (~0.5 %) otherwise injects a slowness bias comparable to weak
    # anomalies. Also skips the priciest eikonal batch.
    alpha = (np.arange(int(n_samples), dtype=np.float32) + 0.5) / n_samples
    pts = tx[:, None, :] + alpha[None, :, None] * (rx - tx)[:, None, :]
    lengths = np.linalg.norm(rx - tx, axis=-1)

    vel = jnp.full(grid.shape, jnp.float32(c_ref))
    relres = jnp.float32(np.inf)
    for outer in range(int(n_outer)):
        slowness = 1.0 / vel
        if outer > 0:
            t_fields = eikonal_solve_batch(slowness, jnp.asarray(src_unique),
                                           grid)
            pts, lengths = trace_rays(t_fields, src_idx, tx, rx, grid,
                                      n_steps=n_steps, step=float(step),
                                      n_samples=int(n_samples))
        s_new, relres = _invert_bent_step_jit(
            t_obs, pts, lengths, slowness, grid,
            jnp.float32(lam_smooth), int(cg_iters))
        vel = jnp.clip(1.0 / s_new, *clip_velocity)
    return vel, relres


def traveltime_init(td, grid: Grid2D, num_excluded_each_side: int = 31,
                    c_ref: float = 1500.0, lam_smooth: float = 10.0,
                    search_halfwidth: float | None = None,
                    cg_iters: int = 100,
                    clip_velocity: tuple[float, float] | None = None,
                    snap_to_dataset_grid: bool = True,
                    return_times: bool = False,
                    method: str = "straight", n_outer: int = 3):
    """Turnkey travel-time starting model from broadband channel data.

    Composes the pipeline: straight-ray predictions over the ring ->
    :func:`pick_arrival_times` on every acceptance-mask pair ->
    :func:`invert_travel_times` on the inversion grid. The acceptance mask
    (models.acquisition.acceptance_mask — the reference's +-31-element
    exclusion, fwi_script.py:39-44) drops the near-tangent pairs whose
    direct arrival is weak and pick-unstable.

    Args:
        td: :class:`~..data.timedomain.TimeDomainDataset` (gate first with
            direct_arrival_gate when reverberation is strong).
        grid: INVERSION grid for the starting model (need not match the
            synthesis grid in ``td``).
        lam_smooth: smoothing weight. The default (10) is tuned for PICKED
            times, whose sub-sample envelope-peak noise maps into
            high-wavenumber slowness streaks under weak smoothing
            (measured on a snapped 24-element ring: model RMSE 24.7 /
            12.5 / 6.5 at lam 1 / 5 / 20 vs 12.4 for the homogeneous
            start); exact forward-map times tolerate lam ~ 1
            (invert_travel_times' default). A starting model only needs
            the smooth background right — prefer over-smoothing.
        snap_to_dataset_grid: use element positions snapped to the
            dataset's own grid (td.x/td.y) as the ray endpoints and
            prediction geometry. The synthesizer places sources/receivers
            at snapped pixels (data/timedomain.py::_sweep_record), so the
            trace physics lives between those points — on coarse grids the
            up-to-h/2 snap is a systematic travel-time skew comparable to
            small anomalies. Pass False for MEASURED data, where the
            physical coordinates in td.x_circ/y_circ are the truth and
            td.x/td.y is just a reconstruction grid.
        return_times: also return (t_picked, tx_pos, rx_pos) for QC.
        method: "straight" (linear, :func:`invert_travel_times` — right at
            soft-tissue contrasts) or "bent" (eikonal/Fermat rays,
            :func:`invert_travel_times_bent` — use above ~10 % contrast).
        n_outer: ray-geometry refinements for ``method="bent"``.

    Returns:
        c_init (ny, nx) float32 [m/s] — pass as ``c_init`` /
        ``vel_init`` to fwi.runner.invert_dataset or the optimizers;
        with ``return_times=True``, (c_init, t_picked, tx_pos, rx_pos).
    """
    from ..models.acquisition import acceptance_mask

    ne = len(td.x_circ)
    mask = acceptance_mask(ne, num_excluded_each_side)
    xe = np.asarray(td.x_circ, np.float64)
    ye = np.asarray(td.y_circ, np.float64)
    if snap_to_dataset_grid:
        xg = np.asarray(td.x, np.float64)
        yg = np.asarray(td.y, np.float64)
        xe = xg[np.argmin(np.abs(xg[None, :] - xe[:, None]), axis=1)]
        ye = yg[np.argmin(np.abs(yg[None, :] - ye[:, None]), axis=1)]
    t_ref = _predicted_times(xe, ye, c_ref)
    t_all = pick_arrival_times(td.traces, td.times, td.df, t_ref,
                               search_halfwidth=search_halfwidth)
    ti, ri = np.nonzero(mask)
    pos = np.stack([xe, ye], axis=1)
    tx_pos = pos[ti]
    rx_pos = pos[ri]
    t_obs = t_all[ti, ri]
    if method == "bent":
        vel, _relres = invert_travel_times_bent(
            t_obs, tx_pos, rx_pos, grid, c_ref=c_ref, lam_smooth=lam_smooth,
            cg_iters=cg_iters, n_outer=n_outer,
            clip_velocity=clip_velocity or (1300.0, 1800.0))
    elif method == "straight":
        vel, _relres = invert_travel_times(
            t_obs, tx_pos, rx_pos, grid, c_ref=c_ref, lam_smooth=lam_smooth,
            cg_iters=cg_iters, clip_velocity=clip_velocity)
    else:
        raise ValueError(f"unknown travel-time method {method!r} "
                         "(expected 'straight' or 'bent')")
    vel = np.asarray(jax.device_get(vel))
    if return_times:
        return vel, t_obs, tx_pos, rx_pos
    return vel
