"""3D travel-time tomography starting models — beyond the reference.

Volumetric analog of fwi/traveltime.py for the 3D acquisitions
(models/acquisition3d.py): straight-ray linear tomography and bent-ray
(eikonal) tomography over (nz, ny, nx) slowness volumes, producing
``c_init`` starting models for the 3D FWI paths (fwi/fwi3d.py,
fwi/lbfgs.py::run_lbfgs_3d). The reference is strictly 2D and starts FWI
homogeneous (fwi_script.py:90); it has no travel-time machinery at all.

Shares the smoothed, ray-density-preconditioned normal-equations PCG core
with the 2D module (fwi.traveltime._normal_eq_solve — the Laplacian scale
is dimension-generic); only the sampling (trilinear) and the ray
machinery (fwi/eikonal3d.py) are 3D-specific.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.grid3d import Grid3D
from .traveltime import _normal_eq_solve


def _mean_slowness_3d(slowness, pts, grid: Grid3D):
    """Mean of trilinearly-sampled ``slowness`` along each point path.

    ``pts`` is (npair, n_samples, 3); returns (npair,). LINEAR in
    ``slowness``.
    """
    fx = jnp.clip((pts[..., 0] - grid.x0) / grid.dx, 0.0, grid.nx - 1 - 1e-6)
    fy = jnp.clip((pts[..., 1] - grid.y0) / grid.dy, 0.0, grid.ny - 1 - 1e-6)
    fz = jnp.clip((pts[..., 2] - grid.z0) / grid.dz, 0.0, grid.nz - 1 - 1e-6)
    ix = jnp.clip(fx.astype(jnp.int32), 0, grid.nx - 2)
    iy = jnp.clip(fy.astype(jnp.int32), 0, grid.ny - 2)
    iz = jnp.clip(fz.astype(jnp.int32), 0, grid.nz - 2)
    wx = fx - ix
    wy = fy - iy
    wz = fz - iz

    def g(dz_, dy_, dx_):
        return slowness[iz + dz_, iy + dy_, ix + dx_]

    c00 = g(0, 0, 0) * (1 - wx) + g(0, 0, 1) * wx
    c01 = g(0, 1, 0) * (1 - wx) + g(0, 1, 1) * wx
    c10 = g(1, 0, 0) * (1 - wx) + g(1, 0, 1) * wx
    c11 = g(1, 1, 0) * (1 - wx) + g(1, 1, 1) * wx
    s = ((c00 * (1 - wy) + c01 * wy) * (1 - wz)
         + (c10 * (1 - wy) + c11 * wy) * wz)
    return jnp.mean(s, axis=-1)


@partial(jax.jit, static_argnames=("grid", "n_samples"))
def straight_ray_times_3d(slowness, tx_pos, rx_pos, grid: Grid3D,
                          n_samples: int = 512):
    """Travel times of straight 3D rays (midpoint rule, trilinear).

    Args:
        slowness: (nz, ny, nx) [s/m].
        tx_pos, rx_pos: (npair, 3) physical (x, y, z) endpoints [m].

    Returns:
        (npair,) float32 travel times [s]. LINEAR in ``slowness``.
    """
    slowness = jnp.asarray(slowness, jnp.float32)
    tx = jnp.asarray(tx_pos, jnp.float32)
    rx = jnp.asarray(rx_pos, jnp.float32)
    alpha = (jnp.arange(n_samples, dtype=jnp.float32) + 0.5) / n_samples
    p = tx[:, None, :] + alpha[None, :, None] * (rx - tx)[:, None, :]
    dist = jnp.linalg.norm(rx - tx, axis=-1)
    return dist * _mean_slowness_3d(slowness, p, grid)


@partial(jax.jit, static_argnames=("grid", "n_samples", "cg_iters"))
def _invert_travel_times_3d_jit(t_obs, tx_pos, rx_pos, grid: Grid3D,
                                c_ref, lam_smooth, n_samples: int,
                                cg_iters: int):
    s0 = 1.0 / jnp.asarray(c_ref, jnp.float32)
    dist = jnp.linalg.norm(jnp.asarray(rx_pos, jnp.float32)
                           - jnp.asarray(tx_pos, jnp.float32), axis=-1)
    dist = jnp.maximum(dist, 1e-12)

    def b_apply(ds):
        return straight_ray_times_3d(ds, tx_pos, rx_pos, grid,
                                     n_samples=n_samples) / dist

    r0 = jnp.asarray(t_obs, jnp.float32) / dist - s0
    x, relres = _normal_eq_solve(b_apply, r0, grid, lam_smooth, cg_iters)
    return 1.0 / (s0 + x), relres


def invert_travel_times_3d(t_obs, tx_pos, rx_pos, grid: Grid3D,
                           c_ref: float = 1500.0, lam_smooth: float = 1.0,
                           n_samples: int | None = None,
                           cg_iters: int = 100,
                           clip_velocity: tuple[float, float] | None = None):
    """Linear straight-ray tomography in 3D: travel times -> speed volume.

    Same smoothed normal equations as the 2D
    fwi.traveltime.invert_travel_times (see there), with trilinear ray
    rows and the dimension-generic L^T L scale.

    Returns:
        (velocity (nz, ny, nx) float32 [m/s], cg relative residual).
    """
    if n_samples is None:
        n_samples = 2 * max(grid.nz, grid.ny, grid.nx)
    vel, relres = _invert_travel_times_3d_jit(
        np.asarray(t_obs, np.float32), np.asarray(tx_pos, np.float32),
        np.asarray(rx_pos, np.float32), grid, float(c_ref),
        float(lam_smooth), int(n_samples), int(cg_iters))
    if clip_velocity is not None:
        vel = jnp.clip(vel, *clip_velocity)
    return vel, relres


@partial(jax.jit, static_argnames=("grid", "cg_iters"))
def _invert_bent_step_3d_jit(t_obs, pts, lengths, s_cur, grid: Grid3D,
                             lam_smooth, cg_iters: int):
    lengths = jnp.maximum(jnp.asarray(lengths, jnp.float32), 1e-12)
    pts = jnp.asarray(pts, jnp.float32)

    def b_apply(ds):
        return _mean_slowness_3d(ds, pts, grid)

    r0 = jnp.asarray(t_obs, jnp.float32) / lengths - b_apply(s_cur)
    ds, relres = _normal_eq_solve(b_apply, r0, grid, lam_smooth, cg_iters)
    return s_cur + ds, relres


def invert_travel_times_bent_3d(t_obs, tx_pos, rx_pos, grid: Grid3D,
                                c_ref: float = 1500.0,
                                lam_smooth: float = 1.0,
                                n_outer: int = 3, cg_iters: int = 100,
                                n_samples: int | None = None,
                                step: float | None = None,
                                clip_velocity: tuple[float, float]
                                = (1300.0, 1800.0)):
    """Bent-ray (eikonal) travel-time tomography in 3D.

    Outer fixed-point over ray geometry, exactly as the 2D
    fwi.traveltime.invert_travel_times_bent: per-source eikonal volumes
    (fwi.eikonal3d.eikonal_solve_batch_3d), steepest-descent Fermat rays
    (trace_rays_3d), linearized re-solve along the fixed paths.

    Returns:
        (velocity (nz, ny, nx) float32 [m/s], final CG relative residual).
    """
    from .eikonal3d import eikonal_solve_batch_3d, trace_rays_3d

    if n_samples is None:
        n_samples = 2 * max(grid.nz, grid.ny, grid.nx)
    if step is None:
        step = 0.5 * min(grid.dx, grid.dy, grid.dz)
    tx = np.asarray(tx_pos, np.float32)
    rx = np.asarray(rx_pos, np.float32)
    t_obs = np.asarray(t_obs, np.float32)

    src_unique, src_idx = np.unique(tx, axis=0, return_inverse=True)
    src_idx = src_idx.astype(np.int32)

    max_d = float(np.max(np.linalg.norm(rx - tx, axis=-1)))
    n_steps = int(np.ceil(1.6 * max_d / step)) + 16

    # Pass 1 rays are straight anyway (homogeneous start) — use EXACT
    # chords, not traced ones: discrete tracing's per-pair arc-length
    # noise (~0.5 %) otherwise injects a slowness bias comparable to weak
    # anomalies (measured: pass-1 model RMSE 9.8 vs 7.9 on a sparse
    # two-ring 3D case). Also skips the priciest eikonal batch.
    alpha = (np.arange(int(n_samples), dtype=np.float32) + 0.5) / n_samples
    pts = tx[:, None, :] + alpha[None, :, None] * (rx - tx)[:, None, :]
    lengths = np.linalg.norm(rx - tx, axis=-1)

    vel = jnp.full(grid.shape, jnp.float32(c_ref))
    relres = jnp.float32(np.inf)
    for outer in range(int(n_outer)):
        slowness = 1.0 / vel
        if outer > 0:
            t_fields = eikonal_solve_batch_3d(slowness,
                                              jnp.asarray(src_unique), grid)
            pts, lengths = trace_rays_3d(t_fields, src_idx, tx, rx, grid,
                                         n_steps=n_steps, step=float(step),
                                         n_samples=int(n_samples))
        s_new, relres = _invert_bent_step_3d_jit(
            t_obs, pts, lengths, slowness, grid,
            jnp.float32(lam_smooth), int(cg_iters))
        vel = jnp.clip(1.0 / s_new, *clip_velocity)
    return vel, relres


def traveltime_init_3d(td, grid: Grid3D, min_angle: float = 0.5,
                       c_ref: float = 1500.0, lam_smooth: float = 10.0,
                       search_halfwidth: float | None = None,
                       cg_iters: int = 100,
                       clip_velocity: tuple[float, float] | None = None,
                       snap_to_dataset_grid: bool = True,
                       return_times: bool = False,
                       method: str = "straight", n_outer: int = 3):
    """Turnkey 3D travel-time starting model from broadband channel data.

    The volumetric analogue of :func:`.traveltime.traveltime_init`:
    straight-ray predictions over the element cloud ->
    :func:`.traveltime.pick_arrival_times` (the picker is
    dimension-agnostic over the trace batch) on every
    acceptance-accepted pair -> :func:`invert_travel_times_3d` (or the
    bent-ray :func:`invert_travel_times_bent_3d`) on the inversion grid.
    The angular acceptance rule (models.acquisition3d.build_acquisition3d)
    replaces the 2D ±k-element exclusion arc.

    Args:
        td: :class:`~..data.timedomain3d.TimeDomainDataset3D`.
        grid: INVERSION grid for the starting volume (need not match the
            synthesis grid in ``td``).
        min_angle: minimum tx–rx angular separation [rad] (drops the
            near-tangent pairs whose direct arrival is pick-unstable).
        lam_smooth: smoothing weight; the default (10) follows the 2D
            picked-times noise ladder (traveltime.traveltime_init).
        snap_to_dataset_grid: use ``td.positions_snapped`` (where the
            synthesizer actually placed the one-hot elements) as ray
            endpoints; pass False for measured data, where the physical
            coordinates are the truth.
        return_times: also return (t_picked, tx_pos, rx_pos) for QC.
        method: "straight" (linear) or "bent" (eikonal/Fermat rays; use
            above ~10 % contrast).

    Returns:
        c_init (nz, ny, nx) float32 [m/s] — pass as ``vel_init`` to
        fwi.fwi3d.nonlinear_cg_3d / fwi.newton.run_gauss_newton_3d /
        fwi.lbfgs.run_lbfgs_3d; with ``return_times=True``,
        (c_init, t_picked, tx_pos, rx_pos).
    """
    from ..models.acquisition3d import build_acquisition3d
    from .traveltime import pick_arrival_times

    pos = np.asarray(td.positions_snapped if snap_to_dataset_grid
                     else td.positions, np.float64)
    # The mask is geometry-only; the grid argument merely snaps voxels we
    # do not use here.
    acq = build_acquisition3d(grid, td.positions, min_angle=min_angle)
    rx_elem = np.asarray(acq.rx_elem)                 # (n, n_active)
    n, n_active = rx_elem.shape
    tx_e = np.repeat(np.arange(n), n_active)
    rx_e = rx_elem.ravel()
    tx_pos = pos[tx_e]
    rx_pos = pos[rx_e]
    t_ref = (np.linalg.norm(rx_pos - tx_pos, axis=-1) / c_ref)
    t_obs = pick_arrival_times(td.traces[tx_e, rx_e], td.times, td.df,
                               t_ref, search_halfwidth=search_halfwidth)
    if method == "bent":
        vel, _relres = invert_travel_times_bent_3d(
            t_obs, tx_pos, rx_pos, grid, c_ref=c_ref,
            lam_smooth=lam_smooth, cg_iters=cg_iters, n_outer=n_outer,
            clip_velocity=clip_velocity or (1300.0, 1800.0))
    elif method == "straight":
        vel, _relres = invert_travel_times_3d(
            t_obs, tx_pos, rx_pos, grid, c_ref=c_ref,
            lam_smooth=lam_smooth, cg_iters=cg_iters,
            clip_velocity=clip_velocity)
    else:
        raise ValueError(f"unknown travel-time method {method!r} "
                         "(expected 'straight' or 'bent')")
    vel = np.asarray(jax.device_get(vel))
    if return_times:
        return vel, t_obs, tx_pos, rx_pos
    return vel
