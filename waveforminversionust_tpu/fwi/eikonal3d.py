"""3D first-arrival eikonal solver + bent-ray tracing — beyond the reference.

Volumetric extension of fwi/eikonal.py for the 3D acquisition geometries
(models/acquisition3d.py: cylinder / hemisphere arrays). The reference is
strictly 2D and has no travel-time machinery at all.

TPU-first design, same as 2D: JACOBI iterations of the upwind Godunov
local solver — every voxel updates simultaneously from its neighbors'
previous values, one fused elementwise program per sweep inside
``lax.while_loop`` (the parallel replacement for serial fast marching /
Gauss-Seidel fast sweeping, which XLA cannot express). The 3D local
solver sorts the three axis-neighbor minima with three vectorized
compare-swaps and falls through the standard 1-/2-/3-sided quadratic
ladder branchlessly (``jnp.where``), so one sweep is ~40 elementwise ops
on the (nz, ny, nx) volume — bandwidth-trivial VPU work.

Ray tracing is the 2D scheme with trilinear interpolation: a fixed-length
``lax.scan`` of steepest descent on grad T, batched over all tx->rx
pairs, 8-scalar indexed gathers per sample (never materializes per-pair
fields), exact arc-length accumulation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.grid3d import Grid3D

_INF = jnp.float32(1e9)


def _sort3(m1, w1, m2, w2, m3, w3):
    """Sort three (value, weight) pairs by value: 3 compare-swaps."""
    def cswap(ma, wa, mb, wb):
        c = ma > mb
        return (jnp.where(c, mb, ma), jnp.where(c, wb, wa),
                jnp.where(c, ma, mb), jnp.where(c, wa, wb))

    m1, w1, m2, w2 = cswap(m1, w1, m2, w2)
    m2, w2, m3, w3 = cswap(m2, w2, m3, w3)
    m1, w1, m2, w2 = cswap(m1, w1, m2, w2)
    return m1, w1, m2, w2, m3, w3


def _upwind_update_3d(t, slowness, dx: float, dy: float, dz: float):
    """One Jacobi sweep of the 3D upwind Godunov local solver (all voxels).

    Solves ``sum_i w_i (T - m_i)+^2 = s^2`` per voxel with the standard
    sorted fall-through: try the 1-sided solution off the smallest
    neighbor; if it exceeds the next neighbor, the 2-sided root; if that
    exceeds the largest, the 3-sided root. Causality of each k-sided root
    (root >= every included m_i) is exactly the fall-through condition, so
    the ladder is branch-free.
    """
    big = _INF
    pad_z = jnp.pad(t, ((1, 1), (0, 0), (0, 0)), constant_values=big)
    pad_y = jnp.pad(t, ((0, 0), (1, 1), (0, 0)), constant_values=big)
    pad_x = jnp.pad(t, ((0, 0), (0, 0), (1, 1)), constant_values=big)
    mz = jnp.minimum(pad_z[:-2], pad_z[2:])
    my = jnp.minimum(pad_y[:, :-2], pad_y[:, 2:])
    mx = jnp.minimum(pad_x[:, :, :-2], pad_x[:, :, 2:])

    wz = jnp.float32(1.0 / dz**2)
    wy = jnp.float32(1.0 / dy**2)
    wx = jnp.float32(1.0 / dx**2)
    s2 = slowness * slowness

    m1, w1, m2, w2, m3, w3 = _sort3(
        mz, jnp.full_like(mz, wz), my, jnp.full_like(my, wy),
        mx, jnp.full_like(mx, wx))
    # clamp the +INF neighbors so the quadratics below stay finite; the
    # fall-through conditions (t_k <= m_{k+1} = INF-class) still select
    # the lower-order root whenever a neighbor was missing
    m2c = jnp.minimum(m2, m1 + 2.0 * big * 1e-6)
    m3c = jnp.minimum(m3, m1 + 2.0 * big * 1e-6)

    # 1-sided
    t1 = m1 + slowness / jnp.sqrt(w1)
    # 2-sided (axes 1, 2): A t^2 - 2 B t + C = 0
    a2 = w1 + w2
    b2 = w1 * m1 + w2 * m2c
    c2 = w1 * m1 * m1 + w2 * m2c * m2c - s2
    disc2 = jnp.maximum(b2 * b2 - a2 * c2, 0.0)
    t2 = (b2 + jnp.sqrt(disc2)) / a2
    # 3-sided
    a3 = a2 + w3
    b3 = b2 + w3 * m3c
    c3 = c2 + w3 * m3c * m3c
    disc3 = jnp.maximum(b3 * b3 - a3 * c3, 0.0)
    t3 = (b3 + jnp.sqrt(disc3)) / a3

    cand = jnp.where(t1 <= m2, t1, jnp.where(t2 <= m3, t2, t3))
    return jnp.minimum(t, cand)


@partial(jax.jit, static_argnames=("grid", "max_iters"))
def eikonal_solve_3d(slowness, src_pos, grid: Grid3D,
                     max_iters: int | None = None,
                     tol: float | None = None):
    """First-arrival travel-time volume of a point source: |grad T| = s.

    3D analog of fwi.eikonal.eikonal_solve (see there for the scheme and
    the source-disk initialization — here a 2-cell ball).

    Args:
        slowness: (nz, ny, nx) [s/m], strictly positive.
        src_pos: (3,) physical (x, y, z) source location [m].
        grid: the field's grid.
        max_iters: Jacobi cap (default ``2 * (nx + ny + nz)``).
        tol: convergence threshold on ``max |T_new - T|`` [s].

    Returns:
        (nz, ny, nx) float32 travel times [s].
    """
    if max_iters is None:
        max_iters = 2 * (grid.nx + grid.ny + grid.nz)
    slowness = jnp.asarray(slowness, jnp.float32)
    src = jnp.asarray(src_pos, jnp.float32)
    if tol is None:
        tol_v = 1e-5 * min(grid.dx, grid.dy, grid.dz) * jnp.min(slowness)
    else:
        tol_v = jnp.float32(tol)

    zz, yy, xx = jnp.meshgrid(jnp.asarray(grid.z, jnp.float32),
                              jnp.asarray(grid.y, jnp.float32),
                              jnp.asarray(grid.x, jnp.float32),
                              indexing="ij")
    r = jnp.sqrt((xx - src[0]) ** 2 + (yy - src[1]) ** 2
                 + (zz - src[2]) ** 2)
    ix = jnp.clip(jnp.round((src[0] - grid.x0) / grid.dx), 0, grid.nx - 1)
    iy = jnp.clip(jnp.round((src[1] - grid.y0) / grid.dy), 0, grid.ny - 1)
    iz = jnp.clip(jnp.round((src[2] - grid.z0) / grid.dz), 0, grid.nz - 1)
    s_src = slowness[iz.astype(jnp.int32), iy.astype(jnp.int32),
                     ix.astype(jnp.int32)]
    r_ball = 2.0 * max(grid.dx, grid.dy, grid.dz)
    t0 = jnp.where(r <= r_ball, r * s_src, _INF)

    def cond(state):
        _, delta, it = state
        return (delta > tol_v) & (it < max_iters)

    def body(state):
        t, _, it = state
        t_new = _upwind_update_3d(t, slowness, grid.dx, grid.dy, grid.dz)
        return t_new, jnp.max(t - t_new), it + 1

    t, _, _ = jax.lax.while_loop(cond, body, (t0, _INF, jnp.int32(0)))
    return t


#: Batched solver over a stack of source positions:
#: ``eikonal_solve_batch_3d(slowness, src_pos (ns, 3), grid)``.
eikonal_solve_batch_3d = jax.jit(
    jax.vmap(eikonal_solve_3d, in_axes=(None, 0, None)), static_argnums=(2,))


def _trilinear_indexed(fields, fld_idx, px, py, pz, grid: Grid3D):
    """Trilinear sample of ``fields[fld_idx]`` at physical points.

    ``fields`` is (ns, nz, ny, nx); every sample is an 8-scalar gather
    straight out of the stack (never materializes ``fields[fld_idx]``).
    """
    fx = jnp.clip((px - grid.x0) / grid.dx, 0.0, grid.nx - 1 - 1e-6)
    fy = jnp.clip((py - grid.y0) / grid.dy, 0.0, grid.ny - 1 - 1e-6)
    fz = jnp.clip((pz - grid.z0) / grid.dz, 0.0, grid.nz - 1 - 1e-6)
    ix = jnp.clip(fx.astype(jnp.int32), 0, grid.nx - 2)
    iy = jnp.clip(fy.astype(jnp.int32), 0, grid.ny - 2)
    iz = jnp.clip(fz.astype(jnp.int32), 0, grid.nz - 2)
    wx = fx - ix
    wy = fy - iy
    wz = fz - iz

    def g(dz_, dy_, dx_):
        return fields[fld_idx, iz + dz_, iy + dy_, ix + dx_]

    c00 = g(0, 0, 0) * (1 - wx) + g(0, 0, 1) * wx
    c01 = g(0, 1, 0) * (1 - wx) + g(0, 1, 1) * wx
    c10 = g(1, 0, 0) * (1 - wx) + g(1, 0, 1) * wx
    c11 = g(1, 1, 0) * (1 - wx) + g(1, 1, 1) * wx
    return ((c00 * (1 - wy) + c01 * wy) * (1 - wz)
            + (c10 * (1 - wy) + c11 * wy) * wz)


@partial(jax.jit, static_argnames=("grid",))
def eikonal_receiver_times_3d(t_fields, src_idx, rx_pos, grid: Grid3D):
    """Sample per-source travel-time volumes at receiver positions.

    Args:
        t_fields: (ns, nz, ny, nx) from :data:`eikonal_solve_batch_3d`.
        src_idx: (npair,) int source index of each pair.
        rx_pos: (npair, 3) physical receiver points.

    Returns:
        (npair,) float32 predicted first-arrival times [s].
    """
    rx = jnp.asarray(rx_pos, jnp.float32)
    return _trilinear_indexed(jnp.asarray(t_fields, jnp.float32),
                              jnp.asarray(src_idx),
                              rx[:, 0], rx[:, 1], rx[:, 2], grid)


@partial(jax.jit, static_argnames=("grid", "n_steps", "n_samples"))
def trace_rays_3d(t_fields, src_idx, src_pos, rx_pos, grid: Grid3D,
                  n_steps: int, step: float, n_samples: int = 256):
    """Fermat ray paths by steepest descent on 3D travel-time volumes.

    Same scheme as fwi.eikonal.trace_rays: march from each receiver down
    grad T (trilinearly interpolated central differences of the pair's
    own source volume) until within ``1.5 * step`` of the source, latch
    onto the exact source point, accumulate exact arc length, subsample
    the trajectory uniformly in arc length.

    Returns:
        pts: (npair, n_samples, 3) points along each path.
        lengths: (npair,) path arc lengths [m].
    """
    gz_f, gy_f, gx_f = jnp.gradient(jnp.asarray(t_fields, jnp.float32),
                                    grid.dz, grid.dy, grid.dx,
                                    axis=(-3, -2, -1))
    idx = jnp.asarray(src_idx)
    src = jnp.asarray(src_pos, jnp.float32)
    rx = jnp.asarray(rx_pos, jnp.float32)
    stepf = jnp.float32(step)
    latch2 = (1.5 * stepf) ** 2

    def body(carry, _):
        p, done, arc = carry
        vx = _trilinear_indexed(gx_f, idx, p[:, 0], p[:, 1], p[:, 2], grid)
        vy = _trilinear_indexed(gy_f, idx, p[:, 0], p[:, 1], p[:, 2], grid)
        vz = _trilinear_indexed(gz_f, idx, p[:, 0], p[:, 1], p[:, 2], grid)
        norm = jnp.sqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-24))
        p_next = p - stepf * jnp.stack([vx, vy, vz], axis=-1) / norm[:, None]
        d2 = jnp.sum((p_next - src) ** 2, axis=-1)
        reach = d2 <= latch2
        p_next = jnp.where(reach[:, None], src, p_next)
        p_out = jnp.where(done[:, None], p, p_next)
        arc = arc + jnp.where(done, 0.0,
                              jnp.linalg.norm(p_out - p, axis=-1))
        return (p_out, done | reach, arc), (p_out, done)

    done0 = jnp.zeros(rx.shape[0], bool)
    (_, _, lengths), (traj, done_hist) = jax.lax.scan(
        body, (rx, done0, jnp.zeros(rx.shape[0], jnp.float32)),
        None, length=n_steps)
    n_active = jnp.sum(~done_hist, axis=0).astype(jnp.float32)

    frac = (jnp.arange(n_samples, dtype=jnp.float32) + 0.5) / n_samples
    sub = jnp.clip((frac[None, :] * n_active[:, None]).astype(jnp.int32),
                   0, n_steps - 1)
    pair = jnp.arange(rx.shape[0])[:, None]
    pts = traj[sub, pair, :]
    return pts, lengths
