"""Multi-chip parallelism over the mesh axes this domain actually has.

The reference is strictly single-process (SURVEY.md section 2: no mesh, pmap,
shard_map or distributed backend anywhere). The natural parallel axes of
ring-array FWI are:

  * **shot** (transmit element) — embarrassingly parallel solves; the
    gradient image and the line-search inner products reduce over it
    (all-reduce). This is the domain's "data parallelism".
  * **freq** — multi-frequency continuation stages are independent until the
    gradient sum (all-reduce). Orthogonal second mesh axis.
  * **grid** — domain decomposition with halo exchange for fields too large
    for one chip (see :mod:`.halo`).

We use GSPMD (``jax.sharding.NamedSharding`` + sharded inputs) rather than
hand-written collectives: the inversion step is pure array code whose only
cross-shot couplings are sums, so XLA inserts the psums automatically and the
same jitted ``nonlinear_cg`` runs on 1 chip or a pod slice unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fwi.objective import FWIData
from ..ops.cpx import Cpx


def shot_mesh(devices=None, axis_name: str = "shot") -> Mesh:
    """1D mesh over all (or given) devices for shot parallelism."""
    devices = np.array(jax.devices() if devices is None else devices)
    return Mesh(devices, (axis_name,))


def grid_mesh(devices=None, axis_name: str = "grid") -> Mesh:
    """1D mesh over all (or given) devices for grid (y-slab) domain
    decomposition — the axis the SPIKE direct solver shards over
    (see parallel.spike; pass to ``nonlinear_cg(..., mesh=...)`` with
    ``SolverConfig(factorization="spike")``)."""
    devices = np.array(jax.devices() if devices is None else devices)
    return Mesh(devices, (axis_name,))


def shard_fwi_data_grid(data: FWIData, mesh: Mesh,
                        axis_name: str = "grid") -> FWIData:
    """Place FWIData for a grid-sharded (SPIKE) inversion: the (ntx, ny, nx)
    source fields shard along their row axis (dim 1, matching the y-slab
    decomposition), everything else replicates (the receiver index arrays
    are tiny; the gathers/scatters against sharded fields lower to
    collectives under GSPMD)."""
    rows = NamedSharding(mesh, P(None, axis_name))
    rep = NamedSharding(mesh, P())

    def put(x, sharding):
        if x is None:
            return None
        if isinstance(x, Cpx):
            return Cpx(jax.device_put(x.re, sharding),
                       jax.device_put(x.im, sharding))
        return jax.device_put(x, sharding)

    return data._replace(
        src=put(data.src, rows),
        rec_obs=put(data.rec_obs, rep),
        rx_y=put(data.rx_y, rep),
        rx_x=put(data.rx_x, rep),
        rx_w=put(data.rx_w, rep),
        f=put(data.f, rep),
        attenuation=put(data.attenuation, rep),
    )


def shot_freq_mesh(n_shot: int, n_freq: int, devices=None) -> Mesh:
    """2D (shot, freq) mesh."""
    devices = np.array(jax.devices() if devices is None else devices)
    return Mesh(devices[:n_shot * n_freq].reshape(n_shot, n_freq),
                ("shot", "freq"))


def shot_grid_mesh(n_shot: int, n_grid: int, devices=None) -> Mesh:
    """2D ("shot", "grid") mesh: shot data parallelism composed with grid
    (y-slab) domain decomposition. The SPIKE direct solve shards its rows
    over "grid" and its RHS batch over "shot" (each shot group solves its
    own transmitters against a shot-replicated factor — see
    parallel.spike.spike_solve(batch_axis=...)); the rest of the CG step
    is global-view and GSPMD places the cross-shot reductions. Use with
    ``shard_fwi_data_shot_grid`` and ``nonlinear_cg(mesh=...,
    SolverConfig(factorization="spike"))`` — the "shot" axis name is
    auto-detected by the operator solve."""
    devices = np.array(jax.devices() if devices is None else devices)
    return Mesh(devices[:n_shot * n_grid].reshape(n_shot, n_grid),
                ("shot", "grid"))


def shard_fwi_data_shot_grid(data: FWIData, mesh: Mesh,
                             shot_axis: str = "shot",
                             grid_axis: str = "grid") -> FWIData:
    """Place FWIData on a ("shot", "grid") mesh: the (ntx, ny, nx) source
    fields shard over BOTH axes (transmit batch x y-slab rows); the
    receiver arrays shard over shot; scalars replicate. Requires ntx %
    mesh.shape[shot_axis] == 0 and ny % mesh.shape[grid_axis] == 0 (the
    SPIKE slab rule)."""
    both = NamedSharding(mesh, P(shot_axis, grid_axis))
    shot = NamedSharding(mesh, P(shot_axis))
    rep = NamedSharding(mesh, P())

    def put(x, sharding):
        if x is None:
            return None
        if isinstance(x, Cpx):
            return Cpx(jax.device_put(x.re, sharding),
                       jax.device_put(x.im, sharding))
        return jax.device_put(x, sharding)

    return data._replace(
        src=put(data.src, both),
        rec_obs=put(data.rec_obs, shot),
        rx_y=put(data.rx_y, shot),
        rx_x=put(data.rx_x, shot),
        rx_w=put(data.rx_w, shot),
        f=put(data.f, rep),
        attenuation=put(data.attenuation, rep),
    )


def shard_fwi_data(data: FWIData, mesh: Mesh,
                   axis_name: str = "shot") -> FWIData:
    """Place the shot-batched arrays of FWIData on the mesh, sharded along
    the transmit axis; per-grid / scalar fields replicate.

    A ``P(axis_name)`` spec shards dim 0 and replicates the rest, so it
    covers both nearest-pixel ``(ntx, n_active)`` and bilinear
    ``(ntx, n_active, 4)`` receiver layouts. Built with ``_replace`` so
    fields not listed here (future additions) are preserved as-is rather
    than silently reset to their defaults.
    """
    shot = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())

    def put(x, sharding):
        if x is None:
            return None
        if isinstance(x, Cpx):  # split-complex: shard both planes
            return Cpx(jax.device_put(x.re, sharding),
                       jax.device_put(x.im, sharding))
        return jax.device_put(x, sharding)

    return data._replace(
        src=put(data.src, shot),
        rec_obs=put(data.rec_obs, shot),
        rx_y=put(data.rx_y, shot),
        rx_x=put(data.rx_x, shot),
        rx_w=put(data.rx_w, shot),
        f=put(data.f, rep),
        attenuation=put(data.attenuation, rep),
    )


def shard_multifreq_data(data, mesh: Mesh, shot_axis: str = "shot",
                         freq_axis: str = "freq"):
    """Place MultiFreqData on a (shot, freq) mesh: rec_obs sharded over
    (freq, shot), the acquisition arrays over shot, freqs over freq, and
    the attenuation map replicated. nf and ntx must be divisible by the
    respective mesh axis sizes."""
    rec = NamedSharding(mesh, P(freq_axis, shot_axis))
    shot = NamedSharding(mesh, P(shot_axis))
    freq = NamedSharding(mesh, P(freq_axis))
    rep = NamedSharding(mesh, P())

    def put(x, sharding):
        if x is None:
            return None
        if isinstance(x, Cpx):
            return Cpx(jax.device_put(x.re, sharding),
                       jax.device_put(x.im, sharding))
        return jax.device_put(x, sharding)

    return data._replace(
        src=put(data.src, shot),
        rec_obs=put(data.rec_obs, rec),
        rx_y=put(data.rx_y, shot),
        rx_x=put(data.rx_x, shot),
        rx_w=put(data.rx_w, shot),
        freqs=put(data.freqs, freq),
        attenuation=put(data.attenuation, rep),
    )


def replicate(tree, mesh: Mesh):
    """Replicate a pytree across the mesh."""
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(jnp.asarray(x), rep),
                                  tree)


def shard_fwi_data_3d(data, mesh: Mesh, axis_name: str = "shot"):
    """Shot-shard :class:`~..fwi.fwi3d.FWIData3D` over the mesh.

    The 3D Born operator is global in k-space (FFTs over the volume), so
    grid slabs cannot shard without a distributed FFT; the scalable axis is
    the transmit batch — identical to the 2D strategy. src/rec_obs/rx_idx
    shard along dim 0 (the solve, receiver sampling, adjoint scatter and
    per-voxel gradient terms are all shot-elementwise; the gradient SUM
    and line-search inner products reduce over shots via GSPMD psum).
    """
    shot = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())

    def put(x, sharding):
        if isinstance(x, Cpx):
            return Cpx(jax.device_put(x.re, sharding),
                       jax.device_put(x.im, sharding))
        return jax.device_put(x, sharding)

    return data._replace(
        src=put(data.src, shot),
        rec_obs=put(data.rec_obs, shot),
        rx_idx=put(data.rx_idx, shot),
        f=put(data.f, rep),
        rec_ref=(None if data.rec_ref is None
                 else put(data.rec_ref, shot)),
    )


def shard_fwi_data_3d_shot_grid(data, mesh: Mesh, shot_axis: str = "shot",
                                grid_axis: str = "grid"):
    """Place :class:`~..fwi.fwi3d.FWIData3D` on a ("shot", "grid") mesh:
    the (ntx, nz, ny, nx) sources shard over BOTH axes (transmit batch x
    z-slabs); receiver arrays over shot; scalars replicate. Pair with
    ``nonlinear_cg_3d(mesh=shot_grid_mesh(...))`` — the sharded pencil
    solvers detect the "shot" axis and shard their RHS batch over it
    (parallel.fft3d ``batch_axis``). Requires ntx % mesh.shape[shot_axis]
    == 0 and nz % P == ny % P == 0 (the pencil rule, P =
    mesh.shape[grid_axis])."""
    both = NamedSharding(mesh, P(shot_axis, grid_axis))
    shot = NamedSharding(mesh, P(shot_axis))
    rep = NamedSharding(mesh, P())

    def put(x, sharding):
        if isinstance(x, Cpx):
            return Cpx(jax.device_put(x.re, sharding),
                       jax.device_put(x.im, sharding))
        return jax.device_put(x, sharding)

    return data._replace(
        src=put(data.src, both),
        rec_obs=put(data.rec_obs, shot),
        rx_idx=put(data.rx_idx, shot),
        f=put(data.f, rep),
        rec_ref=(None if data.rec_ref is None
                 else put(data.rec_ref, shot)),
    )
