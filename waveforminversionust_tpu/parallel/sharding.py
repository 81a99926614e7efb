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


def shot_freq_mesh(n_shot: int, n_freq: int, devices=None) -> Mesh:
    """2D (shot, freq) mesh."""
    devices = np.array(jax.devices() if devices is None else devices)
    return Mesh(devices[:n_shot * n_freq].reshape(n_shot, n_freq),
                ("shot", "freq"))


def shard_fwi_data(data: FWIData, mesh: Mesh,
                   axis_name: str = "shot") -> FWIData:
    """Place the shot-batched arrays of FWIData on the mesh, sharded along
    the transmit axis; scalars replicate."""
    shot3 = NamedSharding(mesh, P(axis_name, None, None))
    shot2 = NamedSharding(mesh, P(axis_name, None))
    rep = NamedSharding(mesh, P())

    def put(x, sharding):
        if isinstance(x, Cpx):  # split-complex: shard both planes
            return Cpx(jax.device_put(x.re, sharding),
                       jax.device_put(x.im, sharding))
        return jax.device_put(x, sharding)

    return FWIData(
        src=put(data.src, shot3),
        rec_obs=put(data.rec_obs, shot2),
        rx_y=jax.device_put(data.rx_y, shot2),
        rx_x=jax.device_put(data.rx_x, shot2),
        f=jax.device_put(data.f, rep),
    )


def replicate(tree, mesh: Mesh):
    """Replicate a pytree across the mesh."""
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(jnp.asarray(x), rep),
                                  tree)
