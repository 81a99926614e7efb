"""Grid domain decomposition: halo-exchange stencil application.

For grids too large for one chip (1024^2 and beyond, or 3D slabs), the field
itself is sharded along y across the mesh and the 9-point operator needs one
row of halo from each neighbor per application. The exchange is a pair of
``jax.lax.ppermute`` shifts over the mesh axis — ICI neighbor traffic, the
TPU-native replacement for the reference's nonexistent distributed layer
(SURVEY.md section 2 'Parallelism strategies').

Used via ``shard_map``: fields enter as per-device (batch, ny_local, nx)
blocks; :func:`h_apply_halo` matches :func:`..ops.apply.h_apply` on the
stitched global field (verified in tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.stencil import STENCIL_OFFSETS


def exchange_halo_y(u, axis_name: str):
    """Return (row_below, row_above): each device's neighboring edge rows.

    ``row_below[..., :]`` is the last local row of the previous shard (zeros
    on the first shard); ``row_above`` the first local row of the next shard
    (zeros on the last shard).
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)

    top_row = u[..., -1:, :]
    bot_row = u[..., :1, :]

    # send my top row to the next device (it becomes their row_below)
    row_below = jax.lax.ppermute(top_row, axis_name,
                                 [(i, i + 1) for i in range(n - 1)])
    # send my bottom row to the previous device (their row_above)
    row_above = jax.lax.ppermute(bot_row, axis_name,
                                 [(i + 1, i) for i in range(n - 1)])
    row_below = jnp.where(idx == 0, 0.0, 1.0).astype(u.dtype) * row_below
    row_above = jnp.where(idx == n - 1, 0.0, 1.0).astype(u.dtype) * row_above
    return row_below, row_above


def h_apply_halo(coeffs_local, u_local, axis_name: str = "grid"):
    """Apply the 9-point operator to a y-sharded field inside shard_map.

    Args:
        coeffs_local: (9, ny_local, nx) this shard's coefficient planes.
        u_local: (batch, ny_local, nx) this shard's field rows.
    """
    row_below, row_above = exchange_halo_y(u_local, axis_name)
    u_ext = jnp.concatenate([row_below, u_local, row_above], axis=-2)
    # Apply the stencil on the extended block, then crop the halo rows.
    ny = u_local.shape[-2]
    nx = u_local.shape[-1]
    pad = [(0, 0)] * (u_ext.ndim - 2) + [(0, 0), (1, 1)]
    u_pad = jnp.pad(u_ext, pad)  # x halo is local (zeros at domain edge)
    out = jnp.zeros_like(u_local)
    for s, (dy, dx) in enumerate(STENCIL_OFFSETS):
        # u_ext row r corresponds to global row r-1 relative to the block.
        block = u_pad[..., 1 + dy:1 + dy + ny, 1 + dx:1 + dx + nx]
        out = out + coeffs_local[s] * block
    return out


def make_grid_sharded_apply(mesh: Mesh, axis_name: str = "grid"):
    """shard_map-wrapped operator application over a y-sharded grid.

    Returns apply(coeffs, u) taking globally-shaped arrays sharded as
    P(None, axis_name, None) / P(None, axis_name, None).
    """
    def _apply(coeffs, u):
        return h_apply_halo(coeffs, u, axis_name)

    return jax.shard_map(
        _apply, mesh=mesh,
        in_specs=(P(None, axis_name, None), P(None, axis_name, None)),
        out_specs=P(None, axis_name, None),
    )
