"""Grid-sharded direct Helmholtz solve: distributed SPIKE factorization.

The block-Thomas factorization (:mod:`..ops.split_engine`) is sequential in
the grid-row axis, so a single factorization/solve cannot use more than one
chip and a single chip bounds the grid size. SPIKE [Polizzi & Sameh 2006]
removes both limits for the same block-tridiagonal system:

  * the y axis is partitioned into P contiguous slabs, one per device on a
    mesh 'grid' axis; each device block-Thomas-factorizes its OWN slab's
    interior concurrently (wall-clock factorization ~ ny/P rows instead of
    ny, memory per device ~ 1/P);
  * the cross-slab couplings are condensed at factor time into "spikes"
    W = A_p^-1 (e_0 (x) L_a) and V = A_p^-1 (e_{m-1} (x) U_{a+m-1}) — two
    nx-column slab solves — whose boundary rows form a small reduced
    block-tridiagonal system over the 2P slab-boundary unknowns;
  * each multi-RHS solve is then: one local slab solve (concurrent), an
    ``all_gather`` of the boundary rows (the only inter-chip traffic, ICI),
    a replicated P-row reduced solve, and a local rank-2nx correction.

One SPIKE factor serves forward AND adjoint (H^H) solves: the slab factors
already expose adjoint sweeps, and the adjoint spikes (built from the
conjugate-transposed cross couplings, fetched from the mesh neighbors with
one ``ppermute``) are computed at factor time.

Everything is split-complex (:class:`~..ops.cpx.Cpx`) — the targeted TPU
runtime has no complex data movement (see ops.cpx).

This replaces the host sparse solve of reference solve_helmholtz.py:85-93 /
solveHelmholtz.m:128-137 for grids beyond one chip (>= 1024^2, 3D slabs);
sharded == unsharded is verified on the virtual 8-device CPU mesh in
tests/test_spike.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.grid import Grid2D
from ..ops import cpx
from ..ops.cpx import Cpx
from ..ops.split_engine import (BandedFactorCpx, banded_factor_cpx,
                                banded_solve_cpx, _tri_dense_cpx)


class SpikeFactor(NamedTuple):
    """Distributed factor. Leaves with a leading ny axis are sharded over
    the mesh 'grid' axis; the reduced-system blocks are replicated."""

    g: Cpx            # (ny, nx, nx)  slab-interior Schur inverses (sharded)
    coeffs_int: Cpx   # (9, ny, nx)   planes with cross-slab rows zeroed
    w: Cpx            # (nx, ny, nx)  left spikes  W[r, j, :] (sharded ax 1)
    v: Cpx            # (nx, ny, nx)  right spikes V[r, j, :]
    wh: Cpx           # adjoint left spikes
    vh: Cpx           # adjoint right spikes
    red_g: Cpx        # (P, 2nx, 2nx) reduced-system Schur inverses (repl.)
    red_sub: Cpx      # (P, 2nx, 2nx) reduced sub-diagonal blocks
    red_sup: Cpx      # (P, 2nx, 2nx) reduced super-diagonal blocks
    red_g_h: Cpx      # adjoint reduced factor
    red_sub_h: Cpx
    red_sup_h: Cpx


def _zero_cross_rows(c: Cpx) -> Cpx:
    """Zero the couplings that leave the slab: L planes (3, 5, 6) of local
    row 0 and U planes (4, 7, 8) of the local last row."""
    def z(p):
        p = p.at[(3, 5, 6), 0].set(0.0)
        p = p.at[(4, 7, 8), -1].set(0.0)
        return p
    return cpx.apply_parts(z, c)


def _dense_l_first(c: Cpx) -> Cpx:
    """Dense (nx, nx) L block of the slab's first row (couples to the
    previous slab's last row)."""
    return _tri_dense_cpx(c[3, 0], c[5, 0], c[6, 0])


def _dense_u_last(c: Cpx) -> Cpx:
    """Dense (nx, nx) U block of the slab's last row (couples to the next
    slab's first row)."""
    return _tri_dense_cpx(c[4, -1], c[7, -1], c[8, -1])


def _spike_solve_cols(factor: BandedFactorCpx, block: Cpx, first: bool,
                      m: int, adjoint: bool) -> Cpx:
    """Solve A_p X = e_pos (x) block for all nx columns of ``block``.

    Returns (nx, m, nx): X[r] is the spike for boundary unknown r.
    """
    nx = block.re.shape[-1]
    rhs_row = cpx.apply_parts(lambda p: p.T, block)     # rhs_row[r, i]
    z = jnp.zeros((nx, m, nx), jnp.float32)
    pos = 0 if first else m - 1
    rhs = Cpx(z.at[:, pos, :].set(rhs_row.re), z.at[:, pos, :].set(rhs_row.im))
    return banded_solve_cpx(factor, rhs, adjoint=adjoint)


def _dense_thomas_factor(diag: Cpx, sub: Cpx, sup: Cpx):
    """Block-Thomas factor of a dense block-tridiagonal system.

    diag/sub/sup: (P, n, n); sub[0] and sup[-1] are ignored. Returns the
    Schur-complement inverses G (P, n, n). Small P only (the reduced
    system) — the scan is sequential.
    """
    g0 = cpx.inv(diag[0])

    def step(g_prev, row):
        d, su, sp_prev = row
        s = d - cpx.einsum("ij,jk->ik", su,
                           cpx.einsum("ij,jk->ik", g_prev, sp_prev))
        g = cpx.inv(s)
        return g, g

    _, g_rest = jax.lax.scan(step, g0, (diag[1:], sub[1:], sup[:-1]))
    return cpx.concat([Cpx(g0.re[None], g0.im[None]), g_rest], 0)


def _dense_thomas_solve(g: Cpx, sub: Cpx, sup: Cpx, b: Cpx) -> Cpx:
    """Solve the factored dense block-tridiagonal system; b: (P, batch, n)."""
    def fwd(z_prev, row):
        g_prev, su, bi = row
        z = bi - cpx.einsum("bj,ij->bi", cpx.einsum("bj,ij->bi", z_prev,
                                                    g_prev), su)
        return z, z

    _, z_rest = jax.lax.scan(fwd, b[0], (g[:-1], sub[1:], b[1:]))
    z = cpx.concat([b[:1], z_rest], 0)

    x_last = cpx.einsum("bj,ij->bi", z[-1], g[-1])

    def bwd(x_next, row):
        gi, sp, zi = row
        rhs = zi - cpx.einsum("bj,ij->bi", x_next, sp)
        x = cpx.einsum("bj,ij->bi", rhs, gi)
        return x, x

    _, x_rest = jax.lax.scan(bwd, x_last, (g[:-1], sup[:-1], z[:-1]),
                             reverse=True)
    return cpx.concat([x_rest, Cpx(x_last.re[None], x_last.im[None])], 0)


def _reduced_blocks(w_top, w_bot, v_top, v_bot, n_slabs: int):
    """Assemble the reduced block-tridiagonal system over z_p = [t_p; b_p]
    (top/bottom boundary rows of each slab):

        t_p + W_p^top b_{p-1} + V_p^top t_{p+1} = y_p^top
        b_p + W_p^bot b_{p-1} + V_p^bot t_{p+1} = y_p^bot

    Blocks act on the RIGHT of row vectors elsewhere in this module; here
    we store standard (out, in) matrices: sub_p = [[0, Wt_p], [0, Wb_p]],
    sup_p = [[Vt_p, 0], [Vb_p, 0]], diag = I. Spike tensors index
    X[r_boundary, i_entry], i.e. (in, out) — transpose into (out, in).
    """
    nx = w_top.re.shape[-1]

    def t(x):  # (P, r, i) -> (P, i, r)
        return cpx.apply_parts(lambda p: jnp.swapaxes(p, 1, 2), x)

    wt, wb, vt, vb = t(w_top), t(w_bot), t(v_top), t(v_bot)
    z = cpx.zeros((n_slabs, nx, nx))
    sub = cpx.concat([cpx.concat([z, wt], 2), cpx.concat([z, wb], 2)], 1)
    sup = cpx.concat([cpx.concat([vt, z], 2), cpx.concat([vb, z], 2)], 1)
    eye = jnp.eye(2 * nx, dtype=jnp.float32)
    diag = Cpx(jnp.broadcast_to(eye, (n_slabs, 2 * nx, 2 * nx)),
               jnp.zeros((n_slabs, 2 * nx, 2 * nx), jnp.float32))
    return diag, sub, sup


def _factor_local(c_local: Cpx, axis_name: str):
    """shard_map body: factor one slab + spikes + replicated reduced
    factors."""
    m = c_local.re.shape[1]
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)

    c_int = _zero_cross_rows(c_local)
    lf = _dense_l_first(c_local)      # couples to slab idx-1 (forward op)
    ul = _dense_u_last(c_local)       # couples to slab idx+1

    # Per-slab block-Thomas factorization: the fused Pallas kernel off-CPU
    # (each device runs it on its own slab inside shard_map; validated
    # single-chip in ops/pallas_factor) and the XLA scan on CPU meshes.
    if jax.default_backend() != "cpu":
        from ..ops.pallas_factor import banded_factor_pallas
        # keep_cropped: the SPIKE slab solves and SpikeFactor.g consume the
        # cropped G; inside this (jitted) shard_map body XLA DCEs whichever
        # form goes unused, so there is no double-buffering cost.
        factor = banded_factor_pallas(c_int, keep_cropped=True)
    else:
        factor = banded_factor_cpx(c_int)

    # Forward spikes. First/last slab have no left/right coupling: lf/ul
    # are zero there by construction ONLY if the global planes are zero at
    # the domain border rows — they are (Dirichlet rows have no L/U), so no
    # masking is needed; keep a belt-and-braces mask anyway.
    mask_l = jnp.where(idx == 0, 0.0, 1.0)
    mask_r = jnp.where(idx == n - 1, 0.0, 1.0)
    lf = cpx.scale(lf, mask_l)
    ul = cpx.scale(ul, mask_r)
    w = _spike_solve_cols(factor, lf, first=True, m=m, adjoint=False)
    v = _spike_solve_cols(factor, ul, first=False, m=m, adjoint=False)

    # Adjoint couplings: L'_a = (U_{a-1})^H comes from the LEFT neighbor's
    # u_last; U'_{a+m-1} = (L_{a+m})^H from the RIGHT neighbor's l_first.
    ul_unmasked = _dense_u_last(c_local)
    lf_unmasked = _dense_l_first(c_local)
    u_prev = jax.lax.ppermute(ul_unmasked, axis_name,
                              [(i, i + 1) for i in range(n - 1)])
    l_next = jax.lax.ppermute(lf_unmasked, axis_name,
                              [(i + 1, i) for i in range(n - 1)])
    lha = cpx.scale(cpx.apply_parts(lambda p: p.T, u_prev).conj(), mask_l)
    uha = cpx.scale(cpx.apply_parts(lambda p: p.T, l_next).conj(), mask_r)
    wh = _spike_solve_cols(factor, lha, first=True, m=m, adjoint=True)
    vh = _spike_solve_cols(factor, uha, first=False, m=m, adjoint=True)

    # Reduced systems (replicated): gather each slab's 4 boundary blocks.
    def gather(x):
        return cpx.apply_parts(lambda p: jax.lax.all_gather(p, axis_name), x)

    rf = _reduced_blocks(gather(w[:, 0]), gather(w[:, -1]),
                         gather(v[:, 0]), gather(v[:, -1]), n)
    red_g = _dense_thomas_factor(*rf)
    rh = _reduced_blocks(gather(wh[:, 0]), gather(wh[:, -1]),
                         gather(vh[:, 0]), gather(vh[:, -1]), n)
    red_g_h = _dense_thomas_factor(*rh)

    return SpikeFactor(g=factor.g, coeffs_int=c_int, w=w, v=v, wh=wh, vh=vh,
                       red_g=red_g, red_sub=rf[1], red_sup=rf[2],
                       red_g_h=red_g_h, red_sub_h=rh[1], red_sup_h=rh[2])


def _solve_local(fac: SpikeFactor, rhs_local: Cpx, axis_name: str,
                 adjoint: bool) -> Cpx:
    """shard_map body: one multi-RHS solve with a prepared SPIKE factor."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    local = BandedFactorCpx(g=fac.g, coeffs=fac.coeffs_int)
    y = banded_solve_cpx(local, rhs_local, adjoint=adjoint)  # (b, m, nx)

    # Reduced solve over boundary rows (replicated on every device).
    tops = cpx.apply_parts(lambda p: jax.lax.all_gather(p, axis_name),
                           y[:, 0])                         # (P, b, nx)
    bots = cpx.apply_parts(lambda p: jax.lax.all_gather(p, axis_name),
                           y[:, -1])
    red_rhs = cpx.concat([tops, bots], 2)                   # (P, b, 2nx)
    if adjoint:
        z = _dense_thomas_solve(fac.red_g_h, fac.red_sub_h, fac.red_sup_h,
                                red_rhs)
    else:
        z = _dense_thomas_solve(fac.red_g, fac.red_sub, fac.red_sup, red_rhs)
    nx = y.re.shape[-1]
    t_all = z[:, :, :nx]                                    # (P, b, nx)
    b_all = z[:, :, nx:]

    # Correction: x = y - W b_{p-1} - V t_{p+1}.
    b_prev = cpx.scale(b_all[jnp.maximum(idx - 1, 0)],
                       jnp.where(idx == 0, 0.0, 1.0))
    t_next = cpx.scale(t_all[jnp.minimum(idx + 1, n - 1)],
                       jnp.where(idx == n - 1, 0.0, 1.0))
    spikes_w = fac.wh if adjoint else fac.w
    spikes_v = fac.vh if adjoint else fac.v
    x = y - cpx.einsum("rji,br->bji", spikes_w, b_prev) \
          - cpx.einsum("rji,br->bji", spikes_v, t_next)
    return x


def spike_factor(coeffs: Cpx, mesh: Mesh, axis_name: str = "grid",
                 ) -> SpikeFactor:
    """Factor the 9-plane system distributed over ``mesh[axis_name]``.

    ``coeffs`` is the global (9, ny, nx) split-complex plane stack (may
    already be sharded over its row axis); ny must be divisible by the mesh
    axis size and ny/P >= 2.
    """
    n = mesh.shape[axis_name]
    ny = coeffs.re.shape[1]
    if ny % n or ny // n < 2:
        raise ValueError(f"ny={ny} not partitionable into {n} slabs")
    out_specs = SpikeFactor(
        g=Cpx(P(axis_name), P(axis_name)),
        coeffs_int=Cpx(P(None, axis_name), P(None, axis_name)),
        w=Cpx(P(None, axis_name), P(None, axis_name)),
        v=Cpx(P(None, axis_name), P(None, axis_name)),
        wh=Cpx(P(None, axis_name), P(None, axis_name)),
        vh=Cpx(P(None, axis_name), P(None, axis_name)),
        red_g=Cpx(P(), P()), red_sub=Cpx(P(), P()), red_sup=Cpx(P(), P()),
        red_g_h=Cpx(P(), P()), red_sub_h=Cpx(P(), P()),
        red_sup_h=Cpx(P(), P()),
    )
    fn = shard_map(partial(_factor_local, axis_name=axis_name), mesh=mesh,
                   in_specs=(Cpx(P(None, axis_name), P(None, axis_name)),),
                   out_specs=out_specs, check_vma=False)
    return jax.jit(fn)(coeffs)


def spike_solve(factor: SpikeFactor, rhs: Cpx, mesh: Mesh,
                axis_name: str = "grid", adjoint: bool = False,
                batch_axis: str | None = None) -> Cpx:
    """Solve H x = rhs (or H^H x = rhs) with a prepared SPIKE factor.

    rhs: (batch, ny, nx) split-complex, sharded (or shardable) over ny.

    ``batch_axis``: name of a SECOND mesh axis to additionally shard the
    RHS batch over (shot data parallelism composed with the grid
    decomposition, e.g. a ("shot", "grid") mesh). The SPIKE elimination is
    independent per right-hand side and all its collectives run over
    ``axis_name`` only, so each shot group solves its own batch shard
    against the (grid-sharded, shot-replicated) factor — no cross-shot
    communication inside the solve. Requires batch % mesh.shape[batch_axis]
    == 0.
    """
    if batch_axis is not None and rhs.re.shape[0] % mesh.shape[batch_axis]:
        raise ValueError(
            f"batch {rhs.re.shape[0]} not divisible by mesh axis "
            f"'{batch_axis}' of size {mesh.shape[batch_axis]}")
    spec = Cpx(P(batch_axis, axis_name), P(batch_axis, axis_name))
    fspec = Cpx(P(None, axis_name), P(None, axis_name))
    factor_specs = SpikeFactor(
        g=Cpx(P(axis_name), P(axis_name)),
        coeffs_int=fspec, w=fspec, v=fspec, wh=fspec, vh=fspec,
        red_g=Cpx(P(), P()), red_sub=Cpx(P(), P()), red_sup=Cpx(P(), P()),
        red_g_h=Cpx(P(), P()), red_sub_h=Cpx(P(), P()),
        red_sup_h=Cpx(P(), P()),
    )
    fn = shard_map(partial(_solve_local, axis_name=axis_name,
                           adjoint=adjoint),
                   mesh=mesh, in_specs=(factor_specs, spec),
                   out_specs=spec, check_vma=False)
    return jax.jit(fn)(factor, rhs)


# ---------------------------------------------------------------------------
# Helmholtz-level wrappers (the grid-sharded counterpart of
# ops.solve.make_helmholtz_operator / helmholtz_operator_solve)
# ---------------------------------------------------------------------------

def spike_helmholtz_factor(vel, f, grid: Grid2D, mesh: Mesh,
                           config=None, attenuation=None,
                           axis_name: str = "grid") -> SpikeFactor:
    """Build + SPIKE-factor the Helmholtz operator for a y-sharded grid.

    ``vel`` may be sharded over its row axis (P(axis_name)); the
    coefficient planes are built with ordinary array ops, so GSPMD shards
    that work automatically, and the factorization runs one slab per
    device. One factor serves all forward/adjoint solves at this velocity
    (cf. ops.solve.make_helmholtz_operator).
    """
    from ..config import SolverConfig
    from ..ops.split_engine import helmholtz_coefficients_cpx

    cfg = config or SolverConfig()
    coeffs = helmholtz_coefficients_cpx(vel, grid, f, cfg.pml, cfg.stencil,
                                        attenuation=attenuation)
    return spike_factor(coeffs, mesh, axis_name)


def spike_helmholtz_solve(factor: SpikeFactor, src, grid: Grid2D, mesh: Mesh,
                          adjoint: bool = False,
                          axis_name: str = "grid",
                          batch_axis: str | None = None) -> Cpx:
    """Solve H u = src (or H^H u = src) with a prepared grid-sharded factor.

    Handles the Dirichlet boundary-row balance exactly like the
    single-device banded path (see ops.solve.helmholtz_operator_solve):
    the planes describe H_s = D H, so the forward RHS is scaled by D and
    the adjoint solution is scaled back by D.
    """
    from ..ops.stencil import boundary_mask, dirichlet_scale

    src = cpx.of(src)
    single = src.ndim == 2
    if single:
        src = Cpx(src.re[None], src.im[None])
    scale = dirichlet_scale(grid)
    d_map = (1.0 + (scale - 1.0) * boundary_mask(grid)).astype(jnp.float32)
    rhs = src if adjoint else cpx.scale(src, d_map)
    u = spike_solve(factor, rhs, mesh, axis_name, adjoint=adjoint,
                    batch_axis=batch_axis)
    if adjoint:
        u = cpx.scale(u, d_map)
    if single:
        u = u[0]
    return u
