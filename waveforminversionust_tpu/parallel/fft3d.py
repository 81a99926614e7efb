"""Distributed (pencil-decomposed) 3D FFT and the grid-sharded 3D CBS solver.

The 3D convergent-Born solver (:mod:`..ops.born3d`) is global in k-space:
every iteration applies a full 3D FFT pair, so z-slab domain decomposition
needs a DISTRIBUTED transform, not halo exchange (the operator has no
stencil locality to exploit). This module supplies it, TPU-native:

  * fields live z-slab-sharded over a mesh ``grid`` axis (one slab of
    ``nz/P`` planes per device);
  * the forward transform runs a local 2D FFT over (ny, nx), one
    ``all_to_all`` over ICI that re-pencils the block from z-sharded to
    y-sharded (the classic slab -> pencil transpose), then a local FFT
    over the now-complete z axis;
  * the k-space Green's-function multiply happens in the transposed
    (y-sharded) layout against a locally-built ``g0`` chunk, so no device
    ever materializes the full spectrum;
  * the inverse transform mirrors the path back.

One CBS iteration therefore costs two all_to_alls over ICI plus local
FFTs/elementwise work — the textbook distributed-spectral pattern ("How to
Scale Your Model"'s transpose-based FFT recipe). The reference has no 3D
and no distributed execution at all (SURVEY.md section 2); this extends
the framework's grid axis (2D: SPIKE direct solves, :mod:`.spike`) to the
3D engine.

Constraints: ``nz % P == 0`` and ``ny % P == 0`` (equal all_to_all splits).
Split-complex throughout (:class:`..ops.cpx.Cpx`).

Runtime note: verified on the virtual CPU mesh (tests/test_fft3d.py) and
on the axon TPU runtime under ``jax.jit`` (a 1-device mesh solve runs in
~1.7 s warm+compile). As with everything on that tunneled runtime, call
it INSIDE a jit — the eager path dispatches per-op remote compiles and
appears to hang (.claude/skills/verify gotcha #1); ``nonlinear_cg_3d``
is jitted and needs no care.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PMLConfig
from ..models.grid3d import Grid3D
from ..ops import cpx
from ..ops.cpx import Cpx

__all__ = ["fft3_sharded", "ifft3_sharded", "born_series_solve_3d_sharded",
           "born_gmres_solve_3d_sharded", "shard_volume"]


def _fft_axes(x: Cpx, axes) -> Cpx:
    fr = jnp.fft.fftn(x.re, axes=axes)
    fi = jnp.fft.fftn(x.im, axes=axes)
    return Cpx(jnp.real(fr) - jnp.imag(fi), jnp.imag(fr) + jnp.real(fi))


def _ifft_axes(x: Cpx, axes) -> Cpx:
    n = 1
    for a in axes:
        n *= x.re.shape[a]
    y = _fft_axes(x.conj(), axes).conj()
    return Cpx(y.re / n, y.im / n)


# DFT-as-matmul local transforms (same MXU trick as ops.born3d._dft3,
# measured there: 1.35x at 64, 4.2x at non-power-of-two axes). Specs are
# for the 4D (batch, z, y, x) local pencil blocks.
_DFT_SPECS_4D = {1: "bzyx,zw->bwyx", 2: "bzyx,yw->bzwx", 3: "bzyx,xw->bzyw"}


def _dft_axes(x: Cpx, axes, inverse: bool = False) -> Cpx:
    from ..ops.born3d import _dft_mats

    prec = jax.lax.Precision.HIGHEST
    scale = 1.0
    for a in axes:
        a = a % x.re.ndim
        n = x.re.shape[a]
        wr, wi = _dft_mats(n)
        if inverse:
            wi = -wi
            scale /= n
        spec = _DFT_SPECS_4D[a]
        er_r = jnp.einsum(spec, x.re, wr, precision=prec)
        er_i = jnp.einsum(spec, x.re, wi, precision=prec)
        ei_r = jnp.einsum(spec, x.im, wr, precision=prec)
        ei_i = jnp.einsum(spec, x.im, wi, precision=prec)
        x = Cpx(er_r - ei_i, er_i + ei_r)
    if inverse:
        x = Cpx(x.re * scale, x.im * scale)
    return x


def _all_to_all(x: Cpx, axis_name: str, split_axis: int,
                concat_axis: int) -> Cpx:
    return Cpx(
        jax.lax.all_to_all(x.re, axis_name, split_axis, concat_axis,
                           tiled=True),
        jax.lax.all_to_all(x.im, axis_name, split_axis, concat_axis,
                           tiled=True))


def _fft3_local(x: Cpx, axis_name: str, use_dft: bool = False) -> Cpx:
    """Forward pencil FFT on a local (batch, nz/P, ny, nx) block.

    Returns the TRANSPOSED k-space layout: local (batch, nz, ny/P, nx),
    i.e. kz complete, ky sharded. Call inside shard_map. ``use_dft``
    swaps the local transforms for MXU matmul contractions.
    """
    fwd = _dft_axes if use_dft else _fft_axes
    x = fwd(x, axes=(-2, -1))                    # local ky, kx
    x = _all_to_all(x, axis_name, split_axis=2, concat_axis=1)  # re-pencil
    return fwd(x, axes=(1,))                     # kz now complete


def _ifft3_local(xk: Cpx, axis_name: str, use_dft: bool = False) -> Cpx:
    """Inverse of :func:`_fft3_local`: transposed k-space block back to the
    z-sharded real-space layout."""
    if use_dft:
        inv = partial(_dft_axes, inverse=True)
    else:
        inv = _ifft_axes
    xk = inv(xk, axes=(1,))
    xk = _all_to_all(xk, axis_name, split_axis=1, concat_axis=2)
    return inv(xk, axes=(-2, -1))


def fft3_sharded(x: Cpx, mesh: Mesh, grid_axis: str = "grid",
                 spectral: str = "auto") -> Cpx:
    """Distributed 3D FFT of a (batch, nz, ny, nx) field sharded on z.

    The result is the full 3D spectrum in the TRANSPOSED sharding (ky
    sharded over the mesh axis, kz complete) — the natural layout for
    diagonal k-space multipliers; pair with :func:`ifft3_sharded`.
    ``spectral``: "fft" | "dft" | "auto" (MXU matmul transforms on TPU
    for axes <= 128; see ops.born3d).
    """
    from ..ops.born3d import _use_dft

    fn = shard_map(partial(_fft3_local, axis_name=grid_axis,
                           use_dft=_use_dft(x.re.shape[-3:], spectral)),
                   mesh=mesh,
                   in_specs=(P(None, grid_axis, None, None),),
                   out_specs=P(None, None, grid_axis, None))
    return fn(x)


def ifft3_sharded(xk: Cpx, mesh: Mesh, grid_axis: str = "grid",
                  spectral: str = "auto") -> Cpx:
    """Inverse distributed 3D FFT (transposed spectrum -> z-sharded field)."""
    from ..ops.born3d import _use_dft

    # xk is in the transposed layout; the GLOBAL axis sizes are what the
    # contractions see (z complete locally, y sharded): recover them from
    # the mesh axis size.
    nz, nyl, nx = xk.re.shape[-3:]
    ny = nyl * mesh.shape[grid_axis]
    fn = shard_map(partial(_ifft3_local, axis_name=grid_axis,
                           use_dft=_use_dft((nz, ny, nx), spectral)),
                   mesh=mesh,
                   in_specs=(P(None, None, grid_axis, None),),
                   out_specs=P(None, grid_axis, None, None))
    return fn(xk)


def _born_operator_local(vel, f, alpha=None, *, grid: Grid3D,
                         pml: PMLConfig, adjoint: bool, n_order: int,
                         axis_name: str, use_dft: bool = False):
    """shard_map body piece: the CBS operator on z-slab-sharded volumes.

    Mirrors ops.born3d.born_operator_3d exactly, with every global scalar
    reduced over the mesh axis (pmax/pmin/psum) and the k-space multiply
    performed in the transposed pencil layout against a locally-built g0
    chunk. Returns (greens, v_pot, gamma, n_heur) like the unsharded one.
    """
    nz, ny, nx = grid.shape
    p = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    nzl, nyl = nz // p, ny // p
    sign = float(pml.sign_convention) * (-1.0 if adjoint else 1.0)

    vel = jnp.asarray(vel, jnp.float32)          # (nzl, ny, nx) local slab
    k_real = 2 * jnp.pi * f / vel

    # Global-mean background wavenumber (psum over slabs).
    k2_sum = jax.lax.psum(jnp.sum(k_real ** 2), axis_name)
    k0_b = jnp.sqrt(k2_sum / (nz * ny * nx))

    # Polynomial absorbing shell on the local slab: the z profile is the
    # device's slice of the global coordinate axis.
    c_att = pml.a0 / pml.l_pml
    x = jnp.asarray(grid.x, jnp.float32)
    y = jnp.asarray(grid.y, jnp.float32)
    z_full = jnp.asarray(grid.z, jnp.float32)
    z = jax.lax.dynamic_slice(z_full, (idx * nzl,), (nzl,))
    x_p = jnp.maximum(jnp.abs(x) + pml.l_pml - (nx - 1) * grid.dx / 2, 0.0)
    y_p = jnp.maximum(jnp.abs(y) + pml.l_pml - (ny - 1) * grid.dy / 2, 0.0)
    z_p = jnp.maximum(jnp.abs(z) + pml.l_pml - (nz - 1) * grid.dz / 2, 0.0)
    r_b = jnp.sqrt(z_p[:, None, None] ** 2 + y_p[None, :, None] ** 2
                   + x_p[None, None, :] ** 2)
    cr = c_att * r_b
    trunc_exp = jnp.ones_like(cr)
    for m in range(n_order, 0, -1):
        trunc_exp = 1 + trunc_exp * cr / m
    denom = math.factorial(n_order) * trunc_exp
    curve = Cpx((c_att ** 2) * (n_order - cr) * cr ** (n_order - 1) / denom,
                (c_att ** 2) * (2 * k0_b * r_b * sign)
                * cr ** (n_order - 1) / denom)
    if alpha is not None:
        alpha = jnp.asarray(alpha, jnp.float32)
        k2 = Cpx(k_real ** 2 - alpha ** 2 + curve.re,
                 curve.im + 2 * sign * alpha * k_real)
    else:
        k2 = Cpx(k_real ** 2 + curve.re, curve.im)
    k = cpx.sqrt(k2)

    k_0 = (jax.lax.pmin(jnp.min(k.re), axis_name)
           + jax.lax.pmax(jnp.max(k.re), axis_name)) / 2
    v_pot0 = Cpx(k2.re - k_0 ** 2, k2.im)
    eps = jax.lax.pmax(jnp.max(cpx.absval(v_pot0)), axis_name) * sign
    v_pot = Cpx(v_pot0.re, v_pot0.im - eps)
    gamma = cpx.mul(Cpx(jnp.zeros_like(eps), 1.0 / eps), v_pot)

    pseudo_prop_len = 2 * k_0 / jnp.abs(eps)
    n_heur = jnp.ceil(jnp.float32(grid.diagonal) / pseudo_prop_len)

    # g0 chunk in the TRANSPOSED pencil layout (kz complete, ky sharded).
    kx = (2 * jnp.pi * jnp.fft.fftfreq(nx, d=grid.dx)).astype(jnp.float32)
    ky = (2 * jnp.pi * jnp.fft.fftfreq(ny, d=grid.dy)).astype(jnp.float32)
    kz = (2 * jnp.pi * jnp.fft.fftfreq(nz, d=grid.dz)).astype(jnp.float32)
    ky_loc = jax.lax.dynamic_slice(ky, (idx * nyl,), (nyl,))
    p2 = (kz[:, None, None] ** 2 + ky_loc[None, :, None] ** 2
          + kx[None, None, :] ** 2)
    g0 = cpx.reciprocal(Cpx(p2 - k_0 ** 2, -eps * jnp.ones_like(p2)))

    def greens(w: Cpx) -> Cpx:
        wk = _fft3_local(w, axis_name, use_dft=use_dft)
        return _ifft3_local(cpx.mul(g0, wk), axis_name, use_dft=use_dft)

    return greens, v_pot, gamma, n_heur


def _born_local(vel, src, f, alpha=None, *, grid: Grid3D, pml: PMLConfig,
                adjoint: bool, n_order: int, iter_cap: int,
                iter_scale: float, axis_name: str, use_dft: bool = False):
    """shard_map body: the WHOLE 3D CBS fixed-point solve on z-slab-sharded
    volumes (operator from :func:`_born_operator_local`)."""
    greens, v_pot, gamma, n_heur = _born_operator_local(
        vel, f, alpha, grid=grid, pml=pml, adjoint=adjoint, n_order=n_order,
        axis_name=axis_name, use_dft=use_dft)
    n_iter = jnp.minimum((iter_scale * n_heur).astype(jnp.int32), iter_cap)

    def body(i, u):
        upd = u - greens(cpx.mul(v_pot, u) - src)
        return u - cpx.mul(gamma, upd)

    # Zero initial field DERIVED from src so its type carries the mesh-axis
    # "varying" tag (a plain cpx.zeros is replicated-typed and trips the
    # fori_loop carry check under shard_map).
    u0 = Cpx(src.re * 0, src.im * 0)
    u = jax.lax.fori_loop(0, n_iter, body, u0)
    return u, n_iter


def _born_gmres_local(vel, src, f, alpha=None, *, grid: Grid3D,
                      pml: PMLConfig, adjoint: bool, n_order: int,
                      tol: float, maxiter: int, restart: int,
                      axis_name: str, use_dft: bool = False):
    """shard_map body: Krylov-accelerated CBS on z-slab-sharded volumes.

    Same operator/rhs formulation as the single-device
    ops.born3d.born_gmres_solve_3d; the Arnoldi inner products psum over
    the mesh axis (gmres_cpx(axis_name=...)), so the Hessenberg problem is
    replicated and each matvec costs the usual two all_to_alls plus one
    scalar psum per MGS dot — negligible next to the transform traffic.
    """
    from ..ops.krylov import gmres_cpx

    greens, v_pot, gamma, _ = _born_operator_local(
        vel, f, alpha, grid=grid, pml=pml, adjoint=adjoint, n_order=n_order,
        axis_name=axis_name, use_dft=use_dft)

    def a_op(u):
        return cpx.mul(gamma, u - greens(cpx.mul(v_pot, u)))

    b = -cpx.mul(gamma, greens(src))
    res = gmres_cpx(a_op, b, tol=tol, maxiter=maxiter, restart=restart,
                    axis_name=axis_name)
    return res.x, res.iterations


def born_series_solve_3d_sharded(vel, src, f, grid: Grid3D, mesh: Mesh,
                                 pml: PMLConfig = PMLConfig(a0=20.0,
                                                            l_pml=12e-3),
                                 adjoint: bool = False, n_order: int = 9,
                                 iter_cap: int = 2000,
                                 iter_scale: float = 1.0,
                                 attenuation=None,
                                 grid_axis: str = "grid",
                                 spectral: str = "auto",
                                 batch_axis: str | None = None):
    """Grid-sharded 3D CBS Helmholtz solve: drop-in for
    ops.born3d.born_series_solve_3d with volumes z-slab-sharded over
    ``mesh[grid_axis]`` — one nz/P slab per device, two ICI all_to_alls
    per iteration (see module docstring). Verified sharded == unsharded
    in tests/test_fft3d.py.

    Args match born_series_solve_3d; ``src`` may be a complex array or a
    Cpx pair, shape (batch, nz, ny, nx). Requires nz % P == 0 and
    ny % P == 0.

    ``batch_axis``: name of a second mesh axis to additionally shard the
    transmit batch over (shot DP composed with the pencil decomposition;
    every collective inside the solve runs over ``grid_axis`` only, so
    shot groups proceed independently). The fixed-point iteration count
    depends only on the (shot-replicated) velocity, so it stays a
    replicated scalar.
    """
    nz, ny, nx = grid.shape
    p = mesh.shape[grid_axis]
    if nz % p or ny % p:
        raise ValueError(f"nz={nz} and ny={ny} must divide the mesh axis "
                         f"{grid_axis!r} size {p} (pencil transpose)")
    src = cpx.of(src)
    if batch_axis is not None and src.re.shape[0] % mesh.shape[batch_axis]:
        raise ValueError(
            f"batch {src.re.shape[0]} not divisible by mesh axis "
            f"'{batch_axis}' of size {mesh.shape[batch_axis]}")
    f = jnp.asarray(f, jnp.float32)

    from ..ops.born3d import _use_dft

    vol = P(grid_axis, None, None)
    batch_vol = P(batch_axis, grid_axis, None, None)
    body = partial(_born_local, grid=grid, pml=pml, adjoint=adjoint,
                   n_order=n_order, iter_cap=iter_cap, iter_scale=iter_scale,
                   axis_name=grid_axis,
                   use_dft=_use_dft(grid.shape, spectral))
    out_specs = (batch_vol, P())
    if attenuation is None:
        fn = shard_map(body, mesh=mesh, in_specs=(vol, batch_vol, P()),
                       out_specs=out_specs)
        return fn(jnp.asarray(vel, jnp.float32), src, f)
    fn = shard_map(body, mesh=mesh, in_specs=(vol, batch_vol, P(), vol),
                   out_specs=out_specs)
    return fn(jnp.asarray(vel, jnp.float32), src, f,
              jnp.asarray(attenuation, jnp.float32))


def born_gmres_solve_3d_sharded(vel, src, f, grid: Grid3D, mesh: Mesh,
                                pml: PMLConfig = PMLConfig(a0=20.0,
                                                           l_pml=12e-3),
                                adjoint: bool = False, n_order: int = 9,
                                tol: float = 2e-3, maxiter: int = 600,
                                restart: int = 8, attenuation=None,
                                grid_axis: str = "grid",
                                spectral: str = "auto",
                                batch_axis: str | None = None):
    """Grid-sharded Krylov-accelerated 3D CBS solve: drop-in for
    ops.born3d.born_gmres_solve_3d with volumes z-slab-sharded over
    ``mesh[grid_axis]``. Combines the two 3D levers (PERF_NOTES round 3):
    the pencil-decomposed transform (two ICI all_to_alls per matvec) and
    the GMRES matvec saving (~2x fewer FFT pairs than the fixed point at
    matched residual); Arnoldi dots ride one scalar psum each.

    Args match born_gmres_solve_3d. Requires nz % P == 0 and ny % P == 0.
    Returns (wavefield Cpx, matvecs int32).

    ``batch_axis``: name of a second mesh axis to additionally shard the
    transmit batch over (shot DP composed with the pencil decomposition).
    All collectives inside the solve run over ``grid_axis`` only, so each
    shot group converges its own batch shard independently — the matvec
    count is then PER SHOT GROUP and the second return becomes a
    (mesh.shape[batch_axis],) int32 array instead of a scalar.
    """
    nz, ny, nx = grid.shape
    p = mesh.shape[grid_axis]
    if nz % p or ny % p:
        raise ValueError(f"nz={nz} and ny={ny} must divide the mesh axis "
                         f"{grid_axis!r} size {p} (pencil transpose)")
    src = cpx.of(src)
    if batch_axis is not None and src.re.shape[0] % mesh.shape[batch_axis]:
        raise ValueError(
            f"batch {src.re.shape[0]} not divisible by mesh axis "
            f"'{batch_axis}' of size {mesh.shape[batch_axis]}")
    f = jnp.asarray(f, jnp.float32)

    from ..ops.born3d import _use_dft

    vol = P(grid_axis, None, None)
    batch_vol = P(batch_axis, grid_axis, None, None)
    body = partial(_born_gmres_local, grid=grid, pml=pml, adjoint=adjoint,
                   n_order=n_order, tol=tol, maxiter=maxiter,
                   restart=restart, axis_name=grid_axis,
                   use_dft=_use_dft(grid.shape, spectral))
    if batch_axis is None:
        out_specs = (batch_vol, P())
        vma = {}
    else:
        # per-shot-group convergence: one matvec count per batch shard
        body_scalar = body

        def body(*args):
            u, mv = body_scalar(*args)
            return u, mv[None]

        out_specs = (batch_vol, P(batch_axis))
        # The Krylov carries (Hessenberg, residual norms, the while cond)
        # legitimately VARY over the shot axis — each shot group converges
        # its own batch shard, and every collective rides grid_axis only,
        # so the replica groups never cross shot boundaries. The vma
        # checker cannot express "varying over shot, replicated over
        # grid" through lax.while_loop/fori_loop carries, so disable it
        # here (parallel.spike runs check_vma=False for the same reason).
        # NOTE: check_vma=False is whole-body — it also drops static
        # shard-safety checking over GRID-axis collectives in this branch,
        # not just the shot axis that justifies it; the composed-mesh
        # trajectory tests (tests/test_parallel.py shot x grid == single)
        # are the guard for those.
        vma = {"check_vma": False}
    if attenuation is None:
        fn = shard_map(body, mesh=mesh, in_specs=(vol, batch_vol, P()),
                       out_specs=out_specs, **vma)
        return fn(jnp.asarray(vel, jnp.float32), src, f)
    fn = shard_map(body, mesh=mesh, in_specs=(vol, batch_vol, P(), vol),
                   out_specs=out_specs, **vma)
    return fn(jnp.asarray(vel, jnp.float32), src, f,
              jnp.asarray(attenuation, jnp.float32))


def shard_volume(x, mesh: Mesh, grid_axis: str = "grid", axis: int = 0):
    """Place a volume (or Cpx pair) with its z dimension sharded over the
    mesh axis (``axis`` = which array dimension is z)."""
    spec = [None] * (x.re.ndim if isinstance(x, Cpx) else x.ndim)
    spec[axis] = grid_axis
    sh = NamedSharding(mesh, P(*spec))
    if isinstance(x, Cpx):
        return Cpx(jax.device_put(x.re, sh), jax.device_put(x.im, sh))
    return jax.device_put(x, sh)
