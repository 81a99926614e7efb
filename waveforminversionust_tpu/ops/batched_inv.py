"""Batched dense complex inversion that actually uses the MXU.

Why this exists: the targeted TPU runtime lowers ``jnp.linalg.inv`` to a
latency-bound LU (~60us + 0.85us/n per matrix, ~0.7 Tflop/s) and *loops*
batched inverses one by one; batched complex inverse is UNIMPLEMENTED
outright (PERF_NOTES.md). The block-cyclic-reduction factorization
(:mod:`.cyclic`) needs hundreds of independent (nx, nx) inverses per level,
so we supply our own: an unpivoted blocked Gauss-Jordan where

  * the O(n^3)-flop panel updates are rank-``block`` batched einsums
    (MXU work at full batch), and
  * the (block, block) pivot inverses are a batch-vectorized scalar
    Gauss-Jordan (one rank-1 VPU update per elimination step, amortized
    over the whole batch).

Unpivoted elimination is numerically safe for the Helmholtz Schur blocks
this is built for — the whole banded solver stack is already unpivoted at
~1e-6 residuals (see ops/banded.py). Everything is split-complex
(:class:`~.cpx.Cpx`) because the runtime has no complex data-movement ops.

Numerical note: the textbook "single rank-1 update" identity
``W <- W - (C - E) P^-1 (R + E^T)`` is algebraically exact but computes the
new pivot entry 1/p as ``p - (p^2 - 1)/p`` — catastrophic cancellation in
f32 whenever |p| >> 1 (the Helmholtz Dirichlet rows have p ~ 1/h^2 ~ 1e6).
We therefore apply the plain elimination update to the trailing part and
OVERWRITE the pivot row/column with directly computed values
(R p^-1, -C p^-1, p^-1). Verified against numpy complex128 in
tests/test_batched_inv.py, including real Helmholtz boundary rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import cpx
from .cpx import Cpx


def _batched_pivot_inv(p: Cpx) -> Cpx:
    """Invert a batch of small complex matrices by scalar Gauss-Jordan.

    p: (B, b, b) Cpx. One fori_loop step per elimination index: a batched
    rank-1 update over the full (B, b, b) block — per-step work is
    vectorized across the batch, which is what makes this faster than B
    separate latency-bound LU calls.
    """
    b = p.re.shape[-1]

    iota_r = jnp.arange(b)[None, :, None]  # row index
    iota_c = jnp.arange(b)[None, None, :]  # col index

    def step(w: Cpx, j):
        re, im = w.re, w.im
        # pivot (B,1,1), row (B,1,b), col (B,b,1) at index j
        row_re = jax.lax.dynamic_slice_in_dim(re, j, 1, axis=1)
        row_im = jax.lax.dynamic_slice_in_dim(im, j, 1, axis=1)
        col_re = jax.lax.dynamic_slice_in_dim(re, j, 1, axis=2)
        col_im = jax.lax.dynamic_slice_in_dim(im, j, 1, axis=2)
        piv_re = jax.lax.dynamic_slice_in_dim(row_re, j, 1, axis=2)
        piv_im = jax.lax.dynamic_slice_in_dim(row_im, j, 1, axis=2)

        # 1/pivot, computed directly (no cancellation)
        den = jnp.maximum(piv_re * piv_re + piv_im * piv_im, 1e-38)
        pr, pi = piv_re / den, -piv_im / den

        # scaled column s = C * p^-1 (B, b, 1) and scaled row R * p^-1
        s_re = col_re * pr - col_im * pi
        s_im = col_re * pi + col_im * pr
        sr_re = row_re * pr - row_im * pi
        sr_im = row_re * pi + row_im * pr

        # One fused masked pass: trailing elimination everywhere, column j
        # becomes -s, row j becomes R p^-1, (j, j) becomes p^-1. Using
        # selects instead of dynamic_update_slice keeps each fori step a
        # single pass over the array (measured ~25x faster at (301,64,64)
        # than functional slice updates, which copy the array repeatedly).
        is_r = iota_r == j
        is_c = iota_c == j
        new_re = re - (s_re * row_re - s_im * row_im)
        new_im = im - (s_re * row_im + s_im * row_re)
        new_re = jnp.where(is_c, -s_re, new_re)
        new_im = jnp.where(is_c, -s_im, new_im)
        new_re = jnp.where(is_r, sr_re, new_re)
        new_im = jnp.where(is_r, sr_im, new_im)
        new_re = jnp.where(is_r & is_c, pr, new_re)
        new_im = jnp.where(is_r & is_c, pi, new_im)
        return Cpx(new_re, new_im), None

    # lax.scan, not fori_loop: on the targeted runtime a scan step with an
    # array carry costs ~5-10us while fori_loop lowers to a measurably
    # slower while-loop form (PERF_NOTES.md round 2).
    w, _ = jax.lax.scan(step, p, jnp.arange(b))
    return w


def batched_inv(a: Cpx, block: int = 32, pivot: str = "auto") -> Cpx:
    """Inverse of a batch of complex matrices: (B, n, n) Cpx -> (B, n, n).

    Unpivoted blocked Gauss-Jordan, in place (no augmentation): per panel
    one batched pivot inversion plus two rank-``block`` batched einsums.
    n is padded to a multiple of ``block`` with an identity extension
    (exactly inverted, then cropped).

    ``pivot`` selects the (block, block) pivot-inverse implementation:
    "pallas" (one kernel call, required to beat the runtime's ~86 us/step
    XLA loop floor), "xla" (portable fori_loop), or "auto" (pallas on TPU,
    xla elsewhere).
    """
    if pivot == "auto":
        pivot = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
    if pivot == "pallas":
        from .pallas_inv import batched_small_inv_pallas
        pivot_inv = batched_small_inv_pallas
    elif pivot == "xla":
        pivot_inv = _batched_pivot_inv
    else:
        raise ValueError(f"unknown pivot impl {pivot!r}")
    B, n, _ = a.re.shape
    npanels = -(-n // block)
    npad = npanels * block

    w = a
    if npad != n:
        pad = npad - n
        eye = jnp.broadcast_to(jnp.eye(pad, dtype=jnp.float32), (B, pad, pad))
        re = jnp.zeros((B, npad, npad), jnp.float32)
        re = re.at[:, :n, :n].set(w.re).at[:, n:, n:].set(eye)
        im = jnp.zeros((B, npad, npad), jnp.float32).at[:, :n, :n].set(w.im)
        w = Cpx(re, im)

    for k in range(npanels):
        lo, hi = k * block, (k + 1) * block
        p = Cpx(w.re[:, lo:hi, lo:hi], w.im[:, lo:hi, lo:hi])
        pinv = pivot_inv(p)
        r = Cpx(w.re[:, lo:hi, :], w.im[:, lo:hi, :])          # (B, b, n)
        # column block with the pivot rows zeroed: the rank-b update then
        # leaves rows [lo:hi) untouched (they are overwritten below)
        cz = Cpx(w.re[:, :, lo:hi].at[:, lo:hi, :].set(0.0),
                 w.im[:, :, lo:hi].at[:, lo:hi, :].set(0.0))   # (B, n, b)
        rs = cpx.einsum("bij,bjk->bik", pinv, r)               # P^-1 R
        cs = cpx.einsum("bij,bjk->bik", cz, pinv)              # C P^-1

        # trailing update (writes noise into the panel columns; overwritten)
        w = w - cpx.einsum("bij,bjk->bik", cz, rs)
        # panel columns (rows outside the pivot block): -C P^-1
        w = Cpx(w.re.at[:, :, lo:hi].set(-cs.re),
                w.im.at[:, :, lo:hi].set(-cs.im))
        # pivot rows: P^-1 R off-panel, P^-1 in the panel block
        row_new = Cpx(rs.re.at[:, :, lo:hi].set(pinv.re),
                      rs.im.at[:, :, lo:hi].set(pinv.im))
        w = Cpx(w.re.at[:, lo:hi, :].set(row_new.re),
                w.im.at[:, lo:hi, :].set(row_new.im))

    if npad != n:
        w = Cpx(w.re[:, :n, :n], w.im[:, :n, :n])
    return w
