"""Split-complex arithmetic: complex tensors as (real, imag) float32 pairs.

TPUs have no native complex registers, and the targeted TPU runtime
implements complex64 only for a handful of compute ops (fft, dot, inv,
elementwise) — every data-movement op on complex64 (pad, slice, diag,
concat, scatter, transpose) raises UNIMPLEMENTED, complex constants cannot
be materialized eagerly, and complex outputs cannot be fetched (all measured;
see .claude/skills/verify/SKILL.md). The framework therefore carries complex
data as a :class:`Cpx` pytree of two float32 planes, which makes every
structural op trivially supported and is the hardware-native layout anyway
(the Pallas kernels use exactly this representation).

Conventions:
  * ``Cpx`` is a NamedTuple pytree — it vmaps/shards/scans transparently.
  * Pointwise helpers mirror the complex algebra; anything purely
    structural (pad/slice/reshape/concat/where/gather/scatter) is applied
    to both planes via :func:`apply_parts`.
  * Scalars are Cpx of () arrays.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Cpx(NamedTuple):
    re: jnp.ndarray
    im: jnp.ndarray

    # -- arithmetic operators ------------------------------------------------
    def __add__(self, other):
        return add(self, other)

    def __sub__(self, other):
        return sub(self, other)

    def __mul__(self, other):
        return mul(self, other)

    def __rmul__(self, other):
        return mul(self, other)

    def __neg__(self):
        return Cpx(-self.re, -self.im)

    def __getitem__(self, idx):
        return Cpx(self.re[idx], self.im[idx])

    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    def conj(self) -> "Cpx":
        return Cpx(self.re, -self.im)

    def astype(self, dtype) -> "Cpx":
        return Cpx(self.re.astype(dtype), self.im.astype(dtype))


def _is_cpx(x) -> bool:
    return isinstance(x, Cpx)


def of(z) -> Cpx:
    """From a complex (or real) array-like; numpy complex splits on host."""
    if _is_cpx(z):
        return z
    if isinstance(z, np.ndarray) or np.isscalar(z):
        z = np.asarray(z)
        if np.iscomplexobj(z):
            return Cpx(jnp.asarray(z.real, jnp.float32),
                       jnp.asarray(z.imag, jnp.float32))
        return Cpx(jnp.asarray(z, jnp.float32),
                   jnp.zeros(np.shape(z), jnp.float32))
    z = jnp.asarray(z)
    if jnp.issubdtype(z.dtype, jnp.complexfloating):
        return Cpx(jnp.real(z).astype(jnp.float32),
                   jnp.imag(z).astype(jnp.float32))
    z = z.astype(jnp.float32)
    return Cpx(z, jnp.zeros_like(z))


def zeros(shape, dtype=jnp.float32) -> Cpx:
    return Cpx(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def full_like(x: Cpx, re=0.0, im=0.0) -> Cpx:
    return Cpx(jnp.full_like(x.re, re), jnp.full_like(x.im, im))


def to_numpy(x: Cpx) -> np.ndarray:
    """Fetch to a host complex array (two real transfers)."""
    return (np.asarray(jax.device_get(x.re))
            + 1j * np.asarray(jax.device_get(x.im)))


def to_native(x: Cpx):
    """To a native complex64 jnp array (CPU/GPU paths and tests only)."""
    return (x.re + 1j * x.im).astype(jnp.complex64)


# -- algebra ---------------------------------------------------------------

def add(a, b) -> Cpx:
    a, b = of(a), of(b)
    return Cpx(a.re + b.re, a.im + b.im)


def sub(a, b) -> Cpx:
    a, b = of(a), of(b)
    return Cpx(a.re - b.re, a.im - b.im)


def mul(a, b) -> Cpx:
    a, b = of(a), of(b)
    return Cpx(a.re * b.re - a.im * b.im, a.re * b.im + a.im * b.re)


def scale(a: Cpx, s) -> Cpx:
    """Multiply by a REAL scalar/array (cheaper than mul)."""
    return Cpx(a.re * s, a.im * s)


def div(a, b) -> Cpx:
    a, b = of(a), of(b)
    d = b.re * b.re + b.im * b.im
    return Cpx((a.re * b.re + a.im * b.im) / d,
               (a.im * b.re - a.re * b.im) / d)


def reciprocal(b: Cpx) -> Cpx:
    d = b.re * b.re + b.im * b.im
    return Cpx(b.re / d, -b.im / d)


def abs2(a: Cpx):
    return a.re * a.re + a.im * a.im


def absval(a: Cpx):
    return jnp.sqrt(abs2(a))


def exp(a: Cpx) -> Cpx:
    r = jnp.exp(a.re)
    return Cpx(r * jnp.cos(a.im), r * jnp.sin(a.im))


def sqrt(a: Cpx) -> Cpx:
    """Principal square root (branch cut on the negative real axis)."""
    m = absval(a)
    re = jnp.sqrt(jnp.maximum((m + a.re) / 2, 0.0))
    im_mag = jnp.sqrt(jnp.maximum((m - a.re) / 2, 0.0))
    return Cpx(re, jnp.where(a.im < 0, -im_mag, im_mag))


# -- structural ------------------------------------------------------------

def apply_parts(fn: Callable, *xs: Cpx) -> Cpx:
    """Apply a real->real structural function independently to both planes."""
    return Cpx(fn(*(x.re for x in xs)), fn(*(x.im for x in xs)))


def where(cond, a, b) -> Cpx:
    a, b = of(a), of(b)
    return Cpx(jnp.where(cond, a.re, b.re), jnp.where(cond, a.im, b.im))


def stack(xs, axis=0) -> Cpx:
    return Cpx(jnp.stack([x.re for x in xs], axis),
               jnp.stack([x.im for x in xs], axis))


def concat(xs, axis=0) -> Cpx:
    return Cpx(jnp.concatenate([x.re for x in xs], axis),
               jnp.concatenate([x.im for x in xs], axis))


def pad(x: Cpx, pads) -> Cpx:
    return apply_parts(lambda p: jnp.pad(p, pads), x)


def set_at(x: Cpx, idx, val: Cpx) -> Cpx:
    return Cpx(x.re.at[idx].set(val.re), x.im.at[idx].set(val.im))


# -- reductions & contractions ----------------------------------------------

def sum_(a: Cpx, axis=None) -> Cpx:
    return Cpx(jnp.sum(a.re, axis=axis), jnp.sum(a.im, axis=axis))


def vdot(a: Cpx, b: Cpx, axis=None) -> Cpx:
    """<a, b> = sum conj(a) * b."""
    return sum_(mul(a.conj(), b), axis=axis)


# TPU matmuls default to bf16 accumulation; the direct solver's sweeps need
# full f32 (measured: bf16 sweeps leave 1.8e-2 relative residual vs 3e-6 at
# f32, and f32 costs almost nothing extra in the latency-bound scan steps).
_PRECISION = jax.lax.Precision.HIGHEST


def einsum(spec: str, a, b) -> Cpx:
    """Complex einsum as four real einsums (MXU work, f32 accumulation)."""
    a, b = of(a), of(b)
    rr = jnp.einsum(spec, a.re, b.re, precision=_PRECISION)
    ii = jnp.einsum(spec, a.im, b.im, precision=_PRECISION)
    ri = jnp.einsum(spec, a.re, b.im, precision=_PRECISION)
    ir = jnp.einsum(spec, a.im, b.re, precision=_PRECISION)
    return Cpx(rr - ii, ri + ir)


def matmul(a, b) -> Cpx:
    a, b = of(a), of(b)
    mm = lambda x, y: jnp.matmul(x, y, precision=_PRECISION)
    return Cpx(mm(a.re, b.re) - mm(a.im, b.im),
               mm(a.re, b.im) + mm(a.im, b.re))


# -- dense linear algebra ----------------------------------------------------

def inv(a: Cpx, native: bool = True) -> Cpx:
    """Inverse of a complex (n, n) matrix.

    ``native=True`` (default) converts to complex64 at the boundary and uses
    the backend's complex LU — complex construction (re + i*im), inv, and
    real/imag extraction are all *compute* ops, which the targeted TPU
    runtime does implement, and the complex LU costs half the flops of the
    real 2n x 2n embedding (measured ~1.4x faster in the factorization scan).
    ``native=False`` keeps everything real via the [[X, -Y], [Y, X]]
    embedding, whose inverse is [[U, -V], [V, U]] with (X+iY)^-1 = U + iV.
    """
    if native:
        mi = jnp.linalg.inv(a.re.astype(jnp.complex64) + 1j * a.im.astype(jnp.complex64))
        return Cpx(jnp.real(mi).astype(a.re.dtype), jnp.imag(mi).astype(a.im.dtype))
    n = a.re.shape[-1]
    top = jnp.concatenate([a.re, -a.im], axis=-1)
    bot = jnp.concatenate([a.im, a.re], axis=-1)
    m = jnp.concatenate([top, bot], axis=-2)
    mi = jnp.linalg.inv(m)
    return Cpx(mi[..., :n, :n], mi[..., n:, :n])


def fft2(x: Cpx) -> Cpx:
    """2D FFT of split-complex data via two real-input FFTs.

    The complex intermediates are consumed immediately by real/imag
    extraction — the only complex ops this touches (fft, real, imag) are in
    the backend's implemented set.
    """
    fr = jnp.fft.fft2(x.re)
    fi = jnp.fft.fft2(x.im)
    return Cpx(jnp.real(fr) - jnp.imag(fi), jnp.imag(fr) + jnp.real(fi))


def ifft2(x: Cpx) -> Cpx:
    """IFFT via the conjugation identity: ifft(z) = conj(fft(conj(z)))/N."""
    n = x.re.shape[-1] * x.re.shape[-2]
    y = fft2(x.conj()).conj()
    return Cpx(y.re / n, y.im / n)
