"""FWI data objects and objective pieces: receiver sampling, source-strength
estimation, adjoint sources, and the masked L2 misfit.

Replaces the reference's Fortran-order gather/scatter machinery
(reference: nonlinearcg.py:79-116, 215-254; FrequencyDomainFWI.m:82-108) with
plain row-major integer gathers: receiver (tx, j) reads pixel
(rx_y[tx, j], rx_x[tx, j]) — correct on any grid shape.

All arrays here are masked to the *active* receivers only (ntx, n_active).
The reference materializes (ntx, num_elements) arrays with zeros at excluded
receivers; every inner product it takes is unchanged by dropping those zero
entries, so the masked form is exactly equivalent and 25% smaller.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..models.acquisition import RingAcquisition
from ..ops import cpx
from ..ops.cpx import Cpx


class FWIData(NamedTuple):
    """Device-resident inversion inputs (a pytree; safe to close over jit).

    Attributes:
        src: (ntx, ny, nx) transmit source fields — complex64, or a
            :class:`~..ops.cpx.Cpx` float-pair in split mode.
        rec_obs: (ntx, n_active) observed data (complex64 or Cpx), masked to
            the acceptance angle (gathered from the (ntx, num_elements)
            recorded matrix once at setup).
        rx_y, rx_x: (ntx, n_active) int32 receiver pixel indices
            ((ntx, n_active, 4) corner stencils in bilinear mode).
        f: scalar frequency [Hz].
    """

    src: jnp.ndarray
    rec_obs: jnp.ndarray
    rx_y: jnp.ndarray
    rx_x: jnp.ndarray
    f: jnp.ndarray
    # Bilinear receiver stencils: when set, rx_y/rx_x are (ntx, n_active, 4)
    # corner indices and rx_w the matching real weights (see
    # AcquisitionConfig.interpolation). None for nearest-pixel sampling.
    rx_w: jnp.ndarray | None = None
    # Known attenuation map alpha [Np/m] of the medium, or None (lossless —
    # the reference's only mode). Velocity is inverted IN this medium; alpha
    # itself is held fixed (see optimizers.make_cg_step).
    attenuation: jnp.ndarray | None = None


def build_fwi_data(acq: RingAcquisition, rec_data: np.ndarray, f,
                   split: bool = False, attenuation=None) -> FWIData:
    """Assemble FWIData from an acquisition and a recorded (ntx_total, num_elements)
    data matrix indexed [tx, rx] (reference layout: SimulateData.m:55-59).

    ``split=True`` stores the complex arrays as :class:`~..ops.cpx.Cpx`
    float-pair pytrees (required on TPU runtimes without full complex64
    support); every function below is polymorphic over both forms.
    """
    rec_data = np.asarray(rec_data)
    if rec_data.shape[0] == acq.num_tx:
        rec_rows = rec_data  # already downselected to tx_include rows
    else:
        assert rec_data.shape[0] == acq.num_elements, rec_data.shape
        rec_rows = rec_data[acq.tx_include]  # reference: fwi_script.py:36
    rec = np.take_along_axis(rec_rows, acq.rx_indices, axis=1)
    src_np = acq.source_fields()
    if split:
        src = cpx.of(src_np)
        rec_d = cpx.of(rec.astype(np.complex64))
    else:
        src = jnp.asarray(src_np, jnp.complex64)
        rec_d = jnp.asarray(rec, jnp.complex64)
    if acq.rx_w4 is not None:
        rx_y = jnp.asarray(acq.rx_y4, jnp.int32)
        rx_x = jnp.asarray(acq.rx_x4, jnp.int32)
        rx_w = jnp.asarray(acq.rx_w4, jnp.float32)
    else:
        rx_y = jnp.asarray(acq.rx_y, jnp.int32)
        rx_x = jnp.asarray(acq.rx_x, jnp.int32)
        rx_w = None
    return FWIData(
        src=src,
        rec_obs=rec_d,
        rx_y=rx_y,
        rx_x=rx_x,
        f=jnp.asarray(f, jnp.float32),
        attenuation=(None if attenuation is None
                     else jnp.asarray(attenuation, jnp.float32)),
        rx_w=rx_w,
    )


def sample_receivers(fields, rx_y, rx_x, rx_w=None):
    """Gather wavefields at receiver pixels: (ntx, ny, nx) -> (ntx, n_active).

    With bilinear stencils (rx_w given; rx_y/rx_x of shape (ntx, n, 4)) the
    receiver value is the weighted sum over the 4 enclosing pixels.
    """
    ntx = fields.shape[0]
    if rx_w is None:
        idx = (jnp.arange(ntx)[:, None], rx_y, rx_x)
        return fields[idx]
    idx = (jnp.arange(ntx)[:, None, None], rx_y, rx_x)
    if isinstance(fields, Cpx):
        corners = fields[idx]  # (ntx, n, 4)
        return Cpx((corners.re * rx_w).sum(-1), (corners.im * rx_w).sum(-1))
    return (fields[idx] * rx_w).sum(-1)


def scatter_to_fields(values, rx_y, rx_x, shape, rx_w=None):
    """Scatter (ntx, n_active) values onto (ntx, ny, nx) zero fields — the
    adjoint-source builder (reference: nonlinearcg.py:108-116).

    With bilinear stencils, each value is scatter-ADDED to its 4 corners
    with the sampling weights (the exact adjoint of bilinear sampling).
    """
    ntx = values.shape[0]
    if rx_w is None:
        idx = (jnp.arange(ntx)[:, None], rx_y, rx_x)
        if isinstance(values, Cpx):
            zero = cpx.zeros((ntx,) + tuple(shape))
            return cpx.set_at(zero, idx, values)
        out = jnp.zeros((ntx,) + tuple(shape), values.dtype)
        return out.at[idx].set(values)
    idx = (jnp.arange(ntx)[:, None, None], rx_y, rx_x)
    if isinstance(values, Cpx):
        zero = cpx.zeros((ntx,) + tuple(shape))
        return Cpx(zero.re.at[idx].add(values.re[..., None] * rx_w),
                   zero.im.at[idx].add(values.im[..., None] * rx_w))
    out = jnp.zeros((ntx,) + tuple(shape), values.dtype)
    return out.at[idx].add(values[..., None] * rx_w.astype(values.dtype))


def estimate_source_strengths(rec_sim, rec_obs):
    """Per-transmitter complex least-squares source scale
    <u_sim, d>/<u_sim, u_sim> (reference: nonlinearcg.py:14-20,
    FrequencyDomainFWI.m:82-93). Handles the unknown per-element complex
    amplitude the synthesizer injects (reference: SimulateData.m:26)."""
    if isinstance(rec_sim, Cpx):
        num = cpx.vdot(rec_sim, rec_obs, axis=1)
        den = jnp.maximum(cpx.abs2(rec_sim).sum(axis=1), 1e-38)
        return Cpx(num.re / den, num.im / den)
    num = jnp.sum(jnp.conj(rec_sim) * rec_obs, axis=1)
    den = jnp.sum(jnp.conj(rec_sim) * rec_sim, axis=1)
    return num / jnp.where(den == 0, 1, den)


def misfit(rec_sim, rec_obs):
    """0.5 sum |u_sim - d|^2 over active receivers
    (reference: fwi_loss_function.py:102)."""
    d = rec_sim - rec_obs
    if isinstance(d, Cpx):
        return 0.5 * jnp.sum(cpx.abs2(d))
    return 0.5 * jnp.sum(jnp.real(jnp.conj(d) * d))


def illumination_map(wavefields):
    """Source-illumination map ``sum_tx |u_tx|^2`` over the (ntx, ny, nx)
    forward wavefields — the diagonal of the Gauss-Newton pseudo-Hessian up
    to the receiver-side Green's-function factor. Used to precondition the
    adjoint-state gradient (``FWIConfig.precondition="illumination"``); the
    reference has no preconditioning (its gradient is the raw correlation,
    nonlinearcg.py:126-127)."""
    if isinstance(wavefields, Cpx):
        return jnp.sum(wavefields.re * wavefields.re
                       + wavefields.im * wavefields.im, axis=0)
    return jnp.sum(jnp.real(jnp.conj(wavefields) * wavefields), axis=0)


def precondition_gradient(grad, illum, eps_frac):
    """Divide the gradient by the illumination map, floored at ``eps_frac``
    of its maximum (the standard stabilized diagonal-Hessian scaling).
    Scale-invariant downstream: every step-size formula is homogeneous of
    degree 0 in the search-direction scale."""
    return grad / (illum + eps_frac * jnp.max(illum))


def mass_spread(fields, d, e):
    """The optimal 9-point scheme's MASS-distribution stencil
    ``W = {center: 1-d-e, edges: d/4, corners: e/4}`` applied as a symmetric
    9-point correlation over the trailing (ny, nx) axes.

    The discrete operator carries ``C k^2`` on all nine stencil legs
    (stencil.helmholtz_coefficients: the ``(1-d-e)``/``d/4``/``e/4``
    factors), so the EXACT discrete Frechet derivative dH/dslowness spreads
    the virtual source over the stencil with these weights. The classical
    adjoint-state formula — the reference's published gradient
    (nonlinearcg.py:118-127 / FrequencyDomainFWI.m:110-117) and our CG loop
    (kept for trajectory parity) — lumps it at the center (W = identity):
    an eps-independent ~7% FD mismatch at 350 kHz/0.8 mm (measured,
    tests/test_newton.py). W is symmetric, so it is its own adjoint."""
    wc, wd, we = 1.0 - d - e, d / 4.0, e / 4.0

    def spread(p):
        pp = jnp.pad(p, ((0, 0), (1, 1), (1, 1)))
        c = pp[:, 1:-1, 1:-1]
        edges = (pp[:, 1:-1, :-2] + pp[:, 1:-1, 2:]
                 + pp[:, :-2, 1:-1] + pp[:, 2:, 1:-1])
        corners = (pp[:, :-2, :-2] + pp[:, :-2, 2:]
                   + pp[:, 2:, :-2] + pp[:, 2:, 2:])
        return wc * c + wd * edges + we * corners

    if isinstance(fields, Cpx):
        return cpx.apply_parts(spread, fields)
    return spread(fields)


def virtual_source(slowness, wavefields, f, alpha_signed=None):
    """VIRT = dk^2/d(slowness) * u — the dH/d(slowness) action on u
    (reference: nonlinearcg.py:120, FrequencyDomainFWI.m:110-111).

    Lossless: k^2 = omega^2 slow^2, so VIRT = 2 omega^2 slow * u. With a
    fixed attenuation map (k = omega*slow + i*sgn*alpha), the exact Frechet
    factor gains an imaginary part: dk^2/dslow = 2 omega (omega slow +
    i*sgn*alpha). ``alpha_signed`` is sgn*alpha (the caller applies the PML
    sign convention; see optimizers.make_cg_step)."""
    omega = 2 * jnp.pi * f
    fr = (2 * omega ** 2 * slowness)[None]
    if alpha_signed is None:
        if isinstance(wavefields, Cpx):
            return cpx.scale(wavefields, fr)
        return fr.astype(jnp.complex64) * wavefields
    fi = (2 * omega * alpha_signed)[None]
    if isinstance(wavefields, Cpx):
        return cpx.mul(wavefields, Cpx(jnp.broadcast_to(fr, wavefields.shape),
                                       jnp.broadcast_to(fi, wavefields.shape)))
    return (fr + 1j * fi).astype(jnp.complex64) * wavefields
