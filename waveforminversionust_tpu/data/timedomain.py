"""Multi-frequency sweep and time-domain wavefield synthesis.

TPU-native equivalent of the reference's forward-physics demo (reference:
Lecture19_Fwi/TimeDomainSimulation.m:1-91): solve the Helmholtz equation at a
band of frequencies, weight by a spectral window, and synthesize time-domain
wavefields by an inverse discrete-time Fourier transform.

TPU mapping: the reference's serial frequency loop
(TimeDomainSimulation.m:41-46) becomes a ``lax.scan`` (or a sharded map over
a mesh 'freq' axis); the inverse DTFT (TimeDomainSimulation.m:53-56) is a
dense (nt, nf) x (nf, ny*nx) matmul — exactly MXU-shaped work.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SolverConfig
from ..models.grid import Grid2D
from ..ops import cpx
from ..ops.cpx import Cpx
from ..ops.solve import solve_helmholtz


def hanning_window(n: int) -> np.ndarray:
    """MATLAB-style symmetric Hann window without zero endpoints:
    w[k] = 0.5 (1 - cos(2 pi k/(n+1))), k = 1..n (reference:
    TimeDomainSimulation.m:34 uses hanning(numel(f)))."""
    k = np.arange(1, n + 1)
    return 0.5 * (1 - np.cos(2 * np.pi * k / (n + 1)))


def frequency_sweep(vel, src, freqs, grid: Grid2D,
                    solver: SolverConfig = SolverConfig()):
    """Solve the Helmholtz equation at each frequency (single source field).

    Args:
        vel: (ny, nx) speed map.
        src: (ny, nx) complex source field (one transmit element;
            reference: TimeDomainSimulation.m:39 'elmt').
        freqs: (nf,) frequencies [Hz].

    Returns:
        (nf, ny, nx) complex64 wavefields.

    Sequential scan over frequencies (each needs its own operator/
    factorization); shard ``freqs`` over a mesh 'freq' axis for pod-scale
    sweeps.
    """
    vel = jnp.asarray(vel, jnp.float32)
    if solver.split_complex:
        # Split on the host: complex arrays entering jit as arguments are a
        # liability on TPU runtimes with partial complex64 support.
        s0 = cpx.of(np.asarray(src)) if not isinstance(src, Cpx) else src
        src_b = Cpx(s0.re[None], s0.im[None])
    else:
        src_b = jnp.asarray(src, jnp.complex64)[None]
    return _frequency_sweep_jit(vel, src_b, jnp.asarray(freqs, jnp.float32),
                                grid, solver)


@partial(jax.jit, static_argnames=("grid", "solver"))
def _frequency_sweep_jit(vel, src_b, freqs, grid, solver):
    def body(_, f):
        u, _info = solve_helmholtz(vel, src_b, f, grid, solver)
        return None, u[0]

    _, fields = jax.lax.scan(body, None, freqs)
    return fields


def inverse_dtft_matrix(freqs, times, df) -> jnp.ndarray:
    """IDTFT synthesis matrix exp(+i 2 pi f t) df of shape (nt, nf)
    (reference: TimeDomainSimulation.m:54)."""
    f = jnp.asarray(freqs, jnp.float32)
    t = jnp.asarray(times, jnp.float32)
    return (jnp.exp(2j * jnp.pi * f[None, :] * t[:, None]) * df).astype(jnp.complex64)


@jax.jit
def synthesize_time_fields(fields_f, freqs, times, df, spectrum):
    """Time-domain wavefields from frequency-domain solves.

    wv_t[t] = sum_f exp(i 2 pi f t) df * spectrum[f] * wv_f[f] — one dense
    (nt, nf) @ (nf, ny*nx) complex matmul (reference:
    TimeDomainSimulation.m:53-56 pagemtimes). Polymorphic over complex64 /
    split-complex fields; returns the same representation.
    """
    if isinstance(fields_f, Cpx):
        nf, ny, nx = fields_f.shape
        idtft = inverse_dtft_matrix_cpx(freqs, times, df)
        w = jnp.asarray(spectrum, jnp.float32)[:, None, None]
        weighted = cpx.scale(fields_f, w)
        flat = cpx.apply_parts(lambda p: p.reshape(nf, ny * nx), weighted)
        out = cpx.matmul(idtft, flat)
        return cpx.apply_parts(lambda p: p.reshape(-1, ny, nx), out)
    nf, ny, nx = fields_f.shape
    idtft = inverse_dtft_matrix(freqs, times, df)
    weighted = fields_f * jnp.asarray(spectrum, jnp.complex64)[:, None, None]
    out = idtft @ weighted.reshape(nf, ny * nx)
    return out.reshape(-1, ny, nx)


def inverse_dtft_matrix_cpx(freqs, times, df) -> Cpx:
    f = jnp.asarray(freqs, jnp.float32)
    t = jnp.asarray(times, jnp.float32)
    ph = 2 * jnp.pi * f[None, :] * t[:, None]
    return Cpx(jnp.cos(ph) * df, jnp.sin(ph) * df)


class TimeDomainResult(NamedTuple):
    times: np.ndarray           # (nt,)
    freqs: np.ndarray           # (nf,)
    wavefields_t: jnp.ndarray   # (nt, ny, nx) complex64 (device)
    channel_data: np.ndarray    # (nt, num_elements) complex


def simulate_time_domain(vel, grid: Grid2D, element_idx: int = 64,
                         f_low: float = 0.1e6, f_high: float = 0.5e6,
                         df: float = 0.005e6, nt: int = 501,
                         num_elements: int = 256, radius: float = 110e-3,
                         c_ref: float = 1500.0,
                         solver: SolverConfig = SolverConfig()) -> TimeDomainResult:
    """Full time-domain demo matching the reference defaults
    (reference: TimeDomainSimulation.m:8-56): 0.1-0.5 MHz in 5 kHz steps,
    Hann spectral weighting, time axis [0, 2*xmax/c_ref], transmit from one
    ring element, channel data recorded at all elements.
    """
    from ..models.acquisition import ring_positions, snap_to_grid

    freqs = np.arange(f_low, f_high + df / 2, df)
    xmax = max(abs(grid.extent[0]), abs(grid.extent[1]))
    times = np.linspace(0.0, 2 * xmax / c_ref, nt)
    window = hanning_window(len(freqs))

    xe, ye = ring_positions(num_elements, radius)
    x_idx, y_idx = snap_to_grid(grid, xe, ye)
    src = np.zeros(grid.shape, np.complex64)
    src[y_idx[element_idx], x_idx[element_idx]] = 1.0

    fields_f = frequency_sweep(vel, src, freqs, grid, solver)
    fields_t = synthesize_time_fields(fields_f, freqs, times, df, window)

    # channel data: sample at all element pixels over time. The gather runs
    # jitted (eager gathers are unreliable on the targeted TPU runtime) and
    # returns real planes only.
    yj = np.asarray(y_idx)  # numpy: jit embeds host constants directly
    xj = np.asarray(x_idx)
    if isinstance(fields_t, Cpx):
        gre, gim = jax.jit(lambda ft: (ft.re[:, yj, xj], ft.im[:, yj, xj]))(fields_t)
    else:
        gre, gim = jax.jit(
            lambda ft: (jnp.real(ft)[:, yj, xj], jnp.imag(ft)[:, yj, xj]))(fields_t)
    channel = (np.asarray(jax.device_get(gre))
               + 1j * np.asarray(jax.device_get(gim)))
    return TimeDomainResult(times=times, freqs=freqs, wavefields_t=fields_t,
                            channel_data=channel)
