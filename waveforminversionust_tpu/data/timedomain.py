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


# ---------------------------------------------------------------------------
# Time-domain ACQUISITION pipeline: broadband channel data -> FWI datasets.
#
# The reference stops at a forward demo from ONE element
# (TimeDomainSimulation.m) and inverts externally-prepared single-frequency
# data (RecordedData.mat). Real UST systems record broadband time traces for
# every transmit element; the functions below complete that workflow
# TPU-natively: synthesize full (tx, rx, t) channel data (scan over a
# frequency comb of batched multi-RHS Helmholtz solves + one MXU IDTFT
# matmul), then extract any inversion frequencies from the traces (a DFT
# quadrature) as the {frequency: RingDataset} mapping that
# fwi.runner.invert_dataset consumes for true multi-frequency continuation.
#
# Scale notes: extraction needs NO source-spectrum deconvolution for FWI —
# the objective's per-shot variable-projection source estimate
# (fwi/objective.py) absorbs any per-frequency complex scale, so the same
# pipeline applies to measured (real-valued) traces, where the one-sided
# DFT returns spectrum*REC/2.
# ---------------------------------------------------------------------------


class TimeDomainDataset(NamedTuple):
    """Broadband ring acquisition: complex analytic channel traces for every
    transmit element, plus the synthesis comb metadata (the time-domain
    analogue of :class:`~.synthesize.RingDataset`)."""

    x: np.ndarray        # (nx,) simulation-grid x coords [m]
    y: np.ndarray        # (ny,)
    c: np.ndarray        # (ny, nx) true sound speed [m/s]
    x_circ: np.ndarray   # (num_elements,) element x [m]
    y_circ: np.ndarray   # (num_elements,)
    freqs: np.ndarray    # (nf,) synthesis frequency comb [Hz]
    df: float            # comb spacing [Hz]
    spectrum: np.ndarray  # (nf,) transmit spectral weights
    times: np.ndarray    # (nt,) uniform over one comb period 1/df
    traces: np.ndarray   # (num_elements, num_elements, nt) complex64 [tx,rx,t]


@partial(jax.jit, static_argnames=("grid", "solver"))
def _sweep_record(vel, src, freqs, rx_y, rx_x, grid: Grid2D,
                  solver: SolverConfig):
    """Receiver data at every comb frequency: scan of batched multi-RHS
    solves; returns (nf, ntx, nrx) real/imag planes."""
    ntx = src.shape[0]
    idx = (jnp.arange(ntx)[:, None], rx_y[None, :], rx_x[None, :])

    def body(_, f):
        u, _info = solve_helmholtz(vel, src, f, grid, solver)
        if isinstance(u, Cpx):
            return None, (u.re[idx], u.im[idx])
        return None, (jnp.real(u[idx]), jnp.imag(u[idx]))

    _, (re, im) = jax.lax.scan(body, None, freqs)
    return re, im


@jax.jit
def _traces_from_comb(rec_re, rec_im, freqs, times, weights):
    """IDTFT of the weighted comb: traces[t] = sum_f w_f REC_f e^{+2 pi i f t}
    — one (nt, nf) x (nf, ntx*nrx) MXU matmul pair on split planes."""
    nf, ntx, nrx = rec_re.shape
    ph = 2 * jnp.pi * freqs[None, :] * times[:, None]          # (nt, nf)
    cw = jnp.cos(ph) * weights[None, :]
    sw = jnp.sin(ph) * weights[None, :]
    fr = rec_re.reshape(nf, ntx * nrx)
    fi = rec_im.reshape(nf, ntx * nrx)
    tr = cw @ fr - sw @ fi                                     # (nt, ntx*nrx)
    ti = cw @ fi + sw @ fr
    return (tr.reshape(-1, ntx, nrx), ti.reshape(-1, ntx, nrx))


def synthesize_time_domain_dataset(
        vel, grid: Grid2D,
        acquisition=None,
        f_low: float = 0.25e6, f_high: float = 0.45e6, df: float = 0.025e6,
        nt: int | None = None,
        solver: SolverConfig = SolverConfig(),
        seed: int = 0, random_amplitudes: bool = True,
        x_elem=None, y_elem=None) -> TimeDomainDataset:
    """Simulate broadband (tx, rx, t) channel data over a known speed map.

    Every element transmits (multi-RHS batch, like
    :func:`~.synthesize.synthesize_ring_dataset`); the Helmholtz equation is
    solved on the comb ``f_low..f_high`` step ``df`` (``lax.scan``), and the
    complex analytic traces come from one MXU IDTFT matmul with Hann spectral
    weighting (reference physics: TimeDomainSimulation.m:34-56, extended
    from 1 to all transmit elements).

    The time axis is the DFT grid of one comb period: ``t_k = k/(nt*df)``,
    ``k < nt`` — on it the comb lines are exactly orthogonal, so
    :func:`extract_frequency_data` recovers the per-frequency receiver
    matrices to round-off (``nt`` defaults to ``4*nf``, oversampled 4x for
    readable waveforms; any ``nt >= nf`` preserves exactness).

    Per-element random complex amplitudes (``random_amplitudes``) are shared
    across the band — a flat-spectrum element response; the Hann window is
    the transmit pulse spectrum.
    """
    from ..config import AcquisitionConfig
    from .synthesize import dataclass_replace_tx_all

    acquisition = acquisition if acquisition is not None else AcquisitionConfig()
    freqs = np.arange(f_low, f_high + df / 2, df)
    nf = len(freqs)
    if nt is None:
        nt = 4 * nf
    if nt < nf:
        raise ValueError(f"nt={nt} < nf={nf}: comb lines alias; extraction "
                         "would mix frequencies")
    times = np.arange(nt) / (nt * df)
    spectrum = hanning_window(nf)

    from ..models.acquisition import build_ring_acquisition
    acq = build_ring_acquisition(grid, dataclass_replace_tx_all(acquisition),
                                 x_elem=x_elem, y_elem=y_elem)
    rng = np.random.default_rng(seed)
    if random_amplitudes:
        amps = (rng.standard_normal(acq.num_tx)
                + 1j * rng.standard_normal(acq.num_tx)).astype(np.complex64)
    else:
        amps = np.ones(acq.num_tx, np.complex64)
    src_np = acq.source_fields(amplitudes=amps)
    src = cpx.of(src_np) if solver.split_complex else jnp.asarray(src_np)

    rec_re, rec_im = _sweep_record(
        jnp.asarray(vel, jnp.float32), src, jnp.asarray(freqs, jnp.float32),
        jnp.asarray(acq.y_idx), jnp.asarray(acq.x_idx), grid, solver)
    tr_re, tr_im = _traces_from_comb(
        rec_re, rec_im, jnp.asarray(freqs, jnp.float32),
        jnp.asarray(times, jnp.float32),
        jnp.asarray(spectrum * df, jnp.float32))
    traces = (np.asarray(jax.device_get(tr_re))
              + 1j * np.asarray(jax.device_get(tr_im))).astype(np.complex64)
    traces = np.moveaxis(traces, 0, -1)  # (ntx, nrx, nt)

    return TimeDomainDataset(
        x=grid.x.astype(np.float64), y=grid.y.astype(np.float64),
        c=np.asarray(vel, np.float64),
        x_circ=acq.x_elem, y_circ=acq.y_elem,
        freqs=freqs, df=float(df), spectrum=spectrum, times=times,
        traces=traces)


def extract_frequency_data(traces, times, freqs, df,
                           spectrum=None) -> np.ndarray:
    """Per-frequency receiver matrices from channel traces: the DFT
    quadrature ``REC_f = mean_t traces(t) e^{-2 pi i f t} / df``.

    On the synthesis DFT time grid this inverts :func:`_traces_from_comb`
    exactly for any comb line (orthogonality of the comb over one period);
    for measured traces it is the standard narrowband bin extraction. Pass
    the per-frequency transmit ``spectrum`` weights to divide them out, or
    leave ``None`` and let the FWI objective's per-shot source estimation
    absorb the scale (recommended for measured data, where the true
    spectrum is unknown). Host-side preprocessing of host-resident
    acquisition data (like data/matio.py), hence numpy.

    Args:
        traces: (..., nt) complex (or real — one-sided extraction of a real
            signal returns spectrum*REC/2, an FWI-irrelevant scale).
        times: (nt,) uniform sample times spanning one period 1/df.
        freqs: scalar or (nf_out,) frequencies to extract [Hz].
        df: comb spacing used in synthesis / frequency resolution [Hz].

    Returns:
        (nf_out, ...) complex64 receiver data, one leading entry per
        extracted frequency.
    """
    traces = np.asarray(traces)
    t = np.asarray(times, np.float64)
    f = np.atleast_1d(np.asarray(freqs, np.float64))
    kern = np.exp(-2j * np.pi * f[:, None] * t[None, :]) / (len(t) * df)
    rec = np.einsum("ft,...t->f...", kern, traces)
    if spectrum is not None:
        s = np.atleast_1d(np.asarray(spectrum, np.float64))
        rec /= s.reshape((-1,) + (1,) * (rec.ndim - 1))
    return rec.astype(np.complex64)


def direct_arrival_gate(td: TimeDomainDataset, c_ref: float = 1500.0,
                        pre: float = 3e-6, post: float = 8e-6,
                        taper: float = 2e-6) -> TimeDomainDataset:
    """Cosine-tapered time gate around the direct transmission arrival —
    the standard UST preprocessing that isolates the through-transmission
    energy from late reverberation/multiples before frequency extraction.

    For each (tx, rx) pair the arrival time is the straight-ray estimate
    ``|x_tx - x_rx| / c_ref``; the gate passes
    ``[t_arr - pre, t_arr + post]`` with half-cosine roll-offs of width
    ``taper`` on both sides. The comb-synthesized traces are periodic
    with period ``T = 1/df`` (the times axis spans exactly one period,
    ``TimeDomainDataset.times``), so the synthesis places an arrival at
    ``t_arr mod T`` — the gate is therefore built on the *circular* time
    offset ``((t - t_arr + T/2) mod T) - T/2``, which both wraps distant
    pairs (a 220 mm ring diameter at 1500 m/s is ~147 us, far past a
    40 us record) and wraps the window edges around t=0/T correctly.
    For measured (non-wrapped) traces with ``t_arr < T`` this reduces to
    the plain window. Gating multiplies the traces in time (a mild
    spectral convolution), so the extracted per-frequency data is no
    longer the exact ungated comb line — the per-shot source estimate in
    the FWI objective absorbs the resulting complex scale, same as the
    un-deconvolved spectrum.

    ``taper=0`` gives a hard rectangular gate. The full window
    (``pre + post + 2*taper``) must fit inside one period, else the
    circular gate would overlap itself — rejected with ``ValueError``.

    Host-side preprocessing of host-resident traces (numpy), like
    :func:`extract_frequency_data`. Returns a new dataset with gated
    traces; all metadata unchanged.
    """
    pos = np.stack([td.x_circ, td.y_circ], axis=1)           # (ne, 2)
    w = _circular_gate_window(pos, td.times, td.df, c_ref, pre, post, taper)
    return td._replace(traces=(td.traces * w).astype(td.traces.dtype))


def _circular_gate_window(pos, times, df, c_ref, pre, post, taper):
    """(ne, ne, nt) circular cosine-tapered gate weights around the
    straight-ray arrival between every element pair; dimension-generic
    over the position columns (shared by :func:`direct_arrival_gate` and
    the 3D :func:`.timedomain3d.direct_arrival_gate_3d`)."""
    if taper < 0 or pre < 0 or post < 0:
        raise ValueError("pre/post/taper must be non-negative")
    period = 1.0 / float(df)
    if pre + post + 2 * taper >= period:
        raise ValueError(
            f"gate window pre+post+2*taper = {pre + post + 2 * taper:.3g} s "
            f"does not fit in one comb period 1/df = {period:.3g} s")
    pos = np.asarray(pos, np.float64)
    dist = np.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    t_arr = (dist / c_ref)[..., None]                        # (ntx, nrx, 1)
    t = np.asarray(times)[None, None, :]
    # signed circular offset from the (wrapped) arrival, in [-T/2, T/2)
    d = np.mod(t - t_arr + 0.5 * period, period) - 0.5 * period
    d = d.astype(np.float32)
    if taper == 0.0:
        return ((d >= np.float32(-pre))
                & (d <= np.float32(post))).astype(np.float32)
    up = np.clip((d + np.float32(pre + taper)) / np.float32(taper),
                 np.float32(0), np.float32(1))
    dn = np.clip((np.float32(post + taper) - d) / np.float32(taper),
                 np.float32(0), np.float32(1))
    return ((0.5 * (1 - np.cos(np.pi * up)))
            * (0.5 * (1 - np.cos(np.pi * dn)))).astype(np.float32)


def timedomain_to_ring_datasets(td: TimeDomainDataset, freqs,
                                deconvolve: bool = True) -> dict:
    """Bridge to the inversion drivers: extract ``freqs`` from the traces and
    return the ``{frequency: RingDataset}`` mapping
    :func:`~..fwi.runner.invert_dataset` takes for multi-frequency
    continuation over true broadband recordings.

    ``deconvolve=True`` divides out the known synthesis spectrum at each
    extracted comb line (requested frequencies must sit on the comb;
    exact round trip). ``False`` leaves the spectral scale in the data —
    the measured-data regime, absorbed by source estimation.
    """
    from .synthesize import RingDataset

    freqs = np.atleast_1d(np.asarray(freqs, np.float64))
    spec = None
    if deconvolve:
        line = np.rint((freqs - td.freqs[0]) / td.df).astype(int)
        on_comb = (np.abs(freqs - (td.freqs[0] + line * td.df)) < td.df * 1e-3)
        if not (on_comb.all() and (line >= 0).all()
                and (line < len(td.freqs)).all()):
            raise ValueError(f"deconvolve=True needs comb frequencies "
                             f"{td.freqs[0]}..{td.freqs[-1]} step {td.df}; "
                             f"got {freqs}")
        spec = td.spectrum[line]
    rec = extract_frequency_data(td.traces, td.times, freqs, td.df, spec)
    return {float(f): RingDataset(x=td.x, y=td.y, c=td.c,
                                  x_circ=td.x_circ, y_circ=td.y_circ,
                                  f=float(f), rec_data=rec[i])
            for i, f in enumerate(freqs)}


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
