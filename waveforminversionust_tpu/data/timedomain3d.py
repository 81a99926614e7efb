"""3D broadband time-domain acquisition pipeline — beyond the reference.

Volumetric analog of :mod:`.timedomain`: simulate full-aperture (tx, rx, t)
channel traces for a cylindrical/hemispherical transducer array
(models/acquisition3d.py) by sweeping the 3D convergent-Born Helmholtz
solver (ops/born3d.py) over a frequency comb and synthesizing the complex
analytic traces with one MXU IDTFT matmul, then bridge them back to the
frequency domain for 3D FWI (:func:`timedomain_to_fwi_data_3d`) or into
3D travel-time tomography starting models
(fwi.traveltime3d.traveltime_init_3d).

The reference is strictly 2D and performs the broadband workflow
externally (SURVEY.md L5; reference physics: TimeDomainSimulation.m:34-56,
extended from 1 to all transmit elements and to volumes). The comb/IDTFT
machinery is shared verbatim with the 2D module — the time axis is the
DFT grid of one comb period, on which :func:`.timedomain.
extract_frequency_data` (dimension-agnostic) inverts the synthesis
exactly.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PMLConfig
from ..models.acquisition3d import build_acquisition3d, snap_to_grid3d
from ..models.grid3d import Grid3D
from ..ops.cpx import Cpx
from .timedomain import _traces_from_comb, extract_frequency_data, \
    hanning_window


class TimeDomainDataset3D(NamedTuple):
    """Broadband 3D acquisition: complex analytic channel traces for every
    transmit element of an arbitrary element cloud, plus the synthesis comb
    metadata (volumetric analogue of :class:`.timedomain.TimeDomainDataset`;
    traces are FULL aperture — acceptance masking happens downstream, like
    the reference's fwi_script.py:39-44 masking of the full REC matrix)."""

    c: np.ndarray           # (nz, ny, nx) true sound speed [m/s]
    positions: np.ndarray   # (n_elements, 3) requested element xyz [m]
    # (n_elements, 3) element xyz snapped to the synthesis grid — the
    # voxels the one-hot sources/receivers actually live at; ray-based
    # processing should use these (cf. timedomain.traveltime_init's
    # snap_to_dataset_grid rationale).
    positions_snapped: np.ndarray
    freqs: np.ndarray       # (nf,) synthesis frequency comb [Hz]
    df: float               # comb spacing [Hz]
    spectrum: np.ndarray    # (nf,) transmit spectral weights
    times: np.ndarray       # (nt,) uniform over one comb period 1/df
    traces: np.ndarray      # (n_elements, n_elements, nt) complex64 [tx,rx,t]


@partial(jax.jit, static_argnames=("grid", "pml", "solver3d", "iter_cap",
                                   "gmres_tol", "gmres_restart", "spectral"))
def _sweep_record_3d(vel, src, freqs, rx_idx, grid: Grid3D, pml: PMLConfig,
                     solver3d: str, iter_cap: int, gmres_tol: float,
                     gmres_restart: int, spectral: str, attenuation=None):
    """Receiver data at every comb frequency: ``lax.scan`` of batched
    multi-RHS 3D solves; returns (nf, ntx, nrx) real/imag planes."""
    from ..fwi.fwi3d import _make_solve_3d

    solve = _make_solve_3d(grid, pml, iter_cap, solver3d=solver3d,
                           gmres_tol=gmres_tol, gmres_restart=gmres_restart,
                           spectral=spectral)
    iz, iy, ix = rx_idx[:, 0], rx_idx[:, 1], rx_idx[:, 2]

    def body(_, f):
        u, _info = solve(vel, src, f, attenuation=attenuation)
        return None, (u.re[:, iz, iy, ix], u.im[:, iz, iy, ix])

    _, (re, im) = jax.lax.scan(body, None, freqs)
    return re, im


def synthesize_time_domain_dataset_3d(
        vel, grid: Grid3D, positions,
        f_low: float = 0.25e6, f_high: float = 0.45e6, df: float = 0.025e6,
        nt: int | None = None,
        solver3d: str = "gmres", iter_cap: int = 2000,
        gmres_tol: float = 1e-5, gmres_restart: int = 16,
        spectral: str = "auto",
        pml: PMLConfig = PMLConfig(a0=20.0, l_pml=12e-3),
        seed: int = 0, random_amplitudes: bool = True,
        attenuation=None) -> TimeDomainDataset3D:
    """Simulate broadband (tx, rx, t) channel data over a known 3D volume.

    Every element transmits (multi-RHS batch); the 3D Helmholtz equation
    is solved on the comb ``f_low..f_high`` step ``df`` (``lax.scan`` over
    the comb, Krylov-accelerated CBS per line by default — the measured
    3D hot-path accelerator, ROADMAP 21a), and the complex analytic traces
    come from one MXU IDTFT matmul with Hann spectral weighting. Time-axis
    exactness properties are identical to the 2D synthesizer (see
    :func:`.timedomain.synthesize_time_domain_dataset`): ``nt`` defaults
    to ``4 * nf`` and any ``nt >= nf`` keeps the comb lines orthogonal, so
    frequency extraction is exact to round-off.

    Per-element random complex amplitudes (``random_amplitudes``) are
    shared across the band — a flat-spectrum element response the FWI
    objective's per-shot source estimate absorbs downstream.

    Args:
        vel: (nz, ny, nx) true speed volume [m/s].
        positions: (n_elements, 3) element xyz [m] (e.g.
            models.acquisition3d.cylinder_positions / hemisphere_positions).
        solver3d: "gmres" (default) or "cbs" (plain Born fixed point).
        attenuation: optional (nz, ny, nx) alpha [Np/m] lossy medium.
    """
    pos = np.asarray(positions, np.float64)
    n = pos.shape[0]
    freqs = np.arange(f_low, f_high + df / 2, df)
    nf = len(freqs)
    if nt is None:
        nt = 4 * nf
    if nt < nf:
        raise ValueError(f"nt={nt} < nf={nf}: comb lines alias; extraction "
                         "would mix frequencies")
    times = np.arange(nt) / (nt * df)
    spectrum = hanning_window(nf)

    idx = np.asarray(snap_to_grid3d(grid, pos))          # (n, 3) iz, iy, ix
    pos_snap = np.stack([grid.x[idx[:, 2]], grid.y[idx[:, 1]],
                         grid.z[idx[:, 0]]], axis=1)

    rng = np.random.default_rng(seed)
    if random_amplitudes:
        amps = (rng.standard_normal(n)
                + 1j * rng.standard_normal(n)).astype(np.complex64)
    else:
        amps = np.ones(n, np.complex64)
    src_re = np.zeros((n,) + grid.shape, np.float32)
    src_im = np.zeros((n,) + grid.shape, np.float32)
    src_re[np.arange(n), idx[:, 0], idx[:, 1], idx[:, 2]] = amps.real
    src_im[np.arange(n), idx[:, 0], idx[:, 1], idx[:, 2]] = amps.imag
    src = Cpx(jnp.asarray(src_re), jnp.asarray(src_im))

    rec_re, rec_im = _sweep_record_3d(
        jnp.asarray(vel, jnp.float32), src, jnp.asarray(freqs, jnp.float32),
        jnp.asarray(idx, jnp.int32), grid, pml, str(solver3d), int(iter_cap),
        float(gmres_tol), int(gmres_restart), str(spectral),
        attenuation=(None if attenuation is None
                     else jnp.asarray(attenuation, jnp.float32)))
    tr_re, tr_im = _traces_from_comb(
        rec_re, rec_im, jnp.asarray(freqs, jnp.float32),
        jnp.asarray(times, jnp.float32),
        jnp.asarray(spectrum * df, jnp.float32))
    traces = (np.asarray(jax.device_get(tr_re))
              + 1j * np.asarray(jax.device_get(tr_im))).astype(np.complex64)
    traces = np.moveaxis(traces, 0, -1)                  # (ntx, nrx, nt)

    return TimeDomainDataset3D(
        c=np.asarray(vel, np.float64), positions=pos,
        positions_snapped=pos_snap, freqs=freqs, df=float(df),
        spectrum=spectrum, times=times, traces=traces)


def direct_arrival_gate_3d(td: TimeDomainDataset3D, c_ref: float = 1500.0,
                           pre: float = 3e-6, post: float = 8e-6,
                           taper: float = 2e-6) -> TimeDomainDataset3D:
    """Cosine-tapered time gate around the direct transmission arrival —
    the 3D analogue of :func:`.timedomain.direct_arrival_gate` (same
    circular-window semantics; see there). Arrival estimates use the
    SNAPPED element positions, where the synthesized physics lives."""
    from .timedomain import _circular_gate_window

    w = _circular_gate_window(td.positions_snapped, td.times, td.df,
                              c_ref, pre, post, taper)
    return td._replace(traces=(td.traces * w).astype(td.traces.dtype))


def timedomain_to_fwi_data_3d(td: TimeDomainDataset3D, freqs, grid: Grid3D,
                              min_angle: float = 0.5,
                              attenuation=None, deconvolve: bool = False):
    """Bridge broadband 3D channel data to per-frequency FWI datasets.

    Extracts the requested frequencies from the traces (exact on the comb,
    standard narrowband bins otherwise), applies the angular acceptance
    mask, and packs :class:`~..fwi.fwi3d.FWIData3D` gathers — the 3D
    analogue of :func:`.timedomain.timedomain_to_ring_datasets` feeding
    multi-frequency continuation through ``nonlinear_cg_3d`` /
    ``run_gauss_newton_3d``.

    ``deconvolve=True`` divides out the known synthesis spectrum; the
    default leaves the per-frequency transmit scale to the FWI objective's
    per-shot source estimation (recommended, and required for measured
    data — same rationale as the 2D bridge).

    Returns:
        (acq: Acquisition3D, datasets: list[FWIData3D]) — one dataset per
        requested frequency, all sharing ``acq``.
    """
    from ..fwi.fwi3d import build_fwi_data_3d

    f = np.atleast_1d(np.asarray(freqs, np.float64))
    spec = None
    if deconvolve:
        comb = np.asarray(td.freqs, np.float64)
        pick = np.argmin(np.abs(comb[None, :] - f[:, None]), axis=1)
        if not np.allclose(comb[pick], f, rtol=0, atol=td.df * 1e-3):
            raise ValueError("deconvolve=True needs frequencies on the "
                             "synthesis comb (known spectrum)")
        spec = np.asarray(td.spectrum, np.float64)[pick]
    rec = extract_frequency_data(td.traces, td.times, f, td.df,
                                 spectrum=spec)           # (nf, ntx, nrx)

    acq = build_acquisition3d(grid, td.positions, min_angle=min_angle)
    tx = np.arange(acq.n_elements)[:, None]
    rx_elem = np.asarray(acq.rx_elem)
    datasets = []
    for i, fi in enumerate(f):
        g = rec[i][tx, rx_elem]
        # Normalize each gather to unit RMS: the absolute scale is
        # physically meaningless downstream (per-shot source estimation
        # absorbs it) but one-hot-source traces at small volumes sit at
        # ~1e-8, whose SQUARED misfit/step formulas underflow f32 into
        # denormals (the measured pitfall in PERF_NOTES "Krylov 3D"; same
        # rescale gmres_cpx applies internally).
        rms = np.sqrt(np.mean(np.abs(g) ** 2))
        if rms > 0:
            g = g / rms
        # Split complex on the HOST: device-putting a complex64 array is
        # UNIMPLEMENTED on the targeted TPU runtime (verify-skill gotcha
        # 3b; ops/cpx.py docstring).
        g = Cpx(jnp.asarray(g.real.astype(np.float32)),
                jnp.asarray(g.imag.astype(np.float32)))
        d = build_fwi_data_3d(acq, g, float(fi), grid,
                              attenuation=attenuation)
        # Scale the one-hot transmit sources so simulated fields also sit
        # in f32 normal range (unscaled: ~1e-8-class wavefields whose
        # squared products denormal-underflow the autodiff L-BFGS paths —
        # the same pitfall). Source estimation absorbs the arbitrary
        # factor; with it off, the normalized gathers carry no physical
        # scale anyway.
        from ..ops import cpx as _cpx
        d = d._replace(src=_cpx.scale(d.src, 1e6))
        datasets.append(d)
    return acq, datasets
