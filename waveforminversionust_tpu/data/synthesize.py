"""Synthetic dataset generation — the framework's fixture factory.

TPU-native equivalent of the reference's data synthesizer (reference:
Lecture19_Fwi/SimulateData.m:1-63): forward-model a known phantom on a grid
*finer* than the inversion grid (avoiding the inverse crime; reference uses
0.3 mm vs the 0.8 mm inversion grid), with random complex per-element source
amplitudes (forcing the inversion to estimate source strengths; reference:
SimulateData.m:26), then record the wavefield at every element pixel.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AcquisitionConfig, SolverConfig
from ..models.acquisition import build_ring_acquisition
from ..models.grid import Grid2D
from ..ops.solve import solve_helmholtz


class RingDataset(NamedTuple):
    """The acquisition-data schema of the reference ``RecordedData.mat``
    (reference: SimulateData.m:62-63): grid coords, true speed map, element
    positions, frequency, and the (tx, rx) complex data matrix."""

    x: np.ndarray        # (nx,) grid x coords of the SIMULATION grid [m]
    y: np.ndarray        # (ny,)
    c: np.ndarray        # (ny, nx) true sound speed [m/s]
    x_circ: np.ndarray   # (num_elements,) element x [m]
    y_circ: np.ndarray   # (num_elements,) element y [m]
    f: float             # frequency [Hz]
    rec_data: np.ndarray  # (num_elements, num_elements) complex64, [tx, rx]


@partial(jax.jit, static_argnames=("grid", "solver"))
def _forward_record(vel, src, f, rx_y, rx_x, grid: Grid2D,
                    solver: SolverConfig, attenuation=None):
    from ..ops.cpx import Cpx
    u, _ = solve_helmholtz(vel, src, f, grid, solver, attenuation=attenuation)
    idx = (jnp.arange(src.shape[0])[:, None], rx_y[None, :], rx_x[None, :])
    # Return real/imag planes: complex64 outputs are not fetchable on all
    # TPU runtimes (see utils.host).
    if isinstance(u, Cpx):
        return u.re[idx], u.im[idx]
    rec = u[idx]
    return jnp.real(rec), jnp.imag(rec)


def synthesize_ring_dataset(vel, grid: Grid2D,
                            acquisition: AcquisitionConfig = AcquisitionConfig(),
                            f: float = 0.35e6,
                            solver: SolverConfig = SolverConfig(),
                            seed: int = 0,
                            random_amplitudes: bool = True,
                            x_elem=None, y_elem=None,
                            attenuation=None) -> RingDataset:
    """Simulate a full ring acquisition over a known speed map.

    Args:
        vel: (ny, nx) true sound-speed map on the (fine) simulation grid.
        grid: the simulation grid (use a finer spacing than the inversion
            grid — reference: SimulateData.m:8 vs FrequencyDomainFWI.m:49).
        f: transmit frequency [Hz] (reference: 350 kHz).
        random_amplitudes: give each element a random complex amplitude
            (reference: SimulateData.m:23-27).
        x_elem, y_elem: optional explicit element coordinates. Element
            positions are snapped to the nearest grid pixel on BOTH the
            synthesis and inversion grids; if those snaps disagree, the
            position error (up to half a coarse pixel) acts as strong
            coherent phase noise and single-frequency FWI degrades badly
            (measured: it can diverge in model space while still fitting
            data). Passing positions already snapped to the *inversion*
            grid (exactly representable on a 2x-finer synthesis grid)
            removes the mismatch. The reference snaps independently on each
            grid and silently absorbs this error (SimulateData.m:20 vs
            FrequencyDomainFWI.m:53-55).
    """
    acq = build_ring_acquisition(grid, dataclass_replace_tx_all(acquisition),
                                 x_elem=x_elem, y_elem=y_elem)
    rng = np.random.default_rng(seed)
    if random_amplitudes:
        amps = (rng.standard_normal(acq.num_tx)
                + 1j * rng.standard_normal(acq.num_tx)).astype(np.complex64)
    else:
        amps = np.ones(acq.num_tx, np.complex64)
    src_np = acq.source_fields(amplitudes=amps)
    if solver.split_complex:
        from ..ops import cpx
        src = cpx.of(src_np)
    else:
        src = jnp.asarray(src_np)

    if attenuation is not None:
        attenuation = jnp.asarray(attenuation, jnp.float32)
    re, im = _forward_record(jnp.asarray(vel, jnp.float32), src,
                             jnp.float32(f),
                             jnp.asarray(acq.y_idx), jnp.asarray(acq.x_idx),
                             grid, solver, attenuation)
    rec_data = (np.asarray(jax.device_get(re))
                + 1j * np.asarray(jax.device_get(im))).astype(np.complex64)

    return RingDataset(
        x=grid.x.astype(np.float64),
        y=grid.y.astype(np.float64),
        c=np.asarray(vel, np.float64),
        x_circ=acq.x_elem,
        y_circ=acq.y_elem,
        f=float(f),
        rec_data=rec_data,
    )


def add_complex_noise(rec_data, snr_db: float, seed: int = 0,
                      exclude_each_side: int = 0) -> np.ndarray:
    """Additive complex-Gaussian measurement noise at a stated SNR.

    The reference dataset is noise-free apart from the synthesizer's random
    per-element source amplitudes (reference: SimulateData.m:26); real UST
    acquisitions carry channel noise. The noise power is set against the
    mean power of the ADMITTED entries (outside the ±``exclude_each_side``
    ring band — the entries the inversion actually fits; the near-field
    band contains the huge self/neighbor amplitudes and would otherwise
    make the stated SNR meaningless for the masked misfit).

    Args:
        rec_data: (n, n) complex (tx, rx) matrix.
        snr_db: target signal-to-noise ratio in dB over the admitted
            entries: ``10*log10(mean|signal|^2 / mean|noise|^2)``.
        seed: numpy Generator seed (deterministic fixtures).

    Returns:
        A new complex64 matrix; the input is not modified.
    """
    from .qc import _pair_mask

    m = np.asarray(rec_data).astype(np.complex64)
    w = (_pair_mask(m.shape[0], exclude_each_side)
         if exclude_each_side else np.ones(m.shape, bool))
    sig_pow = float(np.mean(np.abs(m[w]) ** 2))
    noise_pow = sig_pow / (10.0 ** (snr_db / 10.0))
    rng = np.random.default_rng(seed)
    scale = np.sqrt(noise_pow / 2.0)
    noise = scale * (rng.standard_normal(m.shape)
                     + 1j * rng.standard_normal(m.shape))
    return (m + noise).astype(np.complex64)


def dataclass_replace_tx_all(acquisition: AcquisitionConfig) -> AcquisitionConfig:
    """Synthesis always transmits from every element (downsampling is an
    inversion-side choice; reference: SimulateData.m loops all elements) and
    records the FULL rx matrix, so the acceptance mask — an inversion-side
    concept — is dropped (it can otherwise reject small-element-count
    configurations that are perfectly fine to simulate)."""
    import dataclasses
    return dataclasses.replace(acquisition, tx_downsample=1,
                               num_excluded_each_side=0)
