"""3D broadband time-domain pipeline: synthesis, frequency extraction,
FWI bridge, travel-time starting model (data/timedomain3d.py,
fwi/traveltime3d.py::traveltime_init_3d).

The reference is strictly 2D; these mirror tests/test_timedomain.py's
exactness and end-to-end structure volumetrically at tiny sizes."""

import jax.numpy as jnp
import numpy as np
import pytest

from waveforminversionust_tpu.config import FWIConfig, PMLConfig
from waveforminversionust_tpu.data.timedomain import extract_frequency_data
from waveforminversionust_tpu.data.timedomain3d import (
    synthesize_time_domain_dataset_3d, timedomain_to_fwi_data_3d)
from waveforminversionust_tpu.fwi.fwi3d import nonlinear_cg_3d
from waveforminversionust_tpu.fwi.traveltime3d import traveltime_init_3d
from waveforminversionust_tpu.models.acquisition3d import cylinder_positions
from waveforminversionust_tpu.models.grid3d import Grid3D
from waveforminversionust_tpu.ops.born3d import born_gmres_solve_3d
from waveforminversionust_tpu.ops.cpx import Cpx

GRID = Grid3D.centered(12e-3, 1.0e-3)                  # 25^3, tiny
POS = cylinder_positions(2, 8, 8e-3, 6e-3)             # 16 elements
KW = dict(f_low=0.2e6, f_high=0.3e6, df=0.05e6, seed=3)  # 3-line comb
PML = PMLConfig(a0=20.0, l_pml=12e-3)


def _blob_vel(grid, dv=60.0, center=(0.0, 2e-3, 1e-3), r=3.5e-3):
    Z, Y, X = grid.meshgrid()
    d2 = ((X - center[2]) ** 2 + (Y - center[1]) ** 2
          + (Z - center[0]) ** 2)
    return (1500.0 + dv * np.exp(-d2 / (2 * (r / 2) ** 2))).astype(np.float32)


@pytest.fixture(scope="module")
def td3():
    return synthesize_time_domain_dataset_3d(_blob_vel(GRID), GRID, POS, **KW)


def test_extraction_inverts_synthesis_exactly(td3):
    """On the comb's orthogonal DFT time grid, narrowband extraction of a
    comb line reproduces the monochromatic receiver matrix of a direct
    solve (up to the known spectrum weight, divided out)."""
    k = 1                                              # middle comb line
    rec = extract_frequency_data(td3.traces, td3.times, td3.freqs[k],
                                 td3.df, spectrum=td3.spectrum[k])[0]

    # Direct monochromatic solve with the SAME (random-amplitude) sources.
    idx = np.stack([
        np.argmin(np.abs(GRID.z[:, None] - td3.positions_snapped[:, 2]),
                  axis=0),
        np.argmin(np.abs(GRID.y[:, None] - td3.positions_snapped[:, 1]),
                  axis=0),
        np.argmin(np.abs(GRID.x[:, None] - td3.positions_snapped[:, 0]),
                  axis=0)], axis=1)
    rng = np.random.default_rng(KW["seed"])
    n = len(POS)
    amps = (rng.standard_normal(n)
            + 1j * rng.standard_normal(n)).astype(np.complex64)
    sre = np.zeros((n,) + GRID.shape, np.float32)
    sim = np.zeros((n,) + GRID.shape, np.float32)
    sre[np.arange(n), idx[:, 0], idx[:, 1], idx[:, 2]] = amps.real
    sim[np.arange(n), idx[:, 0], idx[:, 1], idx[:, 2]] = amps.imag
    u, _ = born_gmres_solve_3d(jnp.asarray(_blob_vel(GRID)),
                               Cpx(jnp.asarray(sre), jnp.asarray(sim)),
                               float(td3.freqs[k]), GRID, pml=PML, tol=1e-5)
    direct = (np.asarray(u.re)
              + 1j * np.asarray(u.im))[:, idx[:, 0], idx[:, 1], idx[:, 2]]
    np.testing.assert_allclose(rec, direct,
                               atol=5e-4 * np.abs(direct).max())


def test_fwi_bridge_shapes_and_descent(td3):
    """timedomain_to_fwi_data_3d packs masked gathers whose FWI misfit
    decreases from a homogeneous start (source estimation absorbs the
    un-deconvolved transmit spectrum)."""
    acq, datasets = timedomain_to_fwi_data_3d(
        td3, [td3.freqs[1]], GRID, min_angle=0.8)
    (data,) = datasets
    n_active = acq.rx_idx.shape[1]
    assert data.rec_obs.re.shape == (acq.n_elements, n_active)
    assert np.asarray(acq.rx_elem).shape == (acq.n_elements, n_active)

    vel0 = jnp.full(GRID.shape, 1500.0, jnp.float32)
    _vel, metrics = nonlinear_cg_3d(vel0, data, GRID, FWIConfig(),
                                    num_iterations=2, pml=PML)
    loss = np.asarray(metrics.loss)
    assert np.all(np.isfinite(loss))
    assert loss[-1] < loss[0]


def test_invert_dataset_3d_continuation(td3):
    """The turnkey 3D driver: two warm-started stages over the comb, loss
    finite and decreasing within each stage; schedule validation raises."""
    from waveforminversionust_tpu.config import ContinuationConfig
    from waveforminversionust_tpu.fwi.runner3d import invert_dataset_3d

    freqs = (float(td3.freqs[0]), float(td3.freqs[2]))
    _, datasets = timedomain_to_fwi_data_3d(td3, freqs, GRID, min_angle=0.8)
    calls = []
    res = invert_dataset_3d(
        datasets, GRID, FWIConfig(),
        continuation=ContinuationConfig(frequencies=freqs,
                                        iterations_per_frequency=2),
        pml=PML, solver3d="cbs", iter_cap=400,
        callback=lambda i, f, v, m: calls.append((i, f)))
    assert res.frequencies == freqs
    assert res.velocity.shape == GRID.shape
    loss = res.metrics["loss"]
    assert loss.shape == (4,) and np.all(np.isfinite(loss))
    assert loss[1] < loss[0]                      # stage-1 descent
    np.testing.assert_array_equal(res.metrics["frequency"],
                                  [freqs[0]] * 2 + [freqs[1]] * 2)
    assert calls == [(0, freqs[0]), (1, freqs[1])]

    with pytest.raises(ValueError):
        invert_dataset_3d(datasets, GRID,
                          continuation=ContinuationConfig(
                              frequencies=(9e9,)), pml=PML)
    with pytest.raises(ValueError):
        invert_dataset_3d(datasets, GRID, method="nope", pml=PML)

    # schedule matching is float32-tolerant: a 1e-8-relative perturbation
    # of the key (np.arange emits such values) still resolves
    res2 = invert_dataset_3d(
        datasets, GRID, FWIConfig(),
        continuation=ContinuationConfig(
            frequencies=(freqs[0] * (1 + 1e-8),),
            iterations_per_frequency=1),
        pml=PML, solver3d="cbs", iter_cap=400)
    assert res2.frequencies == (freqs[0],)


def test_invert_dataset_3d_gn_single_stage(td3):
    """method='gn' drives run_gauss_newton_3d through the same surface."""
    from waveforminversionust_tpu.fwi.runner3d import invert_dataset_3d

    _, datasets = timedomain_to_fwi_data_3d(td3, [td3.freqs[1]], GRID,
                                            min_angle=0.8)
    res = invert_dataset_3d(datasets, GRID, method="gn", num_iterations=1,
                            cg_iters=2, pml=PML, iter_cap=300)
    assert np.all(np.isfinite(res.metrics["loss"]))
    assert res.velocity.shape == GRID.shape


def test_reconstruction_rmse_3d():
    """Same-grid exactness, cross-grid trilinear consistency, masking."""
    from waveforminversionust_tpu.fwi.runner3d import reconstruction_rmse_3d

    true = _blob_vel(GRID)
    assert reconstruction_rmse_3d(true, GRID, true, radius=9e-3) == 0.0
    # constant offset inside the mask -> exactly that offset
    assert np.isclose(reconstruction_rmse_3d(true + 2.5, GRID, true,
                                             radius=9e-3), 2.5)
    # truth on a 2x finer grid: trilinear resample keeps the smooth blob
    fine = Grid3D.centered(12e-3, 0.5e-3)
    Zf, Yf, Xf = fine.meshgrid()
    d2 = (Xf - 1e-3) ** 2 + (Yf - 2e-3) ** 2 + Zf ** 2
    true_f = (1500.0 + 60.0
              * np.exp(-d2 / (2 * 1.75e-3 ** 2))).astype(np.float32)
    r = reconstruction_rmse_3d(true, GRID, true_f, fine, radius=9e-3)
    assert r < 1.0, r  # same analytic field sampled on both grids


def test_invert_dataset_3d_checkpoint_resume(td3, tmp_path):
    """Kill-and-resume at a stage boundary reproduces the uninterrupted
    two-stage trajectory exactly."""
    from waveforminversionust_tpu.config import ContinuationConfig
    from waveforminversionust_tpu.fwi.runner3d import invert_dataset_3d

    freqs = (float(td3.freqs[0]), float(td3.freqs[2]))
    _, datasets = timedomain_to_fwi_data_3d(td3, freqs, GRID, min_angle=0.8)
    kw = dict(fwi=FWIConfig(), pml=PML, solver3d="cbs", iter_cap=400,
              continuation=ContinuationConfig(frequencies=freqs,
                                              iterations_per_frequency=2))
    full = invert_dataset_3d(datasets, GRID, **kw)

    ckpt = str(tmp_path / "ck")
    # "killed" after stage 0: run stage 0 only, checkpointing
    invert_dataset_3d(datasets, GRID,
                      fwi=kw["fwi"], pml=PML, solver3d="cbs", iter_cap=400,
                      continuation=ContinuationConfig(
                          frequencies=freqs[:1], iterations_per_frequency=2),
                      checkpoint_dir=ckpt)
    resumed = invert_dataset_3d(datasets, GRID, **kw,
                                resume_from=str(tmp_path / "ck" / "latest"))
    np.testing.assert_allclose(resumed.velocity, full.velocity,
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(resumed.metrics["loss"],
                               full.metrics["loss"], rtol=1e-6)
    np.testing.assert_array_equal(resumed.metrics["frequency"],
                                  full.metrics["frequency"])


def test_invert_dataset_3d_alpha_method(td3):
    """method='alpha' drives the 3D attenuation L-BFGS through the driver
    and surfaces the recovered map in metrics['attenuation']."""
    from waveforminversionust_tpu.fwi.runner3d import invert_dataset_3d

    _, datasets = timedomain_to_fwi_data_3d(td3, [td3.freqs[1]], GRID,
                                            min_angle=0.8)
    res = invert_dataset_3d(datasets, GRID, FWIConfig(c_init=1500.0),
                            method="alpha", num_iterations=1,
                            pml=PML, iter_cap=300)
    assert np.all(np.isfinite(res.metrics["loss"]))
    assert res.metrics["attenuation"].shape == GRID.shape
    assert np.all(res.metrics["attenuation"] >= 0.0)


def test_deconvolve_requires_comb_line(td3):
    with pytest.raises(ValueError):
        timedomain_to_fwi_data_3d(td3, [td3.freqs[0] + 0.4 * td3.df], GRID,
                                  deconvolve=True)
    # on the comb it works
    _, (d,) = timedomain_to_fwi_data_3d(td3, [td3.freqs[0]], GRID,
                                        deconvolve=True)
    assert np.all(np.isfinite(np.asarray(d.rec_obs.re)))


def test_hemisphere_array_broadband_descent():
    """The pipeline is geometry-agnostic: a Fibonacci bowl array
    (hemisphere_positions) synthesizes, bridges and descends too."""
    from waveforminversionust_tpu.models.acquisition3d import \
        hemisphere_positions

    pos = hemisphere_positions(12, 8e-3)
    td = synthesize_time_domain_dataset_3d(
        _blob_vel(GRID, center=(-3e-3, 0.0, 0.0)), GRID, pos,
        f_low=0.2e6, f_high=0.3e6, df=0.05e6, seed=4)
    assert td.traces.shape == (12, 12, 12)
    acq, (data,) = timedomain_to_fwi_data_3d(td, [0.25e6], GRID,
                                             min_angle=0.6)
    vel0 = jnp.full(GRID.shape, 1500.0, jnp.float32)
    _, metrics = nonlinear_cg_3d(vel0, data, GRID, FWIConfig(),
                                 num_iterations=2, pml=PML)
    loss = np.asarray(metrics.loss)
    assert np.all(np.isfinite(loss)) and loss[-1] < loss[0]


def test_direct_arrival_gate_3d(td3):
    """The 3D gate preserves the direct-arrival energy and suppresses the
    rest of the record; an over-wide window raises."""
    from waveforminversionust_tpu.data.timedomain3d import \
        direct_arrival_gate_3d

    gated = direct_arrival_gate_3d(td3, pre=2e-6, post=3e-6, taper=0.0)
    assert gated.traces.shape == td3.traces.shape
    period = 1.0 / td3.df
    pos = td3.positions_snapped
    t_arr = (np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
             / 1500.0) % period
    # at the arrival sample the gate is ~1 (energy preserved)
    it = np.argmin(np.abs(td3.times[None, None, :] - t_arr[..., None]),
                   axis=-1)
    i, j = 0, 5
    assert np.isclose(np.abs(gated.traces[i, j, it[i, j]]),
                      np.abs(td3.traces[i, j, it[i, j]]), rtol=1e-5)
    # far from the window (half a period away) it is 0
    far = int((it[i, j] + len(td3.times) // 2) % len(td3.times))
    assert np.abs(gated.traces[i, j, far]) == 0.0

    with pytest.raises(ValueError):
        direct_arrival_gate_3d(td3, pre=period, post=period)


def test_traveltime_init_3d_improves_model():
    """Picker + 3D geometry plumbing + inversion end to end on analytic
    pure-delay traces: each (tx, rx) trace is the comb synthesis of a unit
    delay at the TRUE straight-ray time, so its envelope peaks exactly
    there — isolating the picking/pair/inversion chain from wave physics
    (hopeless at this 2-wavelength toy aperture; the wave path is covered
    by the extraction and FWI-bridge tests above, and picking-on-waves by
    the 2D tests at a realistic 30-wavelength ring)."""
    from waveforminversionust_tpu.data.timedomain import hanning_window
    from waveforminversionust_tpu.data.timedomain3d import \
        TimeDomainDataset3D
    from waveforminversionust_tpu.fwi.traveltime3d import \
        straight_ray_times_3d
    from waveforminversionust_tpu.models.acquisition3d import snap_to_grid3d

    true = _blob_vel(GRID, dv=120.0, center=(0.0, 0.0, 0.0), r=6e-3)
    freqs = np.arange(0.15e6, 0.45e6 + 1, 0.025e6)
    nf = len(freqs)
    df = 0.025e6
    nt = 4 * nf
    times = np.arange(nt) / (nt * df)
    spectrum = hanning_window(nf)

    idx = np.asarray(snap_to_grid3d(GRID, POS))
    pos_snap = np.stack([GRID.x[idx[:, 2]], GRID.y[idx[:, 1]],
                         GRID.z[idx[:, 0]]], axis=1)
    n = len(POS)
    pair_t = np.repeat(pos_snap, n, axis=0)
    pair_r = np.tile(pos_snap, (n, 1))
    t_pair = np.asarray(straight_ray_times_3d(
        1.0 / jnp.asarray(true), pair_t, pair_r, GRID),
        np.float64).reshape(n, n)
    ph = 2j * np.pi * freqs[None, None, None, :] * (
        times[None, None, :, None] - t_pair[:, :, None, None])
    traces = np.einsum("f,ijtf->ijt",
                       spectrum * df, np.exp(ph)).astype(np.complex64)
    td = TimeDomainDataset3D(c=true.astype(np.float64), positions=POS,
                             positions_snapped=pos_snap, freqs=freqs,
                             df=df, spectrum=spectrum, times=times,
                             traces=traces)

    # analytically exact times tolerate weak smoothing (the lam ladder in
    # traveltime.traveltime_init's docstring)
    c_init, t_picked, tx_pos, rx_pos = traveltime_init_3d(
        td, GRID, min_angle=0.8, lam_smooth=3.0, return_times=True)
    t_true = np.asarray(straight_ray_times_3d(
        1.0 / jnp.asarray(true), tx_pos, rx_pos, GRID))
    t_ref = np.linalg.norm(rx_pos - tx_pos, axis=-1) / 1500.0
    # picks recover the exact delays to well under the anomaly signal
    assert (np.abs(t_picked - t_true).mean()
            < 0.1 * np.abs(t_ref - t_true).mean())
    rmse = lambda v: float(np.sqrt(np.mean((v - true) ** 2)))
    assert rmse(c_init) < 0.8 * rmse(np.full(GRID.shape, 1500.0, np.float32))
    assert c_init.shape == GRID.shape
