"""Noise robustness: the inversion and the data-intake chain (QC
reciprocity compensation, data.qc) under additive complex-Gaussian
measurement noise at stated SNRs.

The reference's only data perturbation is its random per-element source
amplitudes (reference: SimulateData.m:26); every quality number in
PERF_NOTES rounds 1-3 was measured on noise-free synthetics. These tests
pin (a) that the CG inversion degrades gracefully with SNR instead of
falling over, and (b) that reciprocity compensation still recovers the
hidden element amplitudes from noisy data — the intake chain's value
survives measurement noise (the real-chip 40/30/20 dB RMSE ladder on
RecordedData is in PERF_NOTES round 4)."""

import numpy as np
import pytest

from waveforminversionust_tpu import (AcquisitionConfig, FWIConfig, Grid2D,
                                      PMLConfig, SolverConfig)
from waveforminversionust_tpu.data.qc import (compensate_reciprocity,
                                              qc_report,
                                              reciprocity_asymmetry)
from waveforminversionust_tpu.data.synthesize import (add_complex_noise,
                                                      synthesize_ring_dataset)
from waveforminversionust_tpu.fwi.objective import build_fwi_data
from waveforminversionust_tpu.fwi.optimizers import nonlinear_cg
from waveforminversionust_tpu.fwi.runner import reconstruction_rmse
from waveforminversionust_tpu.models.acquisition import (
    build_ring_acquisition, ring_positions, snap_to_grid)
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom

C0 = 1500.0
F = 200e3
ACQ = AcquisitionConfig(num_elements=32, radius=18e-3,
                        num_excluded_each_side=3)
SOLVER = SolverConfig(pml=PMLConfig(l_pml=4e-3))


@pytest.fixture(scope="module")
def noisy_fixture():
    """Anti-inverse-crime blob dataset (0.4 mm synthesis, 0.8 mm inversion)
    with the synthesizer's random complex element amplitudes, plus an
    inversion harness returning the model RMSE for a given data matrix."""
    import jax.numpy as jnp

    coarse = Grid2D.centered(24e-3, 0.8e-3)
    xe, ye = ring_positions(ACQ.num_elements, ACQ.radius)
    xi, yi = snap_to_grid(coarse, xe, ye)
    xs, ys = coarse.x[xi], coarse.y[yi]
    fine = Grid2D.centered(24e-3, 0.4e-3)
    true_vel = smooth_blob_phantom(fine, radius=6e-3, dc=30, c_bkgnd=C0)
    ds = synthesize_ring_dataset(true_vel, fine, ACQ, f=F, seed=11,
                                 solver=SOLVER, x_elem=xs, y_elem=ys)
    acq = build_ring_acquisition(coarse, ACQ, x_elem=xs, y_elem=ys)
    true_grid = Grid2D.from_arrays(ds.x, ds.y)
    vel0 = jnp.full(coarse.shape, C0, jnp.float32)
    fwi = FWIConfig(num_iterations=5, c_init=C0)

    def invert_rmse(rec_data):
        data = build_fwi_data(acq, rec_data, F)
        res = nonlinear_cg(vel0, data, coarse, SOLVER, fwi)
        loss = np.asarray(res.metrics.loss)
        assert np.all(np.isfinite(loss)) and loss[-1] < loss[0], loss
        return float(reconstruction_rmse(np.asarray(res.velocity), coarse,
                                         ds.c, true_grid))

    return ds, invert_rmse


def test_snr_scaling_of_add_complex_noise():
    rng = np.random.default_rng(0)
    m = (rng.standard_normal((32, 32))
         + 1j * rng.standard_normal((32, 32))).astype(np.complex64)
    for snr in (40.0, 20.0):
        noisy = add_complex_noise(m, snr, seed=1)
        achieved = 10 * np.log10(np.mean(np.abs(m) ** 2)
                                 / np.mean(np.abs(noisy - m) ** 2))
        assert abs(achieved - snr) < 1.0, (snr, achieved)
    # deterministic in the seed; input untouched
    a = add_complex_noise(m, 30.0, seed=2)
    b = add_complex_noise(m, 30.0, seed=2)
    np.testing.assert_array_equal(a, b)
    assert not np.shares_memory(a, m)


@pytest.mark.parametrize("snr_db,budget_m_s", [(40.0, 1.8), (30.0, 4.0),
                                               (20.0, 13.0)])
def test_inversion_degrades_gracefully_with_noise(noisy_fixture, snr_db,
                                                  budget_m_s):
    """CG at 5 iterations stays finite, monotone, and within an absolute
    RMSE budget at each SNR (measured 0.9 / 2.4 / 8.5 m/s at 40/30/20 dB
    on this fixture, clean 0.6; budgets carry margin for seed noise) —
    additive channel noise must not destabilize the solver or the line
    search (step-size denominators, reject_nonfinite)."""
    ds, invert_rmse = noisy_fixture
    noisy = add_complex_noise(ds.rec_data, snr_db, seed=3,
                              exclude_each_side=ACQ.num_excluded_each_side)
    rmse_noisy = invert_rmse(noisy)
    assert rmse_noisy <= budget_m_s, (snr_db, rmse_noisy)


def test_qc_compensation_noise_regimes(noisy_fixture):
    """The honest noise story of reciprocity compensation, pinned.

    The estimator itself survives noise (asymmetry O(1) -> ~noise level),
    and on NOISE-FREE data compensation improves the reconstruction (the
    round-3 RecordedData result: equalizing the synthesizer's random shot
    weights democratizes shot information). But under additive channel
    noise the equalization UPWEIGHTS low-SNR shots (a row scaled by a
    small |q_t| carries proportionally less signal over the same noise
    floor; dividing it back up boosts its noise to full weight), and the
    compensated inversion is measurably WORSE — at 30 dB on this fixture,
    4.3 vs 2.4 m/s. Phase-only compensation is inversion-neutral (the
    per-shot source estimate absorbs phases). Production guidance lives
    in data.qc.compensate_reciprocity's docstring; the real-chip
    RecordedData SNR ladder is in PERF_NOTES round 4."""
    ds, invert_rmse = noisy_fixture
    k = ACQ.num_excluded_each_side

    # (a) noise-free: compensation helps (0.54 vs 0.62 measured).
    c_clean = qc_report(ds.rec_data, exclude_each_side=k).ratios
    assert (invert_rmse(compensate_reciprocity(ds.rec_data, c_clean))
            < invert_rmse(ds.rec_data))

    # (b) 30 dB: the estimator still recovers the ratios...
    noisy = add_complex_noise(ds.rec_data, 30.0, seed=4,
                              exclude_each_side=k)
    raw_asym = reciprocity_asymmetry(noisy, k)
    rep = qc_report(noisy, exclude_each_side=k,
                    residual_floor=0.2)  # noise raises every residual
    comp = compensate_reciprocity(noisy, rep.ratios)
    comp_asym = reciprocity_asymmetry(comp, k)
    assert raw_asym > 0.5, raw_asym
    assert comp_asym < 0.25 * raw_asym, (raw_asym, comp_asym)
    # ...but the equalized weighting hurts the noisy inversion: the raw
    # misfit (uniform per-entry noise) is already the ML weighting.
    rmse_raw = invert_rmse(noisy)
    rmse_comp = invert_rmse(comp)
    assert rmse_comp > 1.2 * rmse_raw, (rmse_comp, rmse_raw)

    # (c) phase-only compensation is inversion-neutral: per-shot source
    # estimation absorbs any per-tx phase, so only the |c| reweighting
    # has inversion consequences.
    phase = rep.ratios / np.abs(rep.ratios)
    rmse_phase = invert_rmse(compensate_reciprocity(noisy, phase))
    assert abs(rmse_phase - rmse_raw) < 0.05 * rmse_raw
