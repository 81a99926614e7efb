"""Acquisition-data QC: reciprocity of the discrete operator, exact
element-response-ratio recovery from the asymmetry, and bad-channel
screening. The reference ingests REC_DATA unchecked (fwi_script.py:17-26)."""

import numpy as np
import pytest

from waveforminversionust_tpu import (AcquisitionConfig, Grid2D, PMLConfig,
                                      SolverConfig)
from waveforminversionust_tpu.data.qc import (compensate_reciprocity,
                                              estimate_element_ratios,
                                              qc_report,
                                              reciprocity_asymmetry)
from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom

N = 16
ACQ = AcquisitionConfig(num_elements=N, radius=9e-3, num_excluded_each_side=2)
SOLVER = SolverConfig(pml=PMLConfig(l_pml=3e-3))


def _synthesize(random_amplitudes, seed=1):
    fine = Grid2D.centered(12e-3, 0.4e-3)
    vel = smooth_blob_phantom(fine, radius=3e-3, dc=30, c_bkgnd=1500.0)
    return synthesize_ring_dataset(vel, fine, ACQ, f=200e3, seed=seed,
                                   solver=SOLVER,
                                   random_amplitudes=random_amplitudes)


@pytest.fixture(scope="module")
def matrices():
    m_unit = _synthesize(False).rec_data
    m_rand = _synthesize(True).rec_data
    rng = np.random.default_rng(1)  # the synthesizer's amp stream (seed=1)
    amps = (rng.standard_normal(N)
            + 1j * rng.standard_normal(N)).astype(np.complex64)
    return m_unit, m_rand, amps


def test_discrete_operator_is_reciprocal(matrices):
    """Unit-response synthesis: M == M^T to the f32 solve floor — the
    physical identity the whole QC rests on (complex-symmetric operator)."""
    m_unit, _, _ = matrices
    assert reciprocity_asymmetry(m_unit) < 1e-4


def test_ratio_recovery_and_compensation(matrices):
    m_unit, m_rand, amps = matrices
    assert reciprocity_asymmetry(m_rand) > 0.5  # imbalance is visible
    c = estimate_element_ratios(m_rand)
    # Exact recovery up to ONE global complex scale: c/amps is constant.
    ratio = c / amps
    mags = np.abs(ratio)
    assert np.std(mags) / np.mean(mags) < 1e-4
    phases = np.angle(ratio * np.conj(ratio[0]))
    assert np.max(np.abs(phases)) < 1e-3
    mc = compensate_reciprocity(m_rand, c)
    assert reciprocity_asymmetry(mc) < 1e-4
    # Compensation recovers the unit-response matrix up to the global scale.
    scale = np.vdot(mc.ravel(), m_unit.ravel()) / np.vdot(mc.ravel(),
                                                          mc.ravel())
    rel = (np.linalg.norm(scale * mc - m_unit)
           / np.linalg.norm(m_unit))
    assert rel < 1e-4, rel


def test_qc_report_flags_bad_channels(matrices):
    _, m_rand, _ = matrices
    clean = qc_report(m_rand)
    assert clean.asymmetry_raw > 0.5
    assert clean.asymmetry_compensated < 1e-4
    assert clean.bad_elements.size == 0

    # Internally inconsistent channel: element 5's transmit record gets
    # per-receiver random phases no single response factor explains.
    rng = np.random.default_rng(7)
    m_bad = np.array(m_rand)
    m_bad[5] *= np.exp(1j * rng.uniform(-np.pi, np.pi, N)).astype(np.complex64)
    rep = qc_report(m_bad)
    assert 5 in rep.bad_elements
    assert rep.element_residual[5] == rep.element_residual.max()
    # Dead transmitter: near-zero row energy.
    m_dead = np.array(m_rand)
    m_dead[9] *= 1e-6
    rep2 = qc_report(m_dead)
    assert 9 in rep2.bad_elements
    assert rep2.element_energy[9] < 0.05
    # The healthy channels stay unflagged in both screens.
    assert not set(rep.bad_elements) - {5}
    assert not set(rep2.bad_elements) - {9}


REFERENCE_DATA = "/root/reference/Lecture19_Fwi/RecordedData.mat"


@pytest.mark.skipif(not __import__("os").path.exists(REFERENCE_DATA),
                    reason="reference dataset not present")
def test_qc_on_reference_dataset():
    """The reference's own RecordedData.mat: QC recovers the MATLAB
    synthesizer's hidden random per-element amplitudes
    (reference: SimulateData.m:23-27) — compensation drives the 256x256
    reciprocity violation from O(1) to the f32 solve floor, with every
    channel healthy."""
    from waveforminversionust_tpu.data.matio import load_recorded_dataset
    ds = load_recorded_dataset(REFERENCE_DATA)
    rep = qc_report(ds.rec_data, exclude_each_side=31)
    assert rep.asymmetry_raw > 1.0
    assert rep.asymmetry_compensated < 1e-4
    assert rep.bad_elements.size == 0


def test_pair_mask_rejects_empty_pair_set():
    """exclude_each_side >= n/2 leaves no admitted pairs; the QC entry
    points must error instead of eigendecomposing an all-zero form and
    returning meaningless ratios."""
    from waveforminversionust_tpu.data.qc import _pair_mask
    with pytest.raises(ValueError, match="admits no element pairs"):
        _pair_mask(8, 4)
    m = np.ones((8, 8), np.complex64)
    with pytest.raises(ValueError, match="admits no element pairs"):
        qc_report(m, exclude_each_side=4)
    # One below the cutoff still works.
    assert _pair_mask(8, 3).any()
