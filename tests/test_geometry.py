"""Grid and ring-acquisition geometry tests (parity with reference
preprocessing, reference: fwi_script.py:31-85, FrequencyDomainFWI.m:13-68)."""

import numpy as np

from waveforminversionust_tpu import AcquisitionConfig, Grid2D
from waveforminversionust_tpu.models.acquisition import (acceptance_mask,
                                                         build_ring_acquisition,
                                                         ring_positions)


def test_reference_grid_shape():
    grid = Grid2D.centered(120e-3, 0.8e-3)
    assert grid.shape == (301, 301)
    assert grid.x[0] == -0.12 and abs(grid.x[-1] - 0.12) < 1e-12
    assert abs(grid.h - 0.8e-3) < 1e-12
    assert grid.aspect == 1.0


def test_acceptance_mask_reference_counts():
    """256 elements, 31 excluded each side + self -> 193 active receivers
    (reference: fwi_script.py:39-44)."""
    mask = acceptance_mask(256, 31)
    assert mask.shape == (256, 256)
    assert (mask.sum(axis=1) == 193).all()
    # for tx=0: excluded are {-31..31} mod 256
    excl = set((np.arange(-31, 32)) % 256)
    assert set(np.flatnonzero(~mask[0])) == excl
    # symmetric layout: mask[t] is a roll of mask[0]
    assert (mask[10] == np.roll(mask[0], 10)).all()


def test_ring_positions_match_reference_layout():
    x, y = ring_positions(256, 110e-3)
    # theta = -pi : 2pi/N : pi - 2pi/N (reference: SimulateData.m:17)
    assert np.allclose(x[0], -110e-3)
    assert np.allclose(y[0], 110e-3 * np.sin(-np.pi), atol=1e-12)
    assert np.allclose(np.hypot(x, y), 110e-3)


def test_build_ring_acquisition_indices():
    grid = Grid2D.centered(120e-3, 0.8e-3)
    acq = build_ring_acquisition(grid, AcquisitionConfig())
    assert acq.num_elements == 256
    assert acq.num_tx == 256
    assert acq.num_active_rx == 193
    assert acq.rx_indices.shape == (256, 193)
    assert acq.rx_y.shape == (256, 193)
    # element pixels must lie on (approximately) the ring
    X = grid.x[acq.x_idx]
    Y = grid.y[acq.y_idx]
    r = np.hypot(X, Y)
    assert np.abs(r - 110e-3).max() < 0.8e-3  # within one pixel
    # snapped indices round-trip to within half a pixel
    assert np.abs(X - acq.x_elem).max() <= 0.4e-3 + 1e-9


def test_tx_downsample():
    grid = Grid2D.centered(120e-3, 0.8e-3)
    acq = build_ring_acquisition(grid, AcquisitionConfig(tx_downsample=4))
    assert acq.num_tx == 64
    assert (acq.tx_include == np.arange(0, 256, 4)).all()
    assert acq.include_mask.shape == (64, 256)


def test_source_fields():
    grid = Grid2D.centered(120e-3, 0.8e-3)
    acq = build_ring_acquisition(grid, AcquisitionConfig(tx_downsample=8))
    amps = np.arange(1, acq.num_tx + 1).astype(np.complex64)
    src = acq.source_fields(amplitudes=amps)
    assert src.shape == (32, 301, 301)
    for i in range(0, 32, 7):
        t = acq.tx_include[i]
        assert src[i, acq.y_idx[t], acq.x_idx[t]] == amps[i]
        assert np.count_nonzero(src[i]) == 1


def test_receiver_sampling_roundtrip():
    grid = Grid2D.centered(120e-3, 0.8e-3)
    acq = build_ring_acquisition(grid, AcquisitionConfig(tx_downsample=16))
    fields = np.zeros((acq.num_tx,) + grid.shape, np.complex64)
    # plant known values at all element pixels
    vals = (np.arange(acq.num_elements) + 1).astype(np.complex64)
    for e in range(acq.num_elements):
        fields[:, acq.y_idx[e], acq.x_idx[e]] = vals[e]
    rec = acq.sample_receivers_all(fields)
    assert rec.shape == (acq.num_tx, 256)
    np.testing.assert_array_equal(rec[0], vals)
