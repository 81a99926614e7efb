""".mat I/O round-trips and golden loads of the reference dataset."""

import os

import numpy as np
import pytest

from conftest import REFERENCE_DIR, reference_available
from waveforminversionust_tpu.data.matio import (load_mat,
                                                 load_recorded_dataset,
                                                 save_mat,
                                                 save_recorded_dataset)
from waveforminversionust_tpu.data.synthesize import RingDataset

RECORDED = os.path.join(REFERENCE_DIR, "Lecture19_Fwi", "RecordedData.mat")
REC = os.path.join(REFERENCE_DIR, "Lecture19_Fwi", "REC.mat")

needs_reference = pytest.mark.skipif(not reference_available(),
                                     reason="reference dataset not mounted")


def test_save_load_roundtrip(tmp_path):
    path = str(tmp_path / "rt.mat")
    rng = np.random.default_rng(0)
    arrays = {
        "A": rng.standard_normal((5, 7)),
        "Z": (rng.standard_normal((3, 4)) + 1j * rng.standard_normal((3, 4))),
        "v": rng.standard_normal(6),
        "s": np.float64(3.5),
    }
    save_mat(path, arrays)
    back = load_mat(path)
    np.testing.assert_allclose(back["A"], arrays["A"])
    np.testing.assert_allclose(back["Z"], arrays["Z"])
    np.testing.assert_allclose(back["v"].ravel(), arrays["v"])
    assert float(np.asarray(back["s"]).ravel()[0]) == 3.5


def test_dataset_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    ds = RingDataset(
        x=np.linspace(-1, 1, 11), y=np.linspace(-1, 1, 9),
        c=rng.standard_normal((9, 11)) + 1500,
        x_circ=rng.standard_normal(8), y_circ=rng.standard_normal(8),
        f=3.5e5,
        rec_data=(rng.standard_normal((8, 8))
                  + 1j * rng.standard_normal((8, 8))).astype(np.complex64),
    )
    path = str(tmp_path / "ds.mat")
    save_recorded_dataset(path, ds)
    back = load_recorded_dataset(path)
    np.testing.assert_allclose(back.x, ds.x)
    np.testing.assert_allclose(back.c, ds.c)
    np.testing.assert_allclose(back.rec_data, ds.rec_data, rtol=1e-6)
    assert back.f == ds.f


@needs_reference
def test_load_reference_recorded_data():
    """The reference acquisition file loads with the documented schema
    (SURVEY.md L0: 801x801 grid, 256 elements, 350 kHz)."""
    ds = load_recorded_dataset(RECORDED)
    assert ds.c.shape == (801, 801)
    assert ds.x.shape == (801,) and ds.y.shape == (801,)
    assert ds.x_circ.shape == (256,) and ds.y_circ.shape == (256,)
    assert ds.rec_data.shape == (256, 256)
    assert ds.f == pytest.approx(350e3)
    # physical sanity
    assert 1300 < ds.c.min() < 1500 < ds.c.max() < 1700
    np.testing.assert_allclose(np.hypot(ds.x_circ, ds.y_circ), 110e-3,
                               atol=1e-6)
    assert np.abs(ds.rec_data).max() > 0


@needs_reference
def test_load_reference_rec_golden():
    raw = load_mat(REC)
    assert raw["REC1"].shape == (1, 193)
    assert raw["REC1"].dtype == np.complex64
