"""Golden-file regression test (ROADMAP item 10).

``tests/golden/ring16.npz`` freezes a miniature end-to-end problem: a
16-element ring dataset synthesized on a fine grid (frozen bytes) plus the
expected 4-iteration nonlinear-CG reconstruction and loss history computed
from it. Re-running the inversion from the frozen data must reproduce them.

This locks the full numerical chain — stencil coefficients, PML profile,
banded factorization/solve, source-strength estimation, adjoint rule,
momentum/step-size formulas — against silent drift. Tolerances are loose
enough to survive XLA version bumps (f32 reduction-order changes are
~1e-5 relative) but tight enough that any real physics change (wrong
coefficient, sign, or scaling) fails loudly. Regenerate deliberately with
``python tests/golden/generate.py`` and eyeball the loss history before
committing a new fixture.
"""

import importlib.util
import os

import numpy as np
import pytest

from waveforminversionust_tpu.data.synthesize import RingDataset
from waveforminversionust_tpu.fwi.runner import invert_dataset

_GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
FIXTURE = os.path.join(_GOLDEN_DIR, "ring16.npz")

# The generator module is the single source of truth for the fixture's
# configuration (grid, acquisition, solver, FWI settings).
_spec = importlib.util.spec_from_file_location(
    "golden_generate", os.path.join(_GOLDEN_DIR, "generate.py"))
_gen = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_gen)
ACQ, COARSE, FWI, SOLVER = _gen.ACQ, _gen.COARSE, _gen.FWI, _gen.SOLVER


@pytest.fixture(scope="module")
def golden():
    return np.load(FIXTURE)


def test_golden_reconstruction(golden):
    ds = RingDataset(
        x=golden["x"], y=golden["y"], c=golden["c"],
        x_circ=golden["x_circ"], y_circ=golden["y_circ"],
        f=float(golden["f"]),
        rec_data=(golden["rec_re"] + 1j * golden["rec_im"]).astype(np.complex64),
    )
    res = invert_dataset(ds, grid=COARSE, acquisition=ACQ, solver=SOLVER,
                         fwi=FWI)

    loss = np.asarray(res.metrics["loss"], np.float64)
    np.testing.assert_allclose(loss, golden["loss"], rtol=1e-2)
    np.testing.assert_allclose(np.asarray(res.metrics["step_size"], np.float64),
                               golden["step"], rtol=1e-2)
    # Velocity: pointwise agreement well below the reconstruction's own
    # contrast (the blob is +40 m/s; drift from a physics change is O(m/s)).
    np.testing.assert_allclose(np.asarray(res.velocity), golden["velocity"],
                               atol=0.5)


def test_golden_fixture_sane(golden):
    """The committed fixture itself is well-formed (guards a bad regen)."""
    loss = golden["loss"]
    assert loss.shape == (FWI.num_iterations,)
    assert np.all(np.isfinite(loss)) and np.all(loss > 0)
    assert loss[-1] < 0.5 * loss[0], "fixture inversion did not converge"
    vel = golden["velocity"]
    assert vel.shape == COARSE.shape
    assert 10.0 < vel.max() - FWI.c_init < 80.0
