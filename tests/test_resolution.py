"""Resolution / uncertainty tools (fwi/resolution.py): PSF probes and the
Hutchinson diag(J^H J) estimate.

The underlying Frechet pair is already FD- and adjoint-pinned in
tests/test_newton.py; these tests pin the appraisal semantics: a
well-illuminated pixel's PSF concentrates at the probe, the constraint
density is positive and ring-interior-concentrated, and the trace
estimator is seed-stable."""

import jax.numpy as jnp
import numpy as np

from waveforminversionust_tpu import (AcquisitionConfig, Grid2D, PMLConfig,
                                      SolverConfig, build_ring_acquisition)
from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
from waveforminversionust_tpu.fwi.objective import build_fwi_data
from waveforminversionust_tpu.fwi.resolution import (hessian_diag_probe,
                                                     psf_probe)

C0 = 1500.0
F = 250e3
ACQ = AcquisitionConfig(num_elements=16, radius=9e-3,
                        num_excluded_each_side=2)
SOLVER = SolverConfig(pml=PMLConfig(l_pml=2.4e-3))
GRID = Grid2D.centered(12e-3, 0.8e-3)  # 31x31


def _data():
    vel = np.full(GRID.shape, C0, np.float32)
    ds = synthesize_ring_dataset(vel, GRID, ACQ, f=F, solver=SOLVER, seed=1)
    acq = build_ring_acquisition(GRID, ACQ)
    return build_fwi_data(acq, ds.rec_data, F), vel


def test_psf_concentrates_at_probe():
    """A Gaussian probe at the (well-illuminated) ring center returns a PSF
    that correlates strongly with the probe and peaks at its center."""
    data, vel = _data()
    yy, xx = np.mgrid[:GRID.ny, :GRID.nx]
    cy, cx = GRID.ny // 2, GRID.nx // 2
    probe = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 2.0**2)
    probe = probe.astype(np.float32)[None]

    psf = np.asarray(psf_probe(jnp.asarray(vel), data, GRID, SOLVER,
                               probes=jnp.asarray(probe), cg_iters=16))[0]
    assert np.all(np.isfinite(psf))
    # peak within 2 pixels of the probe center
    py, px = np.unravel_index(np.argmax(np.abs(psf)), psf.shape)
    assert abs(py - cy) <= 2 and abs(px - cx) <= 2
    # strong correlation with the probe (resolved, not smeared away)
    corr = float((psf * probe[0]).sum()
                 / (np.linalg.norm(psf) * np.linalg.norm(probe[0]) + 1e-30))
    assert corr > 0.5


def test_hessian_diag_interior_constrained_and_seed_stable():
    data, vel = _data()
    d0 = np.asarray(hessian_diag_probe(jnp.asarray(vel), data, GRID, SOLVER,
                                       num_probes=8, seed=0))
    d1 = np.asarray(hessian_diag_probe(jnp.asarray(vel), data, GRID, SOLVER,
                                       num_probes=8, seed=1))
    assert np.all(np.isfinite(d0))
    # trace estimate: unbiased, low relative variance -> seed-stable
    t0, t1 = d0.sum(), d1.sum()
    assert t0 > 0 and t1 > 0
    assert abs(t0 - t1) < 0.5 * max(t0, t1)
    # data constraint concentrates inside the ring: center region beats
    # the domain corners (outside the aperture + PML) by a wide margin
    c = GRID.ny // 2
    center = d0[c - 3:c + 4, c - 3:c + 4].mean()
    corners = np.mean([d0[:3, :3].mean(), d0[:3, -3:].mean(),
                       d0[-3:, :3].mean(), d0[-3:, -3:].mean()])
    assert center > 10 * abs(corners)
