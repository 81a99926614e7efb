"""Lossy-media (attenuation) support in the FD Helmholtz solve.

The reference models lossless media only; attenuation is a framework
addition: ``solve_helmholtz(..., attenuation=alpha)`` with alpha [Np/m]
makes k = omega/c + i*sgn*alpha, so field amplitudes decay as
exp(-alpha * distance) on top of geometric spreading.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from waveforminversionust_tpu import (Grid2D, PMLConfig, SolverConfig,
                                      SolverMethod)
from waveforminversionust_tpu.ops.solve import solve_helmholtz
from waveforminversionust_tpu.utils.host import fetch

F = 300e3
C0 = 1500.0


@pytest.fixture(scope="module")
def setup():
    grid = Grid2D.centered(16e-3, 0.4e-3)  # 81x81
    solver = SolverConfig(pml=PMLConfig(l_pml=3.2e-3))
    vel = np.full(grid.shape, C0, np.float32)
    src = np.zeros(grid.shape, np.complex64)
    src[grid.ny // 2, grid.nx // 2] = 1.0
    return grid, solver, vel, src[None]


def test_attenuation_decays_exponentially(setup):
    """|u_lossy| / |u_lossless| ~ exp(-alpha r) away from the source."""
    grid, solver, vel, src = setup
    alpha = 150.0  # Np/m -> exp(-alpha*8mm) ~ 0.30
    u0, info0 = solve_helmholtz(vel, src, F, grid, solver)
    ua, infoa = solve_helmholtz(vel, src, F, grid, solver,
                                attenuation=np.full(grid.shape, alpha,
                                                    np.float32))
    assert float(info0.rel_residual.max()) < 1e-4
    assert float(infoa.rel_residual.max()) < 1e-4
    cy, cx = grid.ny // 2, grid.nx // 2
    for npix in (10, 20):  # 4 mm, 8 mm
        r = npix * grid.h
        ratio = (abs(complex(fetch(ua[0, cy, cx + npix])))
                 / abs(complex(fetch(u0[0, cy, cx + npix]))))
        expect = np.exp(-alpha * r)
        # The discrete operator's effective decay differs from the continuum
        # by dispersion/PML effects; 25% agreement is the physics check.
        assert ratio == pytest.approx(expect, rel=0.25), (npix, ratio, expect)
    # and monotone: more attenuation, less amplitude
    assert abs(complex(fetch(ua[0, cy, cx + 20]))) < abs(
        complex(fetch(u0[0, cy, cx + 20])))


def test_split_matches_native_lossy(setup):
    grid, solver, vel, src = setup
    alpha = np.full(grid.shape, 100.0, np.float32)
    u_n, _ = solve_helmholtz(vel, src, F, grid, solver, attenuation=alpha)
    split = dataclasses.replace(solver, split_complex=True)
    u_s, _ = solve_helmholtz(vel, src, F, grid, split, attenuation=alpha)
    u_s = fetch(u_s.re if hasattr(u_s, "re") else u_s)
    got = np.asarray(u_s) if not np.iscomplexobj(u_s) else u_s
    # compare real parts and magnitudes
    np.testing.assert_allclose(np.real(fetch(u_n)),
                               np.asarray(got),
                               atol=3e-5 * float(jnp.abs(u_n).max()))


def test_adjoint_solve_lossy_consistent(setup):
    """<H^-H a, b> == conj(<a, H^-1 b>) holds for the lossy operator too."""
    grid, solver, vel, src = setup
    alpha = np.full(grid.shape, 80.0, np.float32)
    rng = np.random.default_rng(0)
    a = (rng.standard_normal(grid.shape)
         + 1j * rng.standard_normal(grid.shape)).astype(np.complex64)[None]
    u, _ = solve_helmholtz(vel, src, F, grid, solver, attenuation=alpha)
    w, _ = solve_helmholtz(vel, a, F, grid, solver, adjoint=True,
                           attenuation=alpha)
    lhs = np.vdot(np.asarray(fetch(w[0])), np.asarray(fetch(src[0])))
    rhs = np.vdot(np.asarray(fetch(a[0])), np.asarray(fetch(u[0])))
    assert lhs == pytest.approx(rhs, rel=1e-3)


def test_born_rejects_attenuation(setup):
    grid, solver, vel, src = setup
    born = dataclasses.replace(solver, method=SolverMethod.BORN)
    with pytest.raises(NotImplementedError):
        solve_helmholtz(vel, src, F, grid, born,
                        attenuation=np.zeros(grid.shape, np.float32))


def test_synthesize_with_attenuation(setup):
    from waveforminversionust_tpu import AcquisitionConfig
    from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset

    grid, solver, vel, _ = setup
    acq = AcquisitionConfig(num_elements=12, radius=6e-3)
    ds0 = synthesize_ring_dataset(vel, grid, acq, f=F, solver=solver, seed=1)
    dsa = synthesize_ring_dataset(vel, grid, acq, f=F, solver=solver, seed=1,
                                  attenuation=np.full(grid.shape, 120.0,
                                                      np.float32))
    # same geometry, strictly weaker transmissions
    m0 = np.abs(ds0.rec_data).mean()
    ma = np.abs(dsa.rec_data).mean()
    assert ma < 0.7 * m0
