"""Multi-frequency sweep and time-domain synthesis tests."""

import numpy as np
import jax.numpy as jnp

from waveforminversionust_tpu import Grid2D, PMLConfig, SolverConfig
from waveforminversionust_tpu.data.timedomain import (frequency_sweep,
                                                      hanning_window,
                                                      simulate_time_domain,
                                                      synthesize_time_fields)
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom
from waveforminversionust_tpu.ops.solve import solve_helmholtz
from waveforminversionust_tpu.utils.host import fetch


def test_hanning_matches_matlab_convention():
    w = hanning_window(5)
    # MATLAB hanning(5) = [0.25, 0.75, 1.0, 0.75, 0.25]
    np.testing.assert_allclose(w, [0.25, 0.75, 1.0, 0.75, 0.25], atol=1e-12)
    assert w[0] > 0  # no zero endpoints


def test_frequency_sweep_matches_individual_solves():
    grid = Grid2D.centered(12e-3, 0.8e-3)
    solver = SolverConfig(pml=PMLConfig(l_pml=2.4e-3))
    vel = smooth_blob_phantom(grid, radius=4e-3, dc=30)
    src = np.zeros(grid.shape, np.complex64)
    src[15, 15] = 1.0
    freqs = np.array([200e3, 300e3, 400e3])
    fields = frequency_sweep(vel, src, freqs, grid, solver)
    assert fields.shape == (3,) + grid.shape
    for i, f in enumerate(freqs):
        u, _ = solve_helmholtz(vel, src[None], f, grid, solver)
        np.testing.assert_allclose(fetch(fields[i]), fetch(u[0]),
                                   atol=2e-5 * float(jnp.abs(u).max()))


def test_time_synthesis_single_tone():
    """A single frequency bin synthesizes to u_f * exp(i 2 pi f t) * df."""
    ny = nx = 8
    rng = np.random.default_rng(0)
    uf = (rng.standard_normal((1, ny, nx))
          + 1j * rng.standard_normal((1, ny, nx))).astype(np.complex64)
    freqs = np.array([2.0e5])
    times = np.array([0.0, 1e-6, 2e-6])
    df = 5e3
    out = synthesize_time_fields(jnp.array(uf), freqs, times, df, np.ones(1))
    expect = uf[0][None] * np.exp(2j * np.pi * freqs[0] * times)[:, None, None] * df
    np.testing.assert_allclose(fetch(out), expect, rtol=1e-4)


def test_simulate_time_domain_smoke():
    """Miniature version of the reference demo: causal arrival at a far
    element (signal energy arrives no earlier than distance/c)."""
    grid = Grid2D.centered(12e-3, 1.0e-3)  # 25x25, tiny
    vel = np.full(grid.shape, 1500.0, np.float32)
    res = simulate_time_domain(
        vel, grid, element_idx=0, f_low=0.2e6, f_high=0.4e6, df=0.02e6,
        nt=41, num_elements=16, radius=9e-3,
        solver=SolverConfig(pml=PMLConfig(l_pml=2e-3)))
    assert res.wavefields_t.shape == (41,) + grid.shape
    assert res.channel_data.shape == (41, 16)
    assert np.isfinite(res.channel_data).all()
    # element 8 is diametrically opposite element 0 (18 mm away):
    # earliest arrival ~ 18mm/1500 = 12 us; the field there should be small
    # before half that time and peak after (finite bandwidth -> temporal
    # sidelobes bound how small "small" can be).
    t_arr = 18e-3 / 1500.0
    early = np.abs(res.channel_data[res.times < 0.4 * t_arr, 8]).max()
    late = np.abs(res.channel_data[res.times > t_arr, 8]).max()
    assert late > 4 * early


def test_time_domain_split_matches_native():
    import dataclasses
    grid = Grid2D.centered(12e-3, 1.0e-3)
    vel = smooth_blob_phantom(grid, radius=4e-3, dc=30)
    kwargs = dict(element_idx=0, f_low=0.2e6, f_high=0.3e6, df=0.05e6,
                  nt=11, num_elements=8, radius=9e-3)
    solver = SolverConfig(pml=PMLConfig(l_pml=2e-3))
    res_n = simulate_time_domain(vel, grid, solver=solver, **kwargs)
    res_s = simulate_time_domain(
        vel, grid, solver=dataclasses.replace(solver, split_complex=True),
        **kwargs)
    np.testing.assert_allclose(res_s.channel_data, res_n.channel_data,
                               atol=2e-5 * np.abs(res_n.channel_data).max())
