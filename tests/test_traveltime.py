"""Travel-time tomography initialization tests (fwi/traveltime.py)."""

import numpy as np
import pytest

from waveforminversionust_tpu import Grid2D, PMLConfig, SolverConfig
from waveforminversionust_tpu.data.timedomain import (
    direct_arrival_gate, synthesize_time_domain_dataset)
from waveforminversionust_tpu.fwi.traveltime import (
    _predicted_times, invert_travel_times, pick_arrival_times,
    straight_ray_times, traveltime_init)
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom
from waveforminversionust_tpu.utils.host import fetch


def _ring(ne, radius):
    th = -np.pi + 2 * np.pi * np.arange(ne) / ne
    return radius * np.cos(th), radius * np.sin(th)


class TestForwardMap:
    def test_constant_slowness_exact(self):
        """On a constant map the midpoint rule is exact: t = d * s."""
        grid = Grid2D.centered(12e-3, 0.5e-3)
        s0 = 1.0 / 1500.0
        xe, ye = _ring(8, 9e-3)
        pos = np.stack([xe, ye], axis=1).astype(np.float32)
        tx = np.repeat(pos, 8, axis=0)
        rx = np.tile(pos, (8, 1))
        t = fetch(straight_ray_times(np.full(grid.shape, s0, np.float32),
                                     tx, rx, grid, n_samples=64))
        d = np.linalg.norm(rx - tx, axis=-1)
        np.testing.assert_allclose(t, d * s0, rtol=1e-5, atol=1e-12)

    def test_linear_in_slowness(self):
        grid = Grid2D.centered(10e-3, 1e-3)
        rng = np.random.default_rng(0)
        s1 = rng.random(grid.shape).astype(np.float32) * 1e-3
        s2 = rng.random(grid.shape).astype(np.float32) * 1e-3
        tx = np.array([[-8e-3, 0.0]], np.float32)
        rx = np.array([[8e-3, 2e-3]], np.float32)
        t1 = fetch(straight_ray_times(s1, tx, rx, grid, n_samples=32))
        t2 = fetch(straight_ray_times(s2, tx, rx, grid, n_samples=32))
        t12 = fetch(straight_ray_times(s1 + 2 * s2, tx, rx, grid,
                                       n_samples=32))
        np.testing.assert_allclose(t12, t1 + 2 * t2, rtol=1e-4)

    def test_slow_inclusion_delays_crossing_ray_only(self):
        """A slow blob on one ray's path delays it; a ray missing the blob
        is unaffected."""
        grid = Grid2D.centered(12e-3, 0.4e-3)
        vel = smooth_blob_phantom(grid, radius=3e-3, dc=-100,
                                  center=(0.0, 0.0))
        s = (1.0 / vel).astype(np.float32)
        tx = np.array([[-10e-3, 0.0], [-10e-3, 10e-3]], np.float32)
        rx = np.array([[10e-3, 0.0], [10e-3, 10e-3]], np.float32)
        t = fetch(straight_ray_times(s, tx, rx, grid))
        d = 20e-3
        t_bg = d / 1500.0
        assert t[0] > t_bg * 1.0005          # through the slow blob
        np.testing.assert_allclose(t[1], t_bg, rtol=2e-4)  # misses it


class TestPicking:
    def _homog_dataset(self, **kw):
        grid = Grid2D.centered(12e-3, 0.8e-3)
        vel = np.full(grid.shape, 1500.0, np.float32)
        kw.setdefault("f_low", 0.2e6)
        kw.setdefault("f_high", 0.4e6)
        kw.setdefault("df", 0.02e6)
        from waveforminversionust_tpu.config import AcquisitionConfig
        return synthesize_time_domain_dataset(
            vel, grid,
            acquisition=AcquisitionConfig(num_elements=12, radius=9e-3),
            solver=SolverConfig(pml=PMLConfig(l_pml=2.4e-3)), **kw)

    def test_homogeneous_picks_match_straight_ray(self):
        td = self._homog_dataset()
        t_ref = _predicted_times(td.x_circ, td.y_circ, 1500.0)
        picks = pick_arrival_times(td.traces, td.times, td.df, t_ref)
        ne = len(td.x_circ)
        mask = ~np.eye(ne, dtype=bool)
        # element snapping moves endpoints by up to h/2 each -> up to ~0.4 us
        # of geometric skew; the pick itself is sub-sample on clean data.
        err = np.abs(picks - t_ref)[mask]
        dt = td.times[1] - td.times[0]
        assert np.median(err) < 0.5 * dt
        assert err.max() < 1.5e-6

    def test_unwrap_beyond_one_period(self):
        """Arrivals past T = 1/df (distant pairs in short records) unwrap
        onto the correct absolute time."""
        td = self._homog_dataset(df=0.1e6)  # T = 10 us < 18 mm / 1500 m/s
        t_ref = _predicted_times(td.x_circ, td.y_circ, 1500.0)
        period = 1.0 / td.df
        assert t_ref.max() > period  # the test premise: wrapping occurs
        picks = pick_arrival_times(td.traces, td.times, td.df, t_ref)
        ne = len(td.x_circ)
        far = t_ref > period
        assert far.any()
        err = np.abs(picks - t_ref)[far & ~np.eye(ne, dtype=bool)]
        assert np.median(err) < 1.0e-6

    def test_search_window_restricts_peak(self):
        """With a tight search window the pick stays near the prediction
        even when a larger spurious peak sits elsewhere."""
        rng = np.random.default_rng(0)
        nt = 64
        df = 25e3
        times = np.arange(nt) / (nt * df)
        dt = times[1] - times[0]
        t_true = 12e-6
        env = np.exp(-0.5 * ((times - t_true) / (2 * dt)) ** 2)
        env[50] = 3.0  # spurious late peak (e.g. a multiple)
        traces = env.astype(np.complex64)[None]
        t_ref = np.array([t_true])
        free = pick_arrival_times(traces, times, df, t_ref)
        windowed = pick_arrival_times(traces, times, df, t_ref,
                                      search_halfwidth=4 * dt)
        assert abs(free[0] - times[50]) < dt        # grabbed the multiple
        assert abs(windowed[0] - t_true) < 0.25 * dt


class TestInversion:
    def test_recovers_smooth_blob(self):
        """End to end on exact (noise-free, forward-map) times: the
        reconstruction localizes the anomaly and shrinks the model error."""
        grid = Grid2D.centered(16e-3, 0.8e-3)
        vel_true = smooth_blob_phantom(grid, radius=5e-3, dc=60)
        xe, ye = _ring(24, 13e-3)
        pos = np.stack([xe, ye], axis=1).astype(np.float32)
        ti, ri = np.nonzero(~np.eye(24, dtype=bool))
        tx, rx = pos[ti], pos[ri]
        t_obs = fetch(straight_ray_times((1.0 / vel_true).astype(np.float32),
                                         tx, rx, grid))
        vel, relres = invert_travel_times(t_obs, tx, rx, grid,
                                          c_ref=1500.0, cg_iters=200)
        vel = fetch(vel)
        assert float(relres) < 1e-3
        rmse0 = np.sqrt(np.mean((vel_true - 1500.0) ** 2))
        rmse = np.sqrt(np.mean((vel_true - vel) ** 2))
        assert rmse < 0.4 * rmse0
        # anomaly localized: recovered perturbation concentrates in the blob
        X, Y = grid.meshgrid()
        inside = (X ** 2 + Y ** 2) < (4e-3) ** 2
        outside = (X ** 2 + Y ** 2) > (8e-3) ** 2
        dv = vel - 1500.0
        assert dv[inside].mean() > 10 * np.abs(dv[outside]).mean()
        assert dv[inside].mean() > 0.5 * 60

    def test_invert_dataset_c_init_map(self):
        """invert_dataset accepts a starting-model MAP (the travel-time
        tomogram's consumer path) and validates its shape."""
        from waveforminversionust_tpu import (AcquisitionConfig, FWIConfig,
                                              SolverConfig)
        from waveforminversionust_tpu.data.synthesize import \
            synthesize_ring_dataset
        from waveforminversionust_tpu.fwi.runner import invert_dataset

        grid = Grid2D.centered(12e-3, 0.8e-3)
        acq_cfg = AcquisitionConfig(num_elements=8, radius=9e-3,
                                    num_excluded_each_side=1)
        solver = SolverConfig(pml=PMLConfig(l_pml=2.4e-3))
        vel_true = smooth_blob_phantom(grid, radius=4e-3, dc=30)
        ds = synthesize_ring_dataset(vel_true, grid, acq_cfg, f=350e3,
                                     solver=solver, seed=0)
        fwi = FWIConfig(num_iterations=2)
        res_h = invert_dataset(ds, grid=grid, acquisition=acq_cfg,
                               solver=solver, fwi=fwi)
        res_m = invert_dataset(ds, grid=grid, acquisition=acq_cfg,
                               solver=solver, fwi=fwi, c_init=vel_true)
        # the true-model start is (near-)converged: far lower misfit
        assert res_m.metrics["loss"][0] < 0.1 * res_h.metrics["loss"][0]
        with pytest.raises(ValueError, match="c_init shape"):
            invert_dataset(ds, grid=grid, acquisition=acq_cfg, solver=solver,
                           fwi=fwi, c_init=np.ones((5, 5), np.float32))

    @pytest.mark.slow
    def test_traveltime_init_full_chain(self):
        """Waveform traces -> picks -> starting model: the init must beat
        the homogeneous start against the true model."""
        grid = Grid2D.centered(14e-3, 0.7e-3)
        vel_true = smooth_blob_phantom(grid, radius=5e-3, dc=80)
        from waveforminversionust_tpu.config import AcquisitionConfig
        td = synthesize_time_domain_dataset(
            vel_true, grid,
            acquisition=AcquisitionConfig(num_elements=24, radius=11e-3),
            f_low=0.15e6, f_high=0.45e6, df=0.0125e6,
            solver=SolverConfig(pml=PMLConfig(l_pml=2.1e-3)))
        td = direct_arrival_gate(td, pre=2e-6, post=4e-6, taper=1.5e-6)
        c0 = traveltime_init(td, grid, num_excluded_each_side=3,
                             c_ref=1500.0, clip_velocity=(1400.0, 1700.0))
        assert c0.shape == grid.shape
        rmse_h = np.sqrt(np.mean((vel_true - 1500.0) ** 2))
        rmse_tt = np.sqrt(np.mean((vel_true - c0) ** 2))
        assert rmse_tt < 0.75 * rmse_h
        # the anomaly is found where it is
        X, Y = grid.meshgrid()
        inside = (X ** 2 + Y ** 2) < (4e-3) ** 2
        assert (c0 - 1500.0)[inside].mean() > 15.0
