"""3D eikonal + 3D travel-time tomography tests (fwi/eikonal3d.py,
fwi/traveltime3d.py). Oracles as in test_eikonal.py: the homogeneous
medium and the constant-gradient medium v = v0 + b*(z - z0) (the analytic
two-point time T = (1/b) acosh(1 + b^2 r^2 / (2 v1 v2)) holds in any
dimension for a medium varying along one coordinate)."""

import numpy as np
import pytest

from waveforminversionust_tpu.fwi.eikonal3d import (
    eikonal_receiver_times_3d, eikonal_solve_3d, eikonal_solve_batch_3d,
    trace_rays_3d)
from waveforminversionust_tpu.fwi.traveltime3d import (
    _mean_slowness_3d, invert_travel_times_3d, invert_travel_times_bent_3d,
    straight_ray_times_3d)
from waveforminversionust_tpu.models.grid3d import Grid3D
from waveforminversionust_tpu.utils.host import fetch


def _grad_medium(grid, v0=1500.0, b=4000.0):
    z = grid.z0 + np.arange(grid.nz) * grid.dz
    vel = (v0 + b * (z[:, None, None] - grid.z0)) * np.ones(
        (1, grid.ny, grid.nx))

    def t_exact(a, c):
        v1 = v0 + b * (a[2] - grid.z0)
        v2 = v0 + b * (c[2] - grid.z0)
        r2 = float(np.sum((np.asarray(a) - np.asarray(c)) ** 2))
        return np.arccosh(1.0 + b * b * r2 / (2.0 * v1 * v2)) / b

    return (1.0 / vel).astype(np.float32), t_exact


class TestEikonal3D:
    def test_homogeneous_matches_r_times_s(self):
        grid = Grid3D.centered(20e-3, 1e-3)
        s = np.full(grid.shape, 1.0 / 1500.0, np.float32)
        src = np.array([-15e-3, 4e-3, -6e-3], np.float32)
        t = fetch(eikonal_solve_3d(s, src, grid))
        Z, Y, X = grid.meshgrid()
        exact = np.sqrt((X - src[0]) ** 2 + (Y - src[1]) ** 2
                        + (Z - src[2]) ** 2) / 1500.0
        # first-order upwind: O(h), worst along space diagonals
        assert np.abs(t - exact).max() < 2.0 * grid.dx / 1500.0

    def test_gradient_medium_receiver_times(self):
        grid = Grid3D.centered(25e-3, 0.5e-3)
        s, t_exact = _grad_medium(grid)
        src = np.array([-20e-3, 0.0, -15e-3], np.float32)
        rxs = np.array([[20e-3, 0.0, -15e-3], [15e-3, 5e-3, 10e-3],
                        [-5e-3, -8e-3, 20e-3]], np.float32)
        tf = eikonal_solve_batch_3d(s, src[None], grid)
        te = fetch(eikonal_receiver_times_3d(tf, np.zeros(3, np.int32),
                                             rxs, grid))
        T = np.array([t_exact(src, r) for r in rxs])
        assert np.abs(te / T - 1.0).max() < 2e-2

    def test_gradient_medium_bent_path_integral(self):
        """Fermat stationarity: bent path integrals are far tighter than
        the O(h) field itself, and can only overestimate."""
        grid = Grid3D.centered(25e-3, 0.5e-3)
        s, t_exact = _grad_medium(grid)
        src = np.array([-20e-3, 0.0, -15e-3], np.float32)
        rxs = np.array([[20e-3, 0.0, -15e-3], [15e-3, 5e-3, 10e-3],
                        [-5e-3, -8e-3, 20e-3]], np.float32)
        tf = eikonal_solve_batch_3d(s, src[None], grid)
        pts, lengths = trace_rays_3d(tf, np.zeros(3, np.int32),
                                     np.tile(src, (3, 1)), rxs, grid,
                                     n_steps=400, step=0.25e-3,
                                     n_samples=256)
        t_bent = fetch(lengths) * fetch(_mean_slowness_3d(s, pts, grid))
        T = np.array([t_exact(src, r) for r in rxs])
        err = t_bent / T - 1.0
        assert np.abs(err).max() < 4e-3
        assert err.min() > -1.5e-3


class TestTomography3D:
    def _setup(self, amp):
        grid = Grid3D.centered(16e-3, 0.8e-3)

        Z, Y, X = grid.meshgrid()
        r2 = (X ** 2 + Y ** 2 + Z ** 2) / (6e-3) ** 2
        vel_true = (1500.0 * (1.0 + amp * np.exp(-r2))).astype(np.float32)

        # two stacked rings (a tiny cylinder array)
        ne, R = 12, 13e-3
        th = 2 * np.pi * np.arange(ne) / ne
        ring = np.stack([R * np.cos(th), R * np.sin(th)], 1)
        pos = np.concatenate([
            np.concatenate([ring, np.full((ne, 1), -4e-3)], 1),
            np.concatenate([ring, np.full((ne, 1), 4e-3)], 1),
        ]).astype(np.float32)
        n = len(pos)
        ti, ri = np.nonzero(~np.eye(n, dtype=bool))
        return grid, vel_true, pos, pos[ti], pos[ri], ti

    def test_straight_recovers_blob(self):
        grid, vel_true, _, tx, rx, _ = self._setup(amp=0.04)
        t_obs = fetch(straight_ray_times_3d(
            (1.0 / vel_true).astype(np.float32), tx, rx, grid))
        vel, relres = invert_travel_times_3d(t_obs, tx, rx, grid,
                                             c_ref=1500.0, cg_iters=150)
        vel = fetch(vel)
        assert float(relres) < 1e-2
        rmse0 = np.sqrt(np.mean((vel_true - 1500.0) ** 2))
        rmse = np.sqrt(np.mean((vel_true - vel) ** 2))
        # two rings give sparse z-coverage: 0.57x measured; gate at 0.65x
        assert rmse < 0.65 * rmse0
        # anomaly found where it is (center voxel region)
        c = tuple(np.array(grid.shape) // 2)
        assert vel[c] - 1500.0 > 0.5 * (vel_true[c] - 1500.0)

    @pytest.mark.slow
    def test_bent_3d_beats_straight_at_strong_contrast(self):
        """Bent passes at a 15 % offset 3D inclusion under a 4-ring
        staggered cylinder array: better model RMSE AND exact peak
        recovery where straight rays underestimate (second-order contrast
        error). NOTE the acquisition matters: on a resolution-starved
        geometry (2 stacked rings, weak centered blob) the bent passes fit
        the data better but volume RMSE can worsen — tomography only
        resolves what rays cover (measured 9.4 vs 7.9 on that case)."""
        grid = Grid3D.centered(16e-3, 0.8e-3)
        Z, Y, X = grid.meshgrid()
        r2 = ((X - 2e-3) ** 2 + (Y + 1.5e-3) ** 2 + Z ** 2) / (5e-3) ** 2
        vel_true = (1500.0 * (1.0 + 0.15 * np.exp(-r2))).astype(np.float32)

        ne, R = 12, 13e-3
        th0 = 2 * np.pi * np.arange(ne) / ne
        rings = []
        for k, z in enumerate((-6e-3, -2e-3, 2e-3, 6e-3)):
            th = th0 + (np.pi / ne) * (k % 2)   # stagger alternate rings
            rings.append(np.stack([R * np.cos(th), R * np.sin(th),
                                   np.full(ne, z)], 1))
        pos = np.concatenate(rings).astype(np.float32)
        n = len(pos)
        ti, ri = np.nonzero(~np.eye(n, dtype=bool))
        tx, rx = pos[ti], pos[ri]

        sf = (1.0 / vel_true).astype(np.float32)
        tf = eikonal_solve_batch_3d(sf, pos, grid)
        pts, lengths = trace_rays_3d(tf, ti.astype(np.int32), tx, rx, grid,
                                     n_steps=200, step=0.4e-3,
                                     n_samples=256)
        t_obs = fetch(lengths) * fetch(_mean_slowness_3d(sf, pts, grid))

        v_str, _ = invert_travel_times_3d(t_obs, tx, rx, grid,
                                          c_ref=1500.0, cg_iters=150)
        v_bent, _ = invert_travel_times_bent_3d(
            t_obs, tx, rx, grid, c_ref=1500.0, n_outer=3, cg_iters=150)
        v_str, v_bent = fetch(v_str), fetch(v_bent)

        def rmse(v):
            return np.sqrt(np.mean((v - vel_true) ** 2))

        # measured: bent 3.58 vs straight 4.01; peak 1723.6 vs 1691.5
        # (true 1723.5)
        assert rmse(v_bent) < rmse(v_str)
        peak_true = vel_true.max() - 1500.0
        assert v_bent.max() - 1500.0 > v_str.max() - 1500.0
        assert v_bent.max() - 1500.0 > 0.9 * peak_true
