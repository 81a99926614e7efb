"""Eikonal solver + bent-ray tomography tests (fwi/eikonal.py,
fwi/traveltime.py::invert_travel_times_bent).

Physics oracles: the homogeneous medium (T = r * s exactly) and the
constant-gradient medium v = v0 + b*(y - y0), whose two-point travel time
is analytic: T = (1/b) * acosh(1 + b^2 r^2 / (2 v1 v2)) (circular Fermat
rays). The reference has no travel-time machinery at all (it starts FWI
homogeneous: fwi_script.py:90, FrequencyDomainFWI.m:46).
"""

import numpy as np
import pytest

from waveforminversionust_tpu import Grid2D
from waveforminversionust_tpu.fwi.eikonal import (
    eikonal_receiver_times, eikonal_solve, eikonal_solve_batch, trace_rays)
from waveforminversionust_tpu.fwi.traveltime import (
    _mean_slowness, invert_travel_times, invert_travel_times_bent)
from waveforminversionust_tpu.utils.host import fetch


def _grad_medium(grid, v0=1500.0, b=4000.0):
    """v = v0 + b * (y - y0) and its analytic two-point travel time."""
    y = grid.y0 + np.arange(grid.ny) * grid.dy
    vel = (v0 + b * (y[:, None] - grid.y0)) * np.ones((1, grid.nx))

    def t_exact(a, c):
        v1 = v0 + b * (a[1] - grid.y0)
        v2 = v0 + b * (c[1] - grid.y0)
        r2 = float(np.sum((np.asarray(a) - np.asarray(c)) ** 2))
        return np.arccosh(1.0 + b * b * r2 / (2.0 * v1 * v2)) / b

    return (1.0 / vel).astype(np.float32), t_exact


class TestEikonalSolve:
    def test_homogeneous_matches_r_times_s(self):
        grid = Grid2D.centered(40e-3, 1e-3)
        s = np.full(grid.shape, 1.0 / 1500.0, np.float32)
        src = np.array([-30e-3, 5e-3], np.float32)
        t = fetch(eikonal_solve(s, src, grid))
        X, Y = grid.meshgrid()
        exact = np.hypot(X - src[0], Y - src[1]) / 1500.0
        # first-order upwind: O(h) error, worst along diagonals
        assert np.abs(t - exact).max() < 1.5 * grid.dx / 1500.0

    def test_gradient_medium_receiver_times(self):
        grid = Grid2D.centered(50e-3, 0.5e-3)
        s, t_exact = _grad_medium(grid)
        src = np.array([-40e-3, -30e-3], np.float32)
        rxs = np.array([[40e-3, -30e-3], [30e-3, 20e-3], [-10e-3, 40e-3]],
                       np.float32)
        tf = eikonal_solve_batch(s, src[None], grid)
        te = fetch(eikonal_receiver_times(tf, np.zeros(3, np.int32),
                                          rxs, grid))
        T = np.array([t_exact(src, r) for r in rxs])
        assert np.abs(te / T - 1.0).max() < 1.5e-2

    def test_monotone_in_slowness(self):
        """Slower medium -> strictly later arrivals (comparison principle)."""
        grid = Grid2D.centered(20e-3, 1e-3)
        src = np.array([0.0, 0.0], np.float32)
        t1 = fetch(eikonal_solve(
            np.full(grid.shape, 1 / 1500.0, np.float32), src, grid))
        t2 = fetch(eikonal_solve(
            np.full(grid.shape, 1 / 1400.0, np.float32), src, grid))
        assert (t2 >= t1 - 1e-12).all()
        assert t2[0, 0] > t1[0, 0]


class TestTraceRays:
    def test_homogeneous_rays_are_straight(self):
        grid = Grid2D.centered(40e-3, 1e-3)
        s = np.full(grid.shape, 1.0 / 1500.0, np.float32)
        src = np.array([-30e-3, 0.0], np.float32)
        rxs = np.array([[30e-3, 8e-3], [0.0, 35e-3]], np.float32)
        tf = eikonal_solve_batch(s, src[None], grid)
        pts, lengths = trace_rays(tf, np.zeros(2, np.int32),
                                  np.tile(src, (2, 1)), rxs, grid,
                                  n_steps=300, step=0.5e-3)
        pts, lengths = fetch(pts), fetch(lengths)
        d = np.hypot(rxs[:, 0] - src[0], rxs[:, 1] - src[1])
        np.testing.assert_allclose(lengths, d, rtol=2e-2)
        for i in range(2):
            ab = (rxs[i] - src) / d[i]
            rel = pts[i] - src
            dev = np.abs(rel[:, 0] * ab[1] - rel[:, 1] * ab[0])
            # within ~1.5 cells of the chord (upwind-gradient kinks)
            assert dev.max() < 1.6e-3

    def test_gradient_medium_bent_path_integral(self):
        """Fermat-path slowness integrals reproduce the analytic times to
        ~0.2 % — far tighter than the O(h) eikonal field itself, because
        the time functional is stationary in the path (Fermat)."""
        grid = Grid2D.centered(50e-3, 0.5e-3)
        s, t_exact = _grad_medium(grid)
        src = np.array([-40e-3, -30e-3], np.float32)
        rxs = np.array([[40e-3, -30e-3], [30e-3, 20e-3], [-10e-3, 40e-3]],
                       np.float32)
        tf = eikonal_solve_batch(s, src[None], grid)
        pts, lengths = trace_rays(tf, np.zeros(3, np.int32),
                                  np.tile(src, (3, 1)), rxs, grid,
                                  n_steps=800, step=0.25e-3, n_samples=512)
        t_bent = fetch(lengths) * fetch(_mean_slowness(s, pts, grid))
        T = np.array([t_exact(src, r) for r in rxs])
        err = t_bent / T - 1.0
        assert np.abs(err).max() < 2.5e-3
        # Fermat: a path integral can only overestimate (up to quadrature)
        assert err.min() > -1e-3


class TestBentRayTomography:
    @pytest.mark.slow
    def test_bent_beats_straight_at_strong_contrast(self):
        """At a 12 % inclusion, straight rays underestimate the anomaly
        peak (second-order contrast error); the bent-ray passes recover
        it. Observed times are bent path integrals on a 2x finer grid
        (no inverse crime)."""
        from waveforminversionust_tpu.models.acquisition import \
            acceptance_mask

        gf = Grid2D.centered(50e-3, 0.5e-3)    # truth / data grid
        gi = Grid2D.centered(50e-3, 1.0e-3)    # inversion grid

        def model(g, amp=0.12):
            X, Y = g.meshgrid()
            r2 = ((X - 7e-3) ** 2 + (Y + 4e-3) ** 2) / (15e-3) ** 2
            return (1500.0 * (1.0 + amp * np.exp(-r2))).astype(np.float32)

        vf, vi_true = model(gf), model(gi)
        sf = (1.0 / vf).astype(np.float32)
        ne, R = 16, 42e-3
        th = 2 * np.pi * np.arange(ne) / ne
        pos = np.stack([R * np.cos(th), R * np.sin(th)], 1).astype(np.float32)
        ti, ri = np.nonzero(acceptance_mask(ne, 2))
        tx, rx = pos[ti], pos[ri]

        tfields = eikonal_solve_batch(sf, pos, gf)
        pts, lengths = trace_rays(tfields, ti.astype(np.int32), tx, rx, gf,
                                  n_steps=600, step=0.25e-3, n_samples=512)
        t_obs = fetch(lengths) * fetch(_mean_slowness(sf, pts, gf))

        v_str, _ = invert_travel_times(t_obs, tx, rx, gi, c_ref=1500.0,
                                       lam_smooth=1.0)
        v_bent, relres = invert_travel_times_bent(
            t_obs, tx, rx, gi, c_ref=1500.0, lam_smooth=1.0, n_outer=3,
            cg_iters=200)
        v_str, v_bent = fetch(v_str), fetch(v_bent)
        assert float(relres) < 2e-2

        def rmse(v):
            return np.sqrt(np.mean((v - vi_true) ** 2))

        assert rmse(v_bent) <= rmse(v_str)
        # peak-amplitude recovery is where bending matters
        peak_true = vi_true.max() - 1500.0
        assert v_bent.max() - 1500.0 > v_str.max() - 1500.0
        assert v_bent.max() - 1500.0 > 0.85 * peak_true
