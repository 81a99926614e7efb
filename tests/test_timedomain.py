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


class TestTimeDomainAcquisition:
    """Broadband (tx, rx, t) acquisition -> frequency extraction -> FWI:
    the workflow the reference performs externally (RecordedData.mat arrives
    already frequency-extracted), done TPU-natively end to end."""

    GRID = Grid2D.centered(12e-3, 1.0e-3)
    ACQ_KW = dict(f_low=0.2e6, f_high=0.3e6, df=0.05e6, seed=5)

    def _acq_cfg(self):
        from waveforminversionust_tpu import AcquisitionConfig
        return AcquisitionConfig(num_elements=8, radius=9e-3)

    def test_extraction_inverts_synthesis_exactly(self):
        """Comb orthogonality: extracting a comb line from the traces
        reproduces the directly-synthesized frequency-domain dataset."""
        from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
        from waveforminversionust_tpu.data.timedomain import (
            synthesize_time_domain_dataset, timedomain_to_ring_datasets)

        vel = smooth_blob_phantom(self.GRID, radius=4e-3, dc=30)
        solver = SolverConfig(pml=PMLConfig(l_pml=2e-3))
        td = synthesize_time_domain_dataset(vel, self.GRID, self._acq_cfg(),
                                            solver=solver, **self.ACQ_KW)
        assert td.traces.shape == (8, 8, 4 * len(td.freqs))
        ds = timedomain_to_ring_datasets(td, [0.25e6])[0.25e6]
        direct = synthesize_ring_dataset(vel, self.GRID, self._acq_cfg(),
                                         f=0.25e6, solver=solver, seed=5)
        np.testing.assert_allclose(
            ds.rec_data, direct.rec_data,
            atol=1e-4 * np.abs(direct.rec_data).max())

    def test_offcomb_deconvolution_raises(self):
        from waveforminversionust_tpu.data.timedomain import (
            synthesize_time_domain_dataset, timedomain_to_ring_datasets)
        import pytest

        vel = np.full(self.GRID.shape, 1500.0, np.float32)
        td = synthesize_time_domain_dataset(
            vel, self.GRID, self._acq_cfg(),
            solver=SolverConfig(pml=PMLConfig(l_pml=2e-3)), **self.ACQ_KW)
        with pytest.raises(ValueError, match="comb"):
            timedomain_to_ring_datasets(td, [0.26e6])

    def test_real_trace_extraction_is_half_scale(self):
        """One-sided extraction of a REAL signal returns spectrum*REC/2 —
        the scale the FWI source estimate absorbs. Pure comb math."""
        from waveforminversionust_tpu.data.timedomain import extract_frequency_data

        rng = np.random.default_rng(0)
        df, nt = 5e4, 16
        freqs = (4 + np.arange(3)) * df          # comb lines 4, 5, 6
        times = np.arange(nt) / (nt * df)
        w = np.array([0.5, 1.0, 0.5])
        rec = (rng.standard_normal((3, 2, 2))
               + 1j * rng.standard_normal((3, 2, 2)))
        traces = np.einsum(
            "tf,f...->...t",
            np.exp(2j * np.pi * times[:, None] * freqs[None, :]) * (w * df),
            rec)
        got = extract_frequency_data(np.real(traces), times, freqs[1], df)
        np.testing.assert_allclose(got[0], 0.5 * w[1] * df * rec[1] / df,
                                   atol=1e-12)

    def test_timedomain_to_fwi_end_to_end(self):
        """Broadband traces -> extracted {f: dataset} (NO deconvolution: the
        per-shot source estimate absorbs the transmit spectrum) -> two-stage
        continuation inversion; misfit drops within each stage."""
        from waveforminversionust_tpu import (AcquisitionConfig,
                                              ContinuationConfig, FWIConfig)
        from waveforminversionust_tpu.data.timedomain import (
            synthesize_time_domain_dataset, timedomain_to_ring_datasets)
        from waveforminversionust_tpu.fwi.runner import invert_dataset
        from waveforminversionust_tpu.models.acquisition import (ring_positions,
                                                                 snap_to_grid)

        acq_cfg = AcquisitionConfig(num_elements=32, radius=18e-3,
                                    num_excluded_each_side=5)
        solver = SolverConfig(pml=PMLConfig(l_pml=4e-3))
        coarse = Grid2D.centered(24e-3, 0.8e-3)
        xe, ye = ring_positions(acq_cfg.num_elements, acq_cfg.radius)
        xi, yi = snap_to_grid(coarse, xe, ye)
        xs, ys = coarse.x[xi], coarse.y[yi]
        fine = Grid2D.centered(24e-3, 0.4e-3)
        true_vel = smooth_blob_phantom(fine, radius=8e-3, dc=30)

        td = synthesize_time_domain_dataset(
            true_vel, fine, acq_cfg, f_low=0.12e6, f_high=0.2e6, df=0.04e6,
            solver=solver, seed=3, x_elem=xs, y_elem=ys)
        datasets = timedomain_to_ring_datasets(td, [0.12e6, 0.2e6],
                                               deconvolve=False)
        res = invert_dataset(
            datasets, grid=coarse, acquisition=acq_cfg, solver=solver,
            fwi=FWIConfig(c_init=1500.0),
            continuation=ContinuationConfig(frequencies=(0.12e6, 0.2e6),
                                            iterations_per_frequency=2))
        loss = res.metrics["loss"]
        assert np.all(np.isfinite(loss)) and loss.shape == (4,)
        assert loss[1] <= loss[0] and loss[3] <= loss[2]
        # the reconstruction moves toward the true (blob) anomaly
        from waveforminversionust_tpu.models.phantom import smooth_blob_phantom as blob
        truth_c = blob(coarse, radius=8e-3, dc=30)
        err0 = np.abs(1500.0 - truth_c).mean()
        err1 = np.abs(res.velocity - truth_c).mean()
        assert err1 < err0

    def test_direct_arrival_gate(self):
        """The gate passes energy around each pair's straight-ray arrival
        and suppresses late energy; gated extraction still inverts through
        the source estimate (the scale/convolution it introduces is
        per-shot-absorbable)."""
        from waveforminversionust_tpu.data.timedomain import (
            TimeDomainDataset, direct_arrival_gate)

        # synthetic traces: a direct-arrival Gaussian pulse + a late echo
        ne, nt = 6, 200
        rng = np.random.default_rng(2)
        theta = 2 * np.pi * np.arange(ne) / ne
        xc, yc = 9e-3 * np.cos(theta), 9e-3 * np.sin(theta)
        # times span exactly one comb period 1/df (the dataclass invariant)
        df = 2.5e4
        times = np.arange(nt) / (nt * df)                     # [0, 40 us)
        pos = np.stack([xc, yc], 1)
        dist = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
        t_arr = dist / 1500.0
        direct = np.exp(-((times[None, None] - t_arr[..., None]) / 1e-6) ** 2)
        echo = np.exp(-((times[None, None]
                         - (t_arr[..., None] + 20e-6)) / 1e-6) ** 2)
        traces = (direct + 0.7 * echo).astype(np.complex64)
        td = TimeDomainDataset(
            x=np.zeros(2), y=np.zeros(2), c=np.zeros((2, 2)),
            x_circ=xc, y_circ=yc, freqs=np.array([2e5]), df=df,
            spectrum=np.ones(1), times=times, traces=traces)

        gated = direct_arrival_gate(td, c_ref=1500.0, pre=3e-6, post=5e-6,
                                    taper=2e-6)
        # off-diagonal pairs (nonzero arrival separation from the echo):
        # direct energy preserved, echo suppressed
        m = ~np.eye(ne, dtype=bool)
        keep = np.abs(gated.traces[m] * np.conj(direct[m])).sum()
        ref = np.abs(direct[m] * np.conj(direct[m])).sum()
        assert keep > 0.9 * ref
        late = np.abs(times[None, None] - (t_arr[..., None] + 20e-6)) < 3e-6
        assert np.abs(gated.traces[m][late[m]]).max() < 1e-3

    def test_direct_arrival_gate_wraps_period(self):
        """Arrivals beyond one comb period must gate at t_arr mod (1/df):
        the periodic IDTFT synthesis places them there. A 110 mm ring
        (the reference geometry) reaches ~147 us separations on a 40 us
        record — an unwrapped gate would zero those traces entirely."""
        from waveforminversionust_tpu.data.timedomain import (
            TimeDomainDataset, direct_arrival_gate)

        ne, nt, df = 8, 400, 2.5e4
        period = 1.0 / df                                     # 40 us
        theta = 2 * np.pi * np.arange(ne) / ne
        xc, yc = 110e-3 * np.cos(theta), 110e-3 * np.sin(theta)
        times = np.arange(nt) / (nt * df)
        pos = np.stack([xc, yc], 1)
        dist = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
        t_wrap = np.mod(dist / 1500.0, period)                # where the
        # periodic synthesis actually places the arrival
        direct = np.exp(
            -((times[None, None] - t_wrap[..., None]) / 1e-6) ** 2)
        td = TimeDomainDataset(
            x=np.zeros(2), y=np.zeros(2), c=np.zeros((2, 2)),
            x_circ=xc, y_circ=yc, freqs=np.array([2e5]), df=df,
            spectrum=np.ones(1), times=times,
            traces=direct.astype(np.complex64))

        gated = direct_arrival_gate(td, c_ref=1500.0, pre=3e-6, post=5e-6,
                                    taper=2e-6)
        m = ~np.eye(ne, dtype=bool)
        # the majority of ring pairs exceed one period — the gate must
        # still pass their (wrapped) direct energy
        assert (dist[m] / 1500.0 > period).mean() > 0.5
        keep = np.abs(gated.traces[m] * np.conj(direct[m])).sum()
        ref = np.abs(direct[m] * np.conj(direct[m])).sum()
        assert keep > 0.9 * ref

        # hard gate (taper=0) is a finite 0/1 window, not NaN
        hard = direct_arrival_gate(td, c_ref=1500.0, pre=3e-6, post=5e-6,
                                   taper=0.0)
        assert np.all(np.isfinite(hard.traces))
        keep_h = np.abs(hard.traces[m] * np.conj(direct[m])).sum()
        assert keep_h > 0.9 * ref

        # window wider than the period self-overlaps: rejected
        import pytest
        with pytest.raises(ValueError):
            direct_arrival_gate(td, pre=30e-6, post=30e-6, taper=2e-6)


def test_save_time_animation(tmp_path):
    """Animated wavefield playback (reference: TimeDomainSimulation.m:58-91
    renders a live imagesc movie; the framework writes it to a GIF)."""
    from waveforminversionust_tpu import viz

    grid = Grid2D.centered(12e-3, 1.0e-3)
    vel = np.full(grid.shape, 1500.0, np.float32)
    res = simulate_time_domain(
        vel, grid, element_idx=0, f_low=0.2e6, f_high=0.4e6, df=0.05e6,
        nt=8, num_elements=8, radius=9e-3,
        solver=SolverConfig(pml=PMLConfig(l_pml=2e-3)))
    out = str(tmp_path / "wave.gif")
    viz.save_time_animation(grid, res, out, fps=5, max_frames=6)
    data = open(out, "rb").read()
    assert data[:6] in (b"GIF87a", b"GIF89a") and len(data) > 1000
