"""End-to-end FWI tests: synthesize data on a fine grid (no inverse crime),
invert on a coarser grid, check that the misfit drops and the reconstruction
moves toward the truth — the quantitative version of the reference's visual
validation (SURVEY.md section 4)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from waveforminversionust_tpu import (AcquisitionConfig, FWIConfig, Grid2D,
                                      MomentumFormula, PMLConfig, SolverConfig,
                                      SolverMethod, StepSizeFormula,
                                      build_ring_acquisition)
from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
from waveforminversionust_tpu.fwi.lbfgs import run_lbfgs
from waveforminversionust_tpu.fwi.objective import build_fwi_data
from waveforminversionust_tpu.fwi.optimizers import nonlinear_cg
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom

F = 200e3
C0 = 1500.0

ACQ = AcquisitionConfig(num_elements=64, radius=18e-3,
                        num_excluded_each_side=7)
# The ring must sit OUTSIDE the absorbing layer: domain half-width 24 mm,
# ring 18 mm => PML thickness must be < 6 mm.
SOLVER = SolverConfig(pml=PMLConfig(l_pml=4e-3),
                      born_pml=PMLConfig(a0=20.0, l_pml=4e-3))


def _make_problem():
    """Small ring problem: 64 elements on an 18 mm ring, blob phantom.
    Synthesis grid 0.4 mm (121x121); inversion grid 0.8 mm (61x61) — no
    inverse crime. Element positions are snapped to the inversion grid first
    so both grids place them identically (see synthesize_ring_dataset)."""
    from waveforminversionust_tpu.models.acquisition import (ring_positions,
                                                             snap_to_grid)
    coarse = Grid2D.centered(24e-3, 0.8e-3)
    xe, ye = ring_positions(ACQ.num_elements, ACQ.radius)
    xi, yi = snap_to_grid(coarse, xe, ye)
    xs, ys = coarse.x[xi], coarse.y[yi]

    fine = Grid2D.centered(24e-3, 0.4e-3)
    true_vel = smooth_blob_phantom(fine, radius=8e-3, dc=30, c_bkgnd=C0)
    ds = synthesize_ring_dataset(true_vel, fine, ACQ, f=F, seed=3,
                                 solver=SOLVER, x_elem=xs, y_elem=ys)

    acq = build_ring_acquisition(coarse, ACQ, x_elem=ds.x_circ, y_elem=ds.y_circ)
    data = build_fwi_data(acq, ds.rec_data, F)
    true_on_coarse = smooth_blob_phantom(coarse, radius=8e-3, dc=30, c_bkgnd=C0)
    return coarse, data, true_on_coarse


@pytest.fixture(scope="module")
def problem():
    return _make_problem()


def _recon_error(vel, true_vel, grid, radius=13e-3):
    X, Y = grid.meshgrid()
    inside = np.hypot(X, Y) < radius
    return np.sqrt(np.mean((np.array(vel) - true_vel)[inside] ** 2))


class TestNonlinearCG:
    def test_misfit_decreases_and_recon_improves(self, problem):
        grid, data, true_vel = problem
        vel0 = jnp.full(grid.shape, C0, jnp.float32)
        res = nonlinear_cg(vel0, data, grid, SOLVER,
                           FWIConfig(num_iterations=6, c_init=C0))
        losses = np.array(res.metrics.loss)
        assert losses[-1] < 0.5 * losses[0], losses
        assert np.all(np.isfinite(losses))
        err0 = _recon_error(np.full(grid.shape, C0), true_vel, grid)
        err = _recon_error(res.velocity, true_vel, grid)
        assert err < 0.7 * err0, (err, err0)
        # fields returned for diagnostics have the right shape
        assert res.wavefield.shape == (64,) + grid.shape
        assert res.adjoint_field.shape == (64,) + grid.shape

    @pytest.mark.parametrize("momentum", list(MomentumFormula))
    def test_all_momentum_formulas_run(self, problem, momentum):
        grid, data, _ = problem
        vel0 = jnp.full(grid.shape, C0, jnp.float32)
        res = nonlinear_cg(vel0, data, grid, SOLVER,
                           FWIConfig(num_iterations=2, momentum=momentum))
        losses = np.array(res.metrics.loss)
        assert np.all(np.isfinite(losses))
        assert losses[-1] <= losses[0] * 1.05

    @pytest.mark.parametrize("step", list(StepSizeFormula))
    def test_all_step_formulas_run(self, problem, step):
        grid, data, _ = problem
        vel0 = jnp.full(grid.shape, C0, jnp.float32)
        res = nonlinear_cg(vel0, data, grid, SOLVER,
                           FWIConfig(num_iterations=2, step_size=step))
        assert np.all(np.isfinite(np.array(res.metrics.loss)))

    def test_illumination_preconditioning(self, problem):
        """FWIConfig(precondition="illumination") — the diagonal pseudo-
        Hessian scaling (absent from the reference). Measured on the real
        RecordedData workload: reaches the baseline's 10-iteration quality
        in 5 iterations; RMSE 13.41 -> 12.47 m/s with bilinear receivers
        (PERF_NOTES round 3). Here: the preconditioned inversion must
        converge (loss down, reconstruction toward truth) and produce a
        genuinely different trajectory from the raw gradient."""
        grid, data, true_vel = problem
        vel0 = jnp.full(grid.shape, C0, jnp.float32)
        fwi = FWIConfig(num_iterations=6, c_init=C0,
                        precondition="illumination")
        res = nonlinear_cg(vel0, data, grid, SOLVER, fwi)
        losses = np.array(res.metrics.loss)
        assert np.all(np.isfinite(losses))
        assert losses[-1] < 0.5 * losses[0], losses
        err0 = _recon_error(np.full(grid.shape, C0), true_vel, grid)
        err = _recon_error(res.velocity, true_vel, grid)
        assert err < 0.7 * err0, (err, err0)
        base = nonlinear_cg(vel0, data, grid, SOLVER,
                            FWIConfig(num_iterations=6, c_init=C0))
        dv = np.array(res.velocity) - np.array(base.velocity)
        assert np.linalg.norm(dv) > 1e-3 * np.linalg.norm(
            np.array(base.velocity) - C0)

    def test_born_solver_variant_runs(self):
        # Small dedicated problem: the Born solves are iterative (hundreds of
        # FFT pairs each), so keep this fixture tiny for suite runtime.
        import dataclasses
        acq_cfg = AcquisitionConfig(num_elements=16, radius=9e-3,
                                    num_excluded_each_side=2)
        solver = dataclasses.replace(
            SOLVER, method=SolverMethod.BORN,
            born_pml=PMLConfig(a0=20.0, l_pml=2.4e-3), tol=1e-4)
        grid = Grid2D.centered(12e-3, 0.8e-3)
        from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
        true_vel = smooth_blob_phantom(grid, radius=4e-3, dc=30, c_bkgnd=C0)
        ds = synthesize_ring_dataset(
            true_vel, grid, acq_cfg, f=F, seed=0,
            solver=dataclasses.replace(SOLVER, pml=PMLConfig(l_pml=2.4e-3)))
        acq = build_ring_acquisition(grid, acq_cfg, x_elem=ds.x_circ,
                                     y_elem=ds.y_circ)
        data = build_fwi_data(acq, ds.rec_data, F)
        vel0 = jnp.full(grid.shape, C0, jnp.float32)
        res = nonlinear_cg(vel0, data, grid, solver,
                           FWIConfig(num_iterations=2))
        losses = np.array(res.metrics.loss)
        assert np.all(np.isfinite(losses))
        assert losses[-1] < losses[0]


class TestFrozenFactor:
    """Frozen-factor CG (SolverConfig.refactor_every=K): factorize every
    K-th iteration, reuse the stale G with one refinement pass against the
    current operator in between. Real-chip ladder: K=2 is 0.0502 vs
    0.0538 s/iter with RMSE in the noise band; K>=3 loses loss
    monotonicity (PERF_NOTES round 3)."""

    def _split_problem(self):
        acq_cfg = AcquisitionConfig(num_elements=16, radius=15e-3,
                                    num_excluded_each_side=2)
        grid = Grid2D.centered(20e-3, 0.8e-3)
        solver = dataclasses.replace(SOLVER, split_complex=True,
                                     pml=PMLConfig(l_pml=3.2e-3))
        true_vel = smooth_blob_phantom(grid, radius=7e-3, dc=40, c_bkgnd=C0)
        ds = synthesize_ring_dataset(true_vel, grid, acq_cfg, f=300e3,
                                     seed=3, solver=solver)
        acq = build_ring_acquisition(grid, acq_cfg, x_elem=ds.x_circ,
                                     y_elem=ds.y_circ)
        data = build_fwi_data(acq, ds.rec_data, 300e3, split=True)
        return grid, data, solver

    def test_frozen_factor_tracks_exact_trajectory(self):
        grid, data, solver = self._split_problem()
        vel0 = jnp.full(grid.shape, C0, jnp.float32)
        fwi = FWIConfig(num_iterations=4)
        exact = nonlinear_cg(vel0, data, grid, solver, fwi)
        frozen = nonlinear_cg(
            vel0, data, grid,
            dataclasses.replace(solver, refactor_every=2), fwi)
        v_e, v_f = np.asarray(exact.velocity), np.asarray(frozen.velocity)
        upd = np.linalg.norm(v_e - np.asarray(vel0))
        rel = np.linalg.norm(v_f - v_e) / upd
        # one refinement pass leaves ~1% deviation in the velocity update
        assert rel < 5e-2, rel
        losses = np.asarray(frozen.metrics.loss)
        assert np.all(np.isfinite(losses)) and losses[-1] < losses[0]

    def test_bb_step_converges_like_line_search(self, problem):
        """StepSizeFormula.BB (curvature-scalar step, no third solve on
        valid iterations) converges comparably to the RESIDUAL linearized
        line search on the same problem, and composes with the
        frozen-factor carry (PERF_NOTES round 5)."""
        grid, data, true_vel = problem
        vel0 = jnp.full(grid.shape, C0, jnp.float32)
        ref = nonlinear_cg(vel0, data, grid, SOLVER,
                           FWIConfig(num_iterations=6))
        bb = nonlinear_cg(vel0, data, grid, SOLVER,
                          FWIConfig(num_iterations=6,
                                    step_size=StepSizeFormula.BB))
        l_ref = np.array(ref.metrics.loss)
        l_bb = np.array(bb.metrics.loss)
        assert np.all(np.isfinite(l_bb))
        # Iteration 0 runs the linearized fallback -> identical first loss.
        assert l_bb[0] == pytest.approx(l_ref[0], rel=1e-5)
        assert l_bb[-1] < 0.75 * l_bb[0], l_bb
        err_ref = _recon_error(ref.velocity, true_vel, grid)
        err_bb = _recon_error(bb.velocity, true_vel, grid)
        # BB's nonmonotone steps trail the exact linearized search by
        # ~1-2 iterations of progress at this budget (measured: the chip
        # A/B at the bench scale is the adopt-or-reject authority —
        # PERF_NOTES round 5); this pins convergence, not parity.
        assert err_bb < 1.6 * err_ref, (err_bb, err_ref)

    def test_bb_step_with_frozen_factor(self):
        grid, data, solver = self._split_problem()
        vel0 = jnp.full(grid.shape, C0, jnp.float32)
        res = nonlinear_cg(
            vel0, data, grid,
            dataclasses.replace(solver, refactor_every=2),
            FWIConfig(num_iterations=4, step_size=StepSizeFormula.BB))
        losses = np.asarray(res.metrics.loss)
        assert np.all(np.isfinite(losses)) and losses[-1] < losses[0]

    def test_frozen_factor_requires_split_banded(self, problem):
        grid, data, _ = problem  # native-complex data
        vel0 = jnp.full(grid.shape, C0, jnp.float32)
        with pytest.raises(ValueError, match="refactor_every"):
            nonlinear_cg(vel0, data, grid,
                         dataclasses.replace(SOLVER, refactor_every=2),
                         FWIConfig(num_iterations=1))


class TestLBFGS:
    def test_lbfgs_reduces_misfit(self, problem):
        grid, data, true_vel = problem
        vel0 = jnp.full(grid.shape, C0, jnp.float32)
        res = run_lbfgs(vel0, data, grid, SOLVER, num_iterations=5)
        losses = np.array(res.loss_history)
        assert np.all(np.isfinite(losses))
        assert losses[-1] < 0.8 * losses[0], losses
        err0 = _recon_error(np.full(grid.shape, C0), true_vel, grid)
        err = _recon_error(res.velocity, true_vel, grid)
        assert err < err0


class TestContinuation:
    def test_multifrequency_continuation(self, tmp_path):
        """Low-to-high frequency continuation through the runner improves on
        single-frequency inversion at the same total iteration count — the
        reference's stated future work made real."""
        import numpy as np
        from waveforminversionust_tpu import ContinuationConfig
        from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
        from waveforminversionust_tpu.fwi.runner import invert_dataset
        from waveforminversionust_tpu.models.acquisition import (ring_positions,
                                                                 snap_to_grid)
        from waveforminversionust_tpu.models.phantom import smooth_blob_phantom

        coarse = Grid2D.centered(24e-3, 0.8e-3)
        xe, ye = ring_positions(ACQ.num_elements, ACQ.radius)
        xi, yi = snap_to_grid(coarse, xe, ye)
        xs, ys = coarse.x[xi], coarse.y[yi]
        fine = Grid2D.centered(24e-3, 0.4e-3)
        true_vel_f = smooth_blob_phantom(fine, radius=8e-3, dc=30, c_bkgnd=C0)

        # broadband observations: one dataset per schedule frequency
        freqs = (120e3, 200e3)
        rec = {}
        for fq in freqs:
            ds = synthesize_ring_dataset(true_vel_f, fine, ACQ, f=fq, seed=3,
                                         solver=SOLVER, x_elem=xs, y_elem=ys)
            rec[fq] = ds

        # Multi-frequency inversion: warm-start each stage. Since rec_data
        # differs per frequency, run stages manually through invert_dataset
        # on a merged dataset is not possible; instead chain invert_dataset
        # per stage with c_init from the previous stage via callback state.
        from waveforminversionust_tpu import FWIConfig
        from waveforminversionust_tpu.fwi.objective import build_fwi_data
        from waveforminversionust_tpu.fwi.optimizers import nonlinear_cg
        from waveforminversionust_tpu.models.acquisition import build_ring_acquisition
        import jax.numpy as jnp

        acq = build_ring_acquisition(coarse, ACQ, x_elem=xs, y_elem=ys)
        vel = jnp.full(coarse.shape, C0, jnp.float32)
        for fq in freqs:
            data = build_fwi_data(acq, rec[fq].rec_data, fq)
            res = nonlinear_cg(vel, data, coarse, SOLVER,
                               FWIConfig(num_iterations=3))
            vel = res.velocity
        true_coarse = smooth_blob_phantom(coarse, radius=8e-3, dc=30,
                                          c_bkgnd=C0)
        err_cont = _recon_error(vel, true_coarse, coarse)

        # single-frequency at the high frequency, same total iterations
        data = build_fwi_data(acq, rec[200e3].rec_data, 200e3)
        res = nonlinear_cg(jnp.full(coarse.shape, C0, jnp.float32), data,
                           coarse, SOLVER, FWIConfig(num_iterations=6))
        err_single = _recon_error(res.velocity, true_coarse, coarse)

        err0 = _recon_error(np.full(coarse.shape, C0), true_coarse, coarse)
        assert err_cont < err0
        # continuation should not be (much) worse than single-frequency
        assert err_cont < err_single * 1.2, (err_cont, err_single)

    def test_runner_per_frequency_datasets(self):
        """invert_dataset accepts {frequency: dataset} for broadband data."""
        from waveforminversionust_tpu import ContinuationConfig, FWIConfig
        from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
        from waveforminversionust_tpu.fwi.runner import invert_dataset
        from waveforminversionust_tpu.models.acquisition import (ring_positions,
                                                                 snap_to_grid)
        from waveforminversionust_tpu.models.phantom import smooth_blob_phantom
        import numpy as np

        coarse = Grid2D.centered(24e-3, 0.8e-3)
        xe, ye = ring_positions(ACQ.num_elements, ACQ.radius)
        xi, yi = snap_to_grid(coarse, xe, ye)
        xs, ys = coarse.x[xi], coarse.y[yi]
        fine = Grid2D.centered(24e-3, 0.4e-3)
        true_vel_f = smooth_blob_phantom(fine, radius=8e-3, dc=30, c_bkgnd=C0)
        datasets = {
            float(fq): synthesize_ring_dataset(true_vel_f, fine, ACQ, f=fq,
                                               seed=3, solver=SOLVER,
                                               x_elem=xs, y_elem=ys)
            for fq in (120e3, 200e3)
        }
        res = invert_dataset(
            datasets, grid=coarse, acquisition=ACQ, solver=SOLVER,
            fwi=FWIConfig(c_init=C0),
            continuation=ContinuationConfig(frequencies=(120e3, 200e3),
                                            iterations_per_frequency=2))
        assert res.frequencies == (120e3, 200e3)
        assert np.all(np.isfinite(res.metrics["loss"]))
        assert res.metrics["loss"].shape == (4,)


class TestBilinearPlacement:
    def test_bilinear_removes_snapping_error(self):
        """With exact (bilinear) element placement, synthesis and inversion
        grids no longer need consistent snapping: cross-grid FWI with raw
        ring coordinates converges, where nearest snapping degrades
        (the pitfall documented in synthesize_ring_dataset)."""
        import numpy as np
        from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
        from waveforminversionust_tpu.fwi.objective import build_fwi_data
        from waveforminversionust_tpu.fwi.optimizers import nonlinear_cg
        from waveforminversionust_tpu.models.phantom import smooth_blob_phantom

        acq_cfg = dataclasses.replace(ACQ, interpolation="bilinear")
        fine = Grid2D.centered(24e-3, 0.4e-3)
        true_vel = smooth_blob_phantom(fine, radius=8e-3, dc=30, c_bkgnd=C0)
        # raw ring coordinates — NOT pre-snapped to either grid
        ds = synthesize_ring_dataset(true_vel, fine, acq_cfg, f=F, seed=3,
                                     solver=SOLVER)
        coarse = Grid2D.centered(24e-3, 0.8e-3)
        acq = build_ring_acquisition(coarse, acq_cfg, x_elem=ds.x_circ,
                                     y_elem=ds.y_circ)
        data = build_fwi_data(acq, ds.rec_data, F)
        assert data.rx_w is not None and data.rx_y.shape[-1] == 4
        vel0 = jnp.full(coarse.shape, C0, jnp.float32)
        res = nonlinear_cg(vel0, data, coarse, SOLVER,
                           FWIConfig(num_iterations=3))
        true_coarse = smooth_blob_phantom(coarse, radius=8e-3, dc=30,
                                          c_bkgnd=C0)
        err0 = _recon_error(np.full(coarse.shape, C0), true_coarse, coarse)
        err_bi = _recon_error(res.velocity, true_coarse, coarse)
        assert np.all(np.isfinite(np.asarray(res.metrics.loss)))
        # bilinear placement converges strongly (measured: 9.2 -> ~3 m/s)...
        assert err_bi < 0.5 * err0, (err_bi, err0)

        # ...where nearest snapping on the same raw coordinates DIVERGES
        acq_n = build_ring_acquisition(coarse, ACQ, x_elem=ds.x_circ,
                                       y_elem=ds.y_circ)
        data_n = build_fwi_data(acq_n, ds.rec_data, F)
        res_n = nonlinear_cg(vel0, data_n, coarse, SOLVER,
                             FWIConfig(num_iterations=3))
        err_near = _recon_error(res_n.velocity, true_coarse, coarse)
        assert err_bi < 0.5 * err_near, (err_bi, err_near)


class TestJointMultiFrequency:
    def test_joint_inversion_beats_single_frequency(self):
        """Joint multi-frequency CG (summed gradients/misfits over the
        frequency axis) — BASELINE config 3's source x frequency batch."""
        import numpy as np
        from waveforminversionust_tpu.fwi.multifreq import (
            nonlinear_cg_multifreq, stack_frequencies)
        from waveforminversionust_tpu.models.acquisition import (ring_positions,
                                                                 snap_to_grid)

        coarse = Grid2D.centered(24e-3, 0.8e-3)
        xe, ye = ring_positions(ACQ.num_elements, ACQ.radius)
        xi, yi = snap_to_grid(coarse, xe, ye)
        xs, ys = coarse.x[xi], coarse.y[yi]
        fine = Grid2D.centered(24e-3, 0.4e-3)
        true_vel_f = smooth_blob_phantom(fine, radius=8e-3, dc=30, c_bkgnd=C0)

        acq = build_ring_acquisition(coarse, ACQ, x_elem=xs, y_elem=ys)
        freqs = (120e3, 200e3)
        datas = []
        for fq in freqs:
            ds = synthesize_ring_dataset(true_vel_f, fine, ACQ, f=fq, seed=3,
                                         solver=SOLVER, x_elem=xs, y_elem=ys)
            datas.append(build_fwi_data(acq, ds.rec_data, fq))
        mf = stack_frequencies(datas)

        vel0 = jnp.full(coarse.shape, C0, jnp.float32)
        vel, metrics = nonlinear_cg_multifreq(vel0, mf, coarse, SOLVER,
                                              FWIConfig(num_iterations=4))
        losses = np.asarray(metrics.loss)
        assert np.all(np.isfinite(losses))
        assert losses[-1] < 0.5 * losses[0]

        true_coarse = smooth_blob_phantom(coarse, radius=8e-3, dc=30,
                                          c_bkgnd=C0)
        err0 = _recon_error(np.full(coarse.shape, C0), true_coarse, coarse)
        err_joint = _recon_error(vel, true_coarse, coarse)
        assert err_joint < 0.6 * err0, (err_joint, err0)


class TestCheckpointResume:
    def test_mid_stage_kill_and_resume_reproduces_trajectory(self, tmp_path,
                                                             monkeypatch):
        """A run killed mid-stage resumes from checkpoint_dir/latest and
        reproduces the uninterrupted loss trajectory and velocity
        (SURVEY.md section 5 'checkpointed outer iterations')."""
        from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
        from waveforminversionust_tpu.fwi.runner import invert_dataset
        from waveforminversionust_tpu.models.acquisition import (ring_positions,
                                                                 snap_to_grid)
        from waveforminversionust_tpu.utils import checkpoint as ckpt_mod

        coarse = Grid2D.centered(24e-3, 0.8e-3)
        xe, ye = ring_positions(ACQ.num_elements, ACQ.radius)
        xi, yi = snap_to_grid(coarse, xe, ye)
        xs, ys = coarse.x[xi], coarse.y[yi]
        fine = Grid2D.centered(24e-3, 0.4e-3)
        true_vel_f = smooth_blob_phantom(fine, radius=8e-3, dc=30, c_bkgnd=C0)
        ds = synthesize_ring_dataset(true_vel_f, fine, ACQ, f=F, seed=3,
                                     solver=SOLVER, x_elem=xs, y_elem=ys)
        fwi = FWIConfig(num_iterations=4)
        common = dict(grid=coarse, acquisition=ACQ, solver=SOLVER, fwi=fwi)

        res_full = invert_dataset(ds, **common)

        # Kill the run right after the first mid-stage checkpoint (2 of 4
        # iterations done).
        ckdir = str(tmp_path / "ck")
        orig_save = ckpt_mod.save_state
        calls = {"n": 0}

        def dying_save(path, state):
            orig_save(path, state)
            calls["n"] += 1
            if calls["n"] == 1:
                raise KeyboardInterrupt("simulated mid-run death")

        monkeypatch.setattr(ckpt_mod, "save_state", dying_save)
        with pytest.raises(KeyboardInterrupt):
            invert_dataset(ds, checkpoint_dir=ckdir, checkpoint_every=2,
                           **common)
        monkeypatch.setattr(ckpt_mod, "save_state", orig_save)
        assert calls["n"] == 1

        res_resumed = invert_dataset(ds, resume_from=str(tmp_path / "ck" /
                                                         "latest"),
                                     **common)

        np.testing.assert_allclose(res_resumed.metrics["loss"],
                                   res_full.metrics["loss"], rtol=1e-4)
        np.testing.assert_allclose(res_resumed.velocity, res_full.velocity,
                                   atol=1e-4 * float(np.abs(
                                       res_full.velocity).max()))

    def test_stage_boundary_resume(self, tmp_path):
        """A checkpoint landing exactly on a stage boundary resumes into the
        next stage with a fresh CG carry, matching the uninterrupted
        continuation run."""
        from waveforminversionust_tpu import ContinuationConfig
        from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
        from waveforminversionust_tpu.fwi.runner import invert_dataset
        from waveforminversionust_tpu.models.acquisition import (ring_positions,
                                                                 snap_to_grid)
        from waveforminversionust_tpu.utils.checkpoint import load_state

        coarse = Grid2D.centered(24e-3, 0.8e-3)
        xe, ye = ring_positions(ACQ.num_elements, ACQ.radius)
        xi, yi = snap_to_grid(coarse, xe, ye)
        xs, ys = coarse.x[xi], coarse.y[yi]
        fine = Grid2D.centered(24e-3, 0.4e-3)
        true_vel_f = smooth_blob_phantom(fine, radius=8e-3, dc=30, c_bkgnd=C0)
        freqs = (120e3, 200e3)
        rec = {fq: synthesize_ring_dataset(true_vel_f, fine, ACQ, f=fq,
                                           seed=3, solver=SOLVER,
                                           x_elem=xs, y_elem=ys)
               for fq in freqs}
        cont = ContinuationConfig(frequencies=freqs,
                                  iterations_per_frequency=2)
        common = dict(grid=coarse, acquisition=ACQ, solver=SOLVER,
                      fwi=FWIConfig(num_iterations=2), continuation=cont)

        res_full = invert_dataset(rec, **common)

        ckdir = str(tmp_path / "ck2")
        invert_dataset(rec, checkpoint_dir=ckdir, checkpoint_every=2,
                       **common)
        # Rewind the saved state to the end of stage 0 and resume.
        st = load_state(str(tmp_path / "ck2" / "latest"))
        assert int(st["stage"]) == 1 and int(st["iteration"]) == 2
        # Re-save a stage-boundary checkpoint for stage 0 by re-running the
        # first stage only.
        first = invert_dataset(rec, checkpoint_dir=str(tmp_path / "ck0"),
                               checkpoint_every=2, grid=coarse,
                               acquisition=ACQ, solver=SOLVER,
                               fwi=FWIConfig(num_iterations=2),
                               continuation=ContinuationConfig(
                                   frequencies=freqs[:1],
                                   iterations_per_frequency=2))
        res_resumed = invert_dataset(rec, resume_from=str(tmp_path / "ck0" /
                                                          "latest"),
                                     **common)
        np.testing.assert_allclose(
            res_resumed.metrics["loss"][-2:], res_full.metrics["loss"][-2:],
            rtol=1e-4)
        np.testing.assert_allclose(res_resumed.velocity, res_full.velocity,
                                   atol=1e-4 * float(np.abs(
                                       res_full.velocity).max()))


class TestLiveCallback:
    def test_live_callback_fires_at_reference_cadence(self, tmp_path):
        """live_every=1 reproduces the MATLAB driver's every-iteration
        redraw cadence (FrequencyDomainFWI.m:176-188): the callback fires
        once per CG iteration with the current velocity, and the chunked
        execution leaves the trajectory identical to the unchunked run."""
        from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
        from waveforminversionust_tpu.fwi.runner import invert_dataset
        from waveforminversionust_tpu.models.acquisition import (ring_positions,
                                                                 snap_to_grid)

        coarse = Grid2D.centered(24e-3, 0.8e-3)
        xe, ye = ring_positions(ACQ.num_elements, ACQ.radius)
        xi, yi = snap_to_grid(coarse, xe, ye)
        xs, ys = coarse.x[xi], coarse.y[yi]
        fine = Grid2D.centered(24e-3, 0.4e-3)
        true_vel_f = smooth_blob_phantom(fine, radius=8e-3, dc=30,
                                         c_bkgnd=C0)
        ds = synthesize_ring_dataset(true_vel_f, fine, ACQ, f=F, seed=3,
                                     solver=SOLVER, x_elem=xs, y_elem=ys)
        fwi = FWIConfig(num_iterations=3)
        common = dict(grid=coarse, acquisition=ACQ, solver=SOLVER, fwi=fwi)

        res_plain = invert_dataset(ds, **common)

        seen = []
        res_live = invert_dataset(
            ds, live_every=1,
            live_callback=lambda s, f, it, vel, m: seen.append(
                (s, it, np.asarray(vel).copy(), np.asarray(m.loss))),
            **common)

        assert [(s, it) for s, it, *_ in seen] == [(0, 1), (0, 2), (0, 3)]
        # each chunk reports exactly one iteration's metrics
        assert all(loss.shape == (1,) for *_, loss in seen)
        # chunking must not change the math
        np.testing.assert_allclose(seen[-1][2], np.asarray(res_plain.velocity),
                                   rtol=2e-6, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(res_live.metrics["loss"]),
            np.asarray(res_plain.metrics["loss"]), rtol=2e-5)


class TestJointMultifreqRunner:
    def test_runner_joint_multifreq(self, tmp_path):
        """invert_dataset(method='joint-multifreq') inverts all frequencies
        of a broadband mapping jointly and reduces the misfit."""
        from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
        from waveforminversionust_tpu.fwi.runner import invert_dataset
        from waveforminversionust_tpu.models.acquisition import (ring_positions,
                                                                 snap_to_grid)

        coarse = Grid2D.centered(24e-3, 0.8e-3)
        xe, ye = ring_positions(ACQ.num_elements, ACQ.radius)
        xi, yi = snap_to_grid(coarse, xe, ye)
        xs, ys = coarse.x[xi], coarse.y[yi]
        fine = Grid2D.centered(24e-3, 0.4e-3)
        true_vel_f = smooth_blob_phantom(fine, radius=8e-3, dc=30,
                                         c_bkgnd=C0)
        rec = {}
        for fq in (150e3, 250e3):
            rec[fq] = synthesize_ring_dataset(true_vel_f, fine, ACQ, f=fq,
                                              seed=3, solver=SOLVER,
                                              x_elem=xs, y_elem=ys)
        res = invert_dataset(rec, method="joint-multifreq", grid=coarse,
                             acquisition=ACQ, solver=SOLVER,
                             fwi=FWIConfig(num_iterations=4))
        losses = np.asarray(res.metrics["loss"])
        assert np.all(np.isfinite(losses))
        assert losses[-1] < 0.5 * losses[0], losses
        assert res.frequencies == (150e3, 250e3)


class TestWatchdog:
    def test_watchdog_neutral_when_clean(self, problem):
        """FWIConfig.reject_increase: on a clean monotone run the watchdog
        never triggers — trajectory identical to the unguarded run; also
        composes with BB and the frozen-factor carry (PERF_NOTES r5)."""
        grid, data, _ = problem
        vel0 = jnp.full(grid.shape, C0, jnp.float32)
        r0 = nonlinear_cg(vel0, data, grid, SOLVER,
                          FWIConfig(num_iterations=4))
        r1 = nonlinear_cg(vel0, data, grid, SOLVER,
                          FWIConfig(num_iterations=4, reject_increase=1.5))
        np.testing.assert_allclose(np.asarray(r1.velocity),
                                   np.asarray(r0.velocity), atol=1e-6)
        np.testing.assert_allclose(np.asarray(r1.metrics.loss),
                                   np.asarray(r0.metrics.loss), rtol=1e-6)

    def test_watchdog_with_bb_and_frozen(self):
        grid, data, solver = TestFrozenFactor()._split_problem()
        vel0 = jnp.full(grid.shape, C0, jnp.float32)
        res = nonlinear_cg(
            vel0, data, grid,
            dataclasses.replace(solver, refactor_every=2),
            FWIConfig(num_iterations=4, step_size=StepSizeFormula.BB,
                      reject_increase=1.5))
        losses = np.asarray(res.metrics.loss)
        assert np.all(np.isfinite(losses)) and losses[-1] < losses[0]

    def test_watchdog_rejects_nonratio_threshold(self, problem):
        grid, data, _ = problem
        vel0 = jnp.full(grid.shape, C0, jnp.float32)
        with pytest.raises(ValueError, match="reject_increase must be > 1"):
            nonlinear_cg(vel0, data, grid, SOLVER,
                         FWIConfig(num_iterations=1, reject_increase=0.9))

    def test_multifreq_rejects_bb_and_watchdog(self, problem):
        """The joint multi-frequency loop supports neither BB nor the
        watchdog; both fail fast with actionable errors instead of an
        obscure trace-time message (round-5 review finding)."""
        import jax.numpy as jnp
        from waveforminversionust_tpu.fwi.multifreq import (
            nonlinear_cg_multifreq, stack_frequencies)
        grid, data, _ = problem
        mf = stack_frequencies([data])
        vel0 = jnp.full(grid.shape, C0, jnp.float32)
        with pytest.raises(ValueError, match="not supported by the joint"):
            nonlinear_cg_multifreq(
                vel0, mf, grid, SOLVER,
                FWIConfig(num_iterations=1,
                          step_size=StepSizeFormula.BB))
        with pytest.raises(ValueError, match="watchdog"):
            nonlinear_cg_multifreq(
                vel0, mf, grid, SOLVER,
                FWIConfig(num_iterations=1, reject_increase=1.5))
