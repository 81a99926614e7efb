"""Model-space regularization tests (fwi.regularization)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveforminversionust_tpu import FWIConfig, Grid2D
from waveforminversionust_tpu.fwi.regularization import (make_cg_regularizer,
                                                         penalty_value,
                                                         tikhonov_value,
                                                         tv_value)


@pytest.fixture(scope="module")
def grid():
    return Grid2D.centered(8e-3, 1e-3)


def _rand_vel(grid, seed=0):
    rng = np.random.default_rng(seed)
    return (1500.0 + 30 * rng.standard_normal(grid.shape)).astype(np.float32)


def test_tikhonov_zero_on_constant(grid):
    v = np.full(grid.shape, 1480.0, np.float32)
    assert float(tikhonov_value(v, grid)) == 0.0
    assert float(tv_value(v, grid)) == pytest.approx(0.0, abs=1e-3)


def _tik_np(v):
    v = np.asarray(v, np.float64)
    dx = v[:, 1:] - v[:, :-1]
    dy = v[1:, :] - v[:-1, :]
    return 0.5 * (np.sum(dx * dx) + np.sum(dy * dy))


def _tv_np(v, eps):
    v = np.asarray(v, np.float64)
    dx = np.diff(v, axis=1, append=v[:, -1:])
    dy = np.diff(v, axis=0, append=v[-1:, :])
    return np.sum(np.sqrt(dx * dx + dy * dy + eps ** 2) - eps)


def test_tikhonov_gradient_matches_fd(grid):
    """jax.grad of the f32 implementation matches a float64 central
    difference of the same formula (f32 evaluation of the value itself is
    too cancellation-prone for FD)."""
    v = _rand_vel(grid)
    assert float(tikhonov_value(v, grid)) == pytest.approx(_tik_np(v), rel=1e-5)
    g = jax.grad(lambda x: tikhonov_value(x, grid))(jnp.asarray(v))
    eps = 1e-3
    for (i, j) in [(3, 4), (0, 0), (8, 2)]:
        vp = v.astype(np.float64); vp[i, j] += eps
        vm = v.astype(np.float64); vm[i, j] -= eps
        fd = (_tik_np(vp) - _tik_np(vm)) / (2 * eps)
        assert float(g[i, j]) == pytest.approx(fd, rel=1e-3)


def test_tv_gradient_matches_fd(grid):
    v = _rand_vel(grid, seed=1)
    assert float(tv_value(v, grid, 1.0)) == pytest.approx(_tv_np(v, 1.0), rel=1e-5)
    g = jax.grad(lambda x: tv_value(x, grid, eps=1.0))(jnp.asarray(v))
    eps = 1e-3
    for (i, j) in [(5, 5), (2, 7)]:
        vp = v.astype(np.float64); vp[i, j] += eps
        vm = v.astype(np.float64); vm[i, j] -= eps
        fd = (_tv_np(vp, 1.0) - _tv_np(vm, 1.0)) / (2 * eps)
        assert float(g[i, j]) == pytest.approx(fd, rel=2e-3)


def test_penalty_combines_terms(grid):
    v = _rand_vel(grid)
    fwi = FWIConfig(reg_tikhonov=0.5, reg_tv=2.0)
    expect = (0.5 * float(tikhonov_value(v, grid))
              + 2.0 * float(tv_value(v, grid, fwi.reg_tv_eps)))
    assert float(penalty_value(v, grid, fwi)) == pytest.approx(expect, rel=1e-5)


def test_cg_regularizer_relative_scaling(grid):
    """lam=1 produces a push with the data-gradient norm; constant models
    (zero reg gradient) contribute exactly zero."""
    fwi = FWIConfig(reg_tv=1.0)
    reg = make_cg_regularizer(grid, fwi)
    slow = 1.0 / jnp.asarray(_rand_vel(grid, seed=2))
    dg = jnp.ones(grid.shape) * 3.0
    extra = reg(slow, dg)
    assert float(jnp.linalg.norm(extra)) == pytest.approx(
        float(jnp.linalg.norm(dg)), rel=1e-4)
    # constant slowness -> zero reg gradient -> zero push, no NaN
    extra0 = reg(jnp.full(grid.shape, 1 / 1500.0), dg)
    assert float(jnp.abs(extra0).max()) == 0.0


def test_cg_regularizer_none_when_off(grid):
    assert make_cg_regularizer(grid, FWIConfig()) is None


class TestRegularizedInversion:
    def _problem(self):
        from waveforminversionust_tpu import (AcquisitionConfig, PMLConfig,
                                              SolverConfig)
        from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
        from waveforminversionust_tpu.models.phantom import smooth_blob_phantom

        fine = Grid2D.centered(24e-3, 0.4e-3)
        coarse = Grid2D.centered(24e-3, 0.8e-3)
        acq = AcquisitionConfig(num_elements=32, radius=9e-3,
                                num_excluded_each_side=3)
        solver = SolverConfig(pml=PMLConfig(l_pml=3.2e-3))
        vel = smooth_blob_phantom(fine, radius=6e-3, dc=30)
        ds = synthesize_ring_dataset(vel, fine, acq, f=200e3, solver=solver,
                                     seed=4)
        return ds, coarse, acq, solver

    def test_tv_smooths_cg_reconstruction(self):
        """TV-regularized CG reaches a lower-TV model while still reducing
        the data misfit (the qualitative point of ROADMAP item 6)."""
        from waveforminversionust_tpu.fwi.runner import invert_dataset

        ds, coarse, acq, solver = self._problem()
        base = FWIConfig(c_init=1500.0, num_iterations=6)
        res0 = invert_dataset(ds, grid=coarse, acquisition=acq, solver=solver,
                              fwi=base)
        res1 = invert_dataset(ds, grid=coarse, acquisition=acq, solver=solver,
                              fwi=dataclasses.replace(base, reg_tv=0.3))
        tv0 = float(tv_value(res0.velocity, coarse))
        tv1 = float(tv_value(res1.velocity, coarse))
        assert tv1 < tv0
        loss1 = res1.metrics["loss"]
        assert loss1[-1] < loss1[0]

    def test_lbfgs_penalized_objective_runs(self):
        from waveforminversionust_tpu.fwi.runner import invert_dataset

        ds, coarse, acq, solver = self._problem()
        fwi = FWIConfig(c_init=1500.0, num_iterations=4, reg_tikhonov=1e-4)
        res = invert_dataset(ds, grid=coarse, acquisition=acq, solver=solver,
                             fwi=fwi, method="lbfgs")
        loss = res.metrics["loss"]
        assert np.all(np.isfinite(loss))
        assert loss[-1] < loss[0]
        assert np.isfinite(res.velocity).all()
