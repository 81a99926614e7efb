"""Truncated Gauss-Newton FWI (fwi/newton.py): operator identities and an
end-to-end inversion.

The GN machinery is hand-derived from the same adjoint-state identities as
the reference's CG gradient (reference: nonlinearcg.py:118-127), so the
contract to pin is (a) the Frechet apply J dm really is the derivative of
the receiver data, (b) jt_apply really is its adjoint, (c) the outer loop
inverts."""

import jax.numpy as jnp
import numpy as np
import pytest

from waveforminversionust_tpu import (AcquisitionConfig, FWIConfig, Grid2D,
                                      PMLConfig, SolverConfig,
                                      build_ring_acquisition)
from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
from waveforminversionust_tpu.fwi.newton import run_gauss_newton
from waveforminversionust_tpu.fwi.objective import build_fwi_data
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom

C0 = 1500.0
F = 200e3
ACQ = AcquisitionConfig(num_elements=32, radius=18e-3,
                        num_excluded_each_side=5)
# refine=2: extra iterative-refinement passes cut the f32 solve residual so
# the finite-difference checks difference signal, not solver noise (same
# device as tests/test_adjoint_vjp.py).
SOLVER = SolverConfig(refine=2, pml=PMLConfig(l_pml=4e-3),
                      born_pml=PMLConfig(a0=20.0, l_pml=4e-3))


def _problem():
    from waveforminversionust_tpu.models.acquisition import (ring_positions,
                                                             snap_to_grid)
    coarse = Grid2D.centered(24e-3, 0.8e-3)
    xi, yi = snap_to_grid(coarse, *ring_positions(ACQ.num_elements,
                                                  ACQ.radius))
    xs, ys = coarse.x[xi], coarse.y[yi]
    fine = Grid2D.centered(24e-3, 0.4e-3)
    true_vel = smooth_blob_phantom(fine, radius=8e-3, dc=30, c_bkgnd=C0)
    ds = synthesize_ring_dataset(true_vel, fine, ACQ, f=F, seed=3,
                                 solver=SOLVER, x_elem=xs, y_elem=ys)
    acq = build_ring_acquisition(coarse, ACQ, x_elem=xs, y_elem=ys)
    data = build_fwi_data(acq, ds.rec_data, F)
    return coarse, data, true_vel, fine


def _jv_jt(coarse, data, slow, exact=True):
    """Materialize the j_apply / jt_apply pair at a model point, the way
    run_gauss_newton builds them."""
    import jax

    from waveforminversionust_tpu.fwi.newton import make_frechet_operators
    from waveforminversionust_tpu.ops.solve import (helmholtz_operator_solve,
                                                    make_helmholtz_operator)

    vel = 1.0 / slow
    op = make_helmholtz_operator(vel, data.f, coarse, SOLVER)
    wv = helmholtz_operator_solve(op, data.src, coarse, SOLVER)
    jv, jt, _ = make_frechet_operators(op, data, coarse, SOLVER, slow, wv,
                                       exact=exact)
    return jax.jit(jv), jax.jit(jt)


@pytest.mark.parametrize("exact,tol", [(True, 0.02), (False, 0.095)])
def test_frechet_matches_finite_differences(exact, tol):
    """J dm == d(rec_sim)/d(slowness) in a random smooth direction (central
    FD; no source estimation so rec_sim is the raw sampling).

    exact=True (the discrete 9-point Frechet: mass spread over the stencil
    legs + C factor + Dirichlet masking) matches FD to the solver noise
    floor. exact=False is the classical lumped virtual source — the
    reference's own gradient formula — which carries an eps-INDEPENDENT
    ~7% systematic bias on this discretization (measured constant over
    eps in [5e-3, 8e-2]): the mass term the 9-point scheme distributes
    onto neighbor legs with weights d/4 and e/4."""
    from waveforminversionust_tpu.fwi.objective import sample_receivers
    from waveforminversionust_tpu.ops.solve import solve_helmholtz

    coarse, data, _, _ = _problem()
    slow = jnp.full(coarse.shape, 1.0 / C0, jnp.float32)
    jv, _ = _jv_jt(coarse, data, slow, exact=exact)

    rng = np.random.default_rng(0)
    dm = rng.standard_normal(coarse.shape).astype(np.float32)
    dm[:4] = dm[-4:] = 0.0
    dm[:, :4] = dm[:, -4:] = 0.0
    dm *= 1.0 / (C0 * 50)  # smooth-scale slowness perturbation

    def rec(s):
        u, _ = solve_helmholtz(1.0 / s, data.src, data.f, coarse, SOLVER)
        return sample_receivers(u, data.rx_y, data.rx_x, data.rx_w)

    eps = 2e-2
    fd = (np.asarray(rec(slow + eps * dm))
          - np.asarray(rec(slow - eps * dm))) / (2 * eps)
    got = np.asarray(jv(jnp.asarray(dm)))
    denom = np.abs(fd).max()
    assert np.abs(got - fd).max() < tol * denom


@pytest.mark.parametrize("exact", [True, False])
def test_jt_is_adjoint_of_jv(exact):
    """Dot-product identity Re<J dm, r> == <dm, J^H r> — exact up to the
    banded solver's residual (the forward/adjoint solves share one
    factorization, so the identity is structural, not approximate), for
    BOTH the exact-discrete and classical-lumped Frechet pairs."""
    coarse, data, _, _ = _problem()
    slow = jnp.full(coarse.shape, 1.0 / C0, jnp.float32)
    jv, jt = _jv_jt(coarse, data, slow, exact=exact)

    rng = np.random.default_rng(1)
    dm = jnp.asarray(rng.standard_normal(coarse.shape), jnp.float32)
    r = jnp.asarray(rng.standard_normal(data.rec_obs.shape)
                    + 1j * rng.standard_normal(data.rec_obs.shape),
                    jnp.complex64)

    lhs = float(jnp.sum(jnp.real(jnp.conj(jv(dm)) * r)).real)
    rhs = float(jnp.sum(dm * jt(r)))
    assert lhs == pytest.approx(rhs, rel=2e-3)


def test_gauss_newton_inverts():
    """3 outer GN iterations: loss monotone non-increasing (the backtracking
    globalization guarantees it), strictly lower at the end, reconstruction
    moves toward the blob, inner CG makes progress (relres < 1)."""
    coarse, data, true_vel, fine = _problem()
    vel0 = jnp.full(coarse.shape, C0, jnp.float32)
    res = run_gauss_newton(vel0, data, coarse, SOLVER,
                           fwi=FWIConfig(clip_velocity=(C0 - 100, C0 + 100)),
                           num_iterations=3, cg_iters=6)
    loss = np.asarray(res.metrics.loss)
    assert np.all(np.isfinite(loss))
    assert np.all(np.diff(loss) <= 1e-6 * loss[0])  # monotone (pre-update)
    from waveforminversionust_tpu.fwi.lbfgs import fwi_loss
    final = float(fwi_loss((1.0 / res.velocity).ravel(), data, coarse,
                           SOLVER))
    assert final < loss[-1] < loss[0]
    assert np.all(np.asarray(res.metrics.cg_relres) < 1.0)

    truth_c = np.asarray(smooth_blob_phantom(coarse, radius=8e-3, dc=30,
                                             c_bkgnd=C0))
    err0 = np.abs(C0 - truth_c).mean()
    err1 = np.abs(np.asarray(res.velocity) - truth_c).mean()
    assert err1 < err0


def test_gauss_newton_beats_cg_per_outer_iteration():
    """The point of second order: at 3 outer iterations GN's misfit is
    below 3-iteration nonlinear CG's (GN spends extra sweeps per iteration
    but no extra factorizations)."""
    from waveforminversionust_tpu.fwi.optimizers import nonlinear_cg

    coarse, data, _, _ = _problem()
    vel0 = jnp.full(coarse.shape, C0, jnp.float32)
    fwi = FWIConfig(clip_velocity=(C0 - 100, C0 + 100))
    gn = run_gauss_newton(vel0, data, coarse, SOLVER, fwi=fwi,
                          num_iterations=3, cg_iters=6)
    cg = nonlinear_cg(vel0, data, coarse, SOLVER, fwi, num_iterations=3)
    # compare the NEXT misfit each trajectory would see: evaluate via the
    # recorded loss at iteration k (loss is measured before the update), so
    # use the last recorded loss after equal iterations plus final-model
    # misfit for GN.
    from waveforminversionust_tpu.fwi.lbfgs import fwi_loss
    gn_final = float(fwi_loss((1.0 / gn.velocity).ravel(), data, coarse,
                              SOLVER))
    cg_final = float(fwi_loss((1.0 / cg.velocity).ravel(), data, coarse,
                              SOLVER))
    assert gn_final < cg_final


def test_runner_gn_method():
    """invert_dataset(method="gn") runs the GN optimizer end to end
    (including multi-stage-compatible metrics plumbing)."""
    from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
    from waveforminversionust_tpu.fwi.runner import invert_dataset
    from waveforminversionust_tpu.models.acquisition import (ring_positions,
                                                             snap_to_grid)

    coarse = Grid2D.centered(24e-3, 0.8e-3)
    xi, yi = snap_to_grid(coarse, *ring_positions(ACQ.num_elements,
                                                  ACQ.radius))
    xs, ys = coarse.x[xi], coarse.y[yi]
    fine = Grid2D.centered(24e-3, 0.4e-3)
    true_vel = smooth_blob_phantom(fine, radius=8e-3, dc=30, c_bkgnd=C0)
    ds = synthesize_ring_dataset(true_vel, fine, ACQ, f=F, seed=3,
                                 solver=SOLVER, x_elem=xs, y_elem=ys)
    res = invert_dataset(ds, grid=coarse, acquisition=ACQ, solver=SOLVER,
                         fwi=FWIConfig(c_init=C0, num_iterations=2),
                         method="gn")
    loss = res.metrics["loss"]
    assert loss.shape == (2,) and np.all(np.isfinite(loss))
    assert loss[1] <= loss[0]
