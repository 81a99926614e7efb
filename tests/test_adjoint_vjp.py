"""Gradient correctness of the custom-VJP Helmholtz solve.

The reference's autodiff path is broken (``jax.pure_callback`` has no VJP;
reference: fwi_loss_function.py:128 + solve_helmholtz.py:85-93). Here we
check our custom VJP against finite differences — the contract that makes the
L-BFGS inversion path real.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveforminversionust_tpu import (Grid2D, PMLConfig, SolverConfig,
                                      SolverMethod,
                                      solve_helmholtz)
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom

F = 350e3


def _small_problem():
    grid = Grid2D.centered(8e-3, 0.8e-3)  # 21x21
    vel = smooth_blob_phantom(grid, radius=3e-3, dc=60)
    ny, nx = grid.shape
    src = np.zeros((2, ny, nx), np.complex64)
    src[0, ny // 2, nx // 2 + 3] = 1.0
    src[1, ny // 2 - 2, nx // 2] = 0.5 - 0.25j
    cfg = SolverConfig(method=SolverMethod.BANDED, refine=2,
                       pml=PMLConfig(l_pml=2e-3))
    return grid, vel, jnp.array(src), cfg


def _loss(vel, src, grid, cfg, adjoint=False):
    u, _ = solve_helmholtz(vel, src, F, grid, cfg, adjoint=adjoint)
    w = jnp.cos(jnp.arange(u.size, dtype=jnp.float32)).reshape(u.shape)
    return jnp.sum(jnp.abs(u) ** 2 * (1.0 + 0.3 * w))


@pytest.mark.parametrize("adjoint", [False, True])
def test_vel_gradient_matches_finite_differences(adjoint):
    """Directional derivative check. eps must be large enough that the f32
    loss difference rises above rounding (the adjoint field spans ~12 orders
    of magnitude), yet small enough for linearity; 0.5 m/s on a 1500 m/s
    background works for both modes."""
    grid, vel, src, cfg = _small_problem()
    lossf = lambda v: _loss(v, src, grid, cfg, adjoint)
    g = np.array(jax.grad(lossf)(jnp.array(vel)))

    rng = np.random.default_rng(0)
    dv = rng.standard_normal(grid.shape).astype(np.float32)
    dv[:2] = dv[-2:] = 0.0
    dv[:, :2] = dv[:, -2:] = 0.0
    eps = 0.5
    lp = float(lossf(jnp.array(vel + eps * dv)))
    lm = float(lossf(jnp.array(vel - eps * dv)))
    fd = (lp - lm) / (2 * eps)
    got = float(np.sum(g * dv))
    assert got == pytest.approx(fd, rel=0.12)


def test_src_gradient_matches_finite_differences():
    grid, vel, src, cfg = _small_problem()
    lossf = lambda s: _loss(vel, s, grid, cfg)
    g = np.array(jax.grad(lossf)(src))  # conj-gradient convention for complex

    rng = np.random.default_rng(1)
    for _ in range(3):
        b = rng.integers(0, 2)
        iy = rng.integers(3, grid.ny - 3)
        ix = rng.integers(3, grid.nx - 3)
        eps = 1e-3
        # real part
        sp = np.array(src).copy(); sp[b, iy, ix] += eps
        sm = np.array(src).copy(); sm[b, iy, ix] -= eps
        fd_re = (float(lossf(jnp.array(sp))) - float(lossf(jnp.array(sm)))) / (2 * eps)
        # imag part
        sp = np.array(src).copy(); sp[b, iy, ix] += 1j * eps
        sm = np.array(src).copy(); sm[b, iy, ix] -= 1j * eps
        fd_im = (float(lossf(jnp.array(sp))) - float(lossf(jnp.array(sm)))) / (2 * eps)
        # JAX convention: for f: C -> R, grad returns conj(dL/dz) ... the
        # cotangent satisfies dL = 2 Re(conj(g) dz) => g = (fd_re + i fd_im)/2*2
        got = g[b, iy, ix]
        assert np.real(got) == pytest.approx(fd_re, rel=5e-2, abs=1e-14)
        assert -np.imag(got) == pytest.approx(fd_im, rel=5e-2, abs=1e-14)


def test_warm_start_changes_nothing():
    """Warm start with an x0 near the solution (the FWI use case: the
    previous outer iteration's field) must return the same solution. Note a
    warm start *far* from the solution is worse than none in f32 — the
    correction solve's relative accuracy is absolute error ~1e-6*||x0||."""
    grid, vel, src, cfg = _small_problem()
    u0, _ = solve_helmholtz(vel, src, F, grid, cfg)
    u1, _ = solve_helmholtz(vel, src, F, grid, cfg, x0=u0 * 1.02)
    np.testing.assert_allclose(np.array(u1), np.array(u0),
                               atol=1e-5 * float(jnp.abs(u0).max()))
    # gradient with warm start equals gradient without
    lossf0 = lambda v: _loss(v, src, grid, cfg)
    def lossf1(v):
        u, _ = solve_helmholtz(v, src, F, grid, cfg, x0=jax.lax.stop_gradient(u0))
        w = jnp.cos(jnp.arange(u.size, dtype=jnp.float32)).reshape(u.shape)
        return jnp.sum(jnp.abs(u) ** 2 * (1.0 + 0.3 * w))
    g0 = np.array(jax.grad(lossf0)(jnp.array(vel)))
    g1 = np.array(jax.grad(lossf1)(jnp.array(vel)))
    np.testing.assert_allclose(g1, g0, atol=2e-3 * np.abs(g0).max())


def test_born_vel_gradient_direction():
    """Born VJP is the continuous adjoint-state rule; check it against FD in
    direction/magnitude (looser: series truncation + spectral-vs-FD)."""
    grid = Grid2D.centered(16e-3, 0.8e-3)
    vel = smooth_blob_phantom(grid, radius=5e-3, dc=40)
    ny, nx = grid.shape
    src = np.zeros((1, ny, nx), np.complex64)
    src[0, ny // 2, nx // 2 + 5] = 1.0
    cfg = SolverConfig(method=SolverMethod.BORN)

    def lossf(v):
        u, _ = solve_helmholtz(v, jnp.array(src), F, grid, cfg)
        return jnp.sum(jnp.abs(u) ** 2)

    g = np.array(jax.grad(lossf)(jnp.array(vel)))
    rng = np.random.default_rng(2)
    dv = rng.standard_normal(grid.shape).astype(np.float32)
    dv[:3] = dv[-3:] = 0; dv[:, :3] = dv[:, -3:] = 0
    eps = 5e-2
    lp = float(lossf(jnp.array(vel + eps * dv)))
    lm = float(lossf(jnp.array(vel - eps * dv)))
    fd = (lp - lm) / (2 * eps)
    got = float(np.sum(g * dv))
    assert got == pytest.approx(fd, rel=0.1)


def test_born_lossy_gradients_match_fd():
    """The lossy Born custom VJP (_born_solve_lossy): jax.grad w.r.t. BOTH
    velocity and the attenuation map matches directional finite
    differences (converged GMRES-CBS solve; measured ratios 1.006 / 1.0001
    on this configuration)."""
    grid = Grid2D.centered(16e-3, 0.8e-3)
    vel = smooth_blob_phantom(grid, radius=5e-3, dc=40)
    ny, nx = grid.shape
    src = np.zeros((1, ny, nx), np.complex64)
    src[0, ny // 2, nx // 2 + 5] = 1.0
    alpha = np.zeros((ny, nx), np.float32)
    alpha[ny // 2 - 4:ny // 2 + 4, nx // 2 - 8:nx // 2 - 2] = 60.0
    alpha = jnp.asarray(alpha)
    cfg = SolverConfig(method=SolverMethod.BORN, born_krylov=True, tol=1e-6,
                       born_iter_cap=2000, pml=PMLConfig(l_pml=2e-3))

    def loss(v, a):
        u, _ = solve_helmholtz(v, jnp.asarray(src), F, grid, cfg,
                               attenuation=a)
        w = jnp.cos(jnp.arange(u.size, dtype=jnp.float32)).reshape(u.shape)
        return jnp.sum(jnp.abs(u) ** 2 * (1.0 + 0.3 * w))

    gv, ga = jax.grad(loss, argnums=(0, 1))(jnp.asarray(vel), alpha)
    rng = np.random.default_rng(0)
    dv = rng.standard_normal(grid.shape).astype(np.float32)
    da = np.abs(rng.standard_normal(grid.shape)).astype(np.float32)
    for m in (dv, da):
        m[:3] = m[-3:] = 0
        m[:, :3] = m[:, -3:] = 0
    eps_v, eps_a = 0.5, 2.0
    fd_v = (float(loss(jnp.asarray(vel + eps_v * dv), alpha))
            - float(loss(jnp.asarray(vel - eps_v * dv), alpha))) / (2 * eps_v)
    fd_a = (float(loss(jnp.asarray(vel), alpha + eps_a * jnp.asarray(da)))
            - float(loss(jnp.asarray(vel),
                         alpha - eps_a * jnp.asarray(da)))) / (2 * eps_a)
    assert float(np.sum(np.asarray(gv) * dv)) == pytest.approx(fd_v, rel=5e-2)
    assert float(np.sum(np.asarray(ga) * da)) == pytest.approx(fd_a, rel=5e-2)
