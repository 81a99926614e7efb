"""Batched blocked Gauss-Jordan inverse vs numpy complex128."""

import jax.numpy as jnp
import numpy as np
import pytest

from waveforminversionust_tpu.ops import cpx
from waveforminversionust_tpu.ops.batched_inv import batched_inv


def _random_batch(rng, b, n, diag_boost=2.0):
    """Well-conditioned random complex batch (unpivoted GJ needs no huge
    pivots; the Helmholtz Schur blocks it targets are similar)."""
    a = (rng.standard_normal((b, n, n)) + 1j * rng.standard_normal((b, n, n)))
    a = a / np.sqrt(n) + diag_boost * np.eye(n)
    return a.astype(np.complex64)


@pytest.mark.parametrize("n,block", [(7, 4), (32, 32), (50, 32), (96, 32),
                                     (130, 64)])
def test_batched_inv_matches_numpy(rng, n, block):
    a = _random_batch(rng, 5, n)
    out = batched_inv(cpx.of(jnp.asarray(a)), block=block)
    got = np.asarray(out.re) + 1j * np.asarray(out.im)
    want = np.linalg.inv(a.astype(np.complex128))
    err = (np.linalg.norm((got - want).reshape(5, -1), axis=1)
           / np.linalg.norm(want.reshape(5, -1), axis=1))
    assert err.max() < 5e-5, err


def test_batched_inv_identity_residual(rng):
    """||A A^-1 - I|| on a larger batch/size, the actual accuracy contract."""
    a = _random_batch(rng, 8, 160)
    ainv = batched_inv(cpx.of(jnp.asarray(a)), block=32)
    got = np.asarray(ainv.re) + 1j * np.asarray(ainv.im)
    resid = np.matmul(a.astype(np.complex128), got)
    resid -= np.eye(160)
    rel = np.abs(resid).max()
    assert rel < 5e-4, rel


def test_batched_inv_helmholtz_schur_blocks():
    """Accuracy on the matrices this was built for: leading Schur
    complements of a real Helmholtz factorization (tridiagonal row blocks
    of the 9-point PML stencil)."""
    import jax
    from waveforminversionust_tpu import Grid2D, PMLConfig
    from waveforminversionust_tpu.ops.stencil import helmholtz_coefficients

    grid = Grid2D.centered(24e-3, 0.8e-3)  # 61x61
    vel = jnp.full(grid.shape, 1500.0, jnp.float32)
    coeffs = np.asarray(helmholtz_coefficients(vel, grid, jnp.float32(350e3),
                                               PMLConfig(l_pml=4e-3)))
    n = grid.nx
    rows = [0, 10, 30, 60]
    mats = []
    for y in rows:
        d = (np.diag(coeffs[0, y]) + np.diag(coeffs[1, y, 1:], -1)
             + np.diag(coeffs[2, y, :-1], 1))
        mats.append(d)
    a = np.stack(mats).astype(np.complex64)
    ainv = batched_inv(cpx.of(jnp.asarray(a)), block=32)
    got = np.asarray(ainv.re) + 1j * np.asarray(ainv.im)
    want = np.linalg.inv(a.astype(np.complex128))
    for i in range(len(rows)):
        rel = (np.linalg.norm(got[i] - want[i]) / np.linalg.norm(want[i]))
        assert rel < 2e-4, (rows[i], rel)


def test_pallas_pivot_kernel_interpret(rng):
    """The Pallas Gauss-Jordan kernel (interpret mode on CPU) matches the
    XLA pivot loop and numpy."""
    import functools
    from waveforminversionust_tpu.ops.pallas_inv import batched_small_inv_pallas

    a = _random_batch(rng, 6, 32)
    out = batched_small_inv_pallas(cpx.of(jnp.asarray(a)), interpret=True)
    got = np.asarray(out.re) + 1j * np.asarray(out.im)
    want = np.linalg.inv(a.astype(np.complex128))
    rel = (np.linalg.norm((got - want).reshape(6, -1), axis=1)
           / np.linalg.norm(want.reshape(6, -1), axis=1))
    assert rel.max() < 5e-5, rel

    # large-pivot (Dirichlet-scale) safety: no cancellation
    d = (1.5625e6 * np.eye(16)).astype(np.complex64)[None]
    out = batched_small_inv_pallas(cpx.of(jnp.asarray(d)), interpret=True)
    got = np.asarray(out.re) + 1j * np.asarray(out.im)
    np.testing.assert_allclose(got[0], np.eye(16) / 1.5625e6, rtol=1e-6)
