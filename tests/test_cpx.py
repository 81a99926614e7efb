"""Split-complex arithmetic library vs numpy complex ground truth."""

import numpy as np
import pytest

from waveforminversionust_tpu.ops import cpx


@pytest.fixture
def z(rng):
    return (rng.standard_normal((6, 7)) + 1j * rng.standard_normal((6, 7))).astype(np.complex64)


@pytest.fixture
def w(rng):
    return (rng.standard_normal((6, 7)) + 1j * rng.standard_normal((6, 7))).astype(np.complex64)


def _np(x):
    return np.asarray(cpx.to_native(x))


def test_roundtrip(z):
    np.testing.assert_allclose(_np(cpx.of(z)), z)
    np.testing.assert_allclose(cpx.to_numpy(cpx.of(z)), z, rtol=1e-6)


def test_algebra(z, w):
    a, b = cpx.of(z), cpx.of(w)
    np.testing.assert_allclose(_np(a + b), z + w, rtol=1e-6)
    np.testing.assert_allclose(_np(a - b), z - w, rtol=1e-6)
    np.testing.assert_allclose(_np(a * b), z * w, rtol=1e-5)
    np.testing.assert_allclose(_np(cpx.div(a, b)), z / w, rtol=1e-4)
    np.testing.assert_allclose(_np(cpx.reciprocal(b)), 1 / w, rtol=1e-4)
    np.testing.assert_allclose(_np(a.conj()), np.conj(z))
    np.testing.assert_allclose(_np(-a), -z)
    np.testing.assert_allclose(np.asarray(cpx.abs2(a)), np.abs(z) ** 2, rtol=1e-5)


def test_transcendental(z):
    a = cpx.of(0.3 * z)
    np.testing.assert_allclose(_np(cpx.exp(a)), np.exp(0.3 * z), rtol=1e-4)
    np.testing.assert_allclose(_np(cpx.sqrt(cpx.of(z))), np.sqrt(z),
                               rtol=1e-4, atol=1e-6)


def test_reductions(z, w):
    a, b = cpx.of(z), cpx.of(w)
    np.testing.assert_allclose(complex(*map(np.asarray, cpx.sum_(a))),
                               z.sum(), rtol=1e-5)
    np.testing.assert_allclose(complex(*map(np.asarray, cpx.vdot(a, b))),
                               np.vdot(z, w), rtol=1e-5)


def test_matmul_einsum_inv(rng):
    A = (rng.standard_normal((5, 5)) + 1j * rng.standard_normal((5, 5))).astype(np.complex64)
    B = (rng.standard_normal((5, 3)) + 1j * rng.standard_normal((5, 3))).astype(np.complex64)
    a, b = cpx.of(A), cpx.of(B)
    np.testing.assert_allclose(_np(cpx.matmul(a, b)), A @ B, rtol=1e-4)
    np.testing.assert_allclose(_np(cpx.einsum("ij,jk->ik", a, b)), A @ B,
                               rtol=1e-4)
    Awell = A + 5 * np.eye(5)
    np.testing.assert_allclose(_np(cpx.inv(cpx.of(Awell))),
                               np.linalg.inv(Awell), rtol=1e-3, atol=1e-5)


def test_fft_roundtrip(z):
    a = cpx.of(z)
    np.testing.assert_allclose(_np(cpx.fft2(a)), np.fft.fft2(z), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(_np(cpx.ifft2(a)), np.fft.ifft2(z), rtol=1e-4,
                               atol=1e-7)
    np.testing.assert_allclose(_np(cpx.ifft2(cpx.fft2(a))), z, rtol=1e-4,
                               atol=1e-5)


def test_structural(z, w):
    a, b = cpx.of(z), cpx.of(w)
    np.testing.assert_allclose(_np(cpx.pad(a, ((1, 1), (2, 0)))),
                               np.pad(z, ((1, 1), (2, 0))))
    np.testing.assert_allclose(_np(cpx.stack([a, b])), np.stack([z, w]))
    np.testing.assert_allclose(_np(cpx.concat([a, b], 1)),
                               np.concatenate([z, w], 1))
    np.testing.assert_allclose(_np(a[1:3, ::2]), z[1:3, ::2])
    mask = np.abs(z) > 1
    np.testing.assert_allclose(_np(cpx.where(mask, a, b)), np.where(mask, z, w))
    np.testing.assert_allclose(
        _np(cpx.set_at(a, (0, 0), cpx.of(np.complex64(5 + 2j)))),
        np.concatenate([[[5 + 2j, *z[0, 1:]]], z[1:]], 0), rtol=1e-6)
