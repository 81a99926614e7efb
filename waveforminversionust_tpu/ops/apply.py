"""Matrix-free application of the 9-point Helmholtz operator.

``(H u)[y, x] = sum_s coeffs[s, y, x] * u[y + dy_s, x + dx_s]`` — nine shifted
multiply-adds over complex planes. This replaces the reference's sparse-matrix
product/factorization (reference: solve_helmholtz.py:64-93) with an operation
XLA fuses into a single VPU pass; a Pallas kernel version lives in
:mod:`.pallas_stencil`.

The transpose/adjoint applications are exact: H here is *not* symmetric (the
staggered PML sampling breaks symmetry), so the adjoint solve required by the
gradient (reference: solveHelmholtz.m:131-135 uses H') must use the true
conjugate-transpose, implemented below by re-centering the coefficient planes.
"""

from __future__ import annotations

import jax.numpy as jnp

from .stencil import STENCIL_OFFSETS


def _shift(u, dy: int, dx: int):
    """shift(u)[..., y, x] = u[..., y+dy, x+dx], zero outside the domain."""
    pad = [(0, 0)] * (u.ndim - 2) + [(1, 1), (1, 1)]
    up = jnp.pad(u, pad)
    ny, nx = u.shape[-2], u.shape[-1]
    return up[..., 1 + dy:1 + dy + ny, 1 + dx:1 + dx + nx]


def h_apply(coeffs, u):
    """Apply H to fields u of shape (..., ny, nx). Returns same shape."""
    out = coeffs[0] * u
    for s in range(1, 9):
        dy, dx = STENCIL_OFFSETS[s]
        out = out + coeffs[s] * _shift(u, dy, dx)
    return out


def transpose_coefficients(coeffs):
    """Coefficient planes of H^T in the same 9-plane representation.

    H_{i, i+delta_s} = coeffs[s, i]  =>  (H^T)_{j, j-delta_s} = coeffs[s, j-delta_s].
    So the plane of H^T for offset -delta_s is coeffs[s] shifted by -delta_s.
    The result is again a 9-point stencil and can be fed to :func:`h_apply`.
    """
    out = [None] * 9
    offset_to_slot = {off: i for i, off in enumerate(STENCIL_OFFSETS)}
    for s, (dy, dx) in enumerate(STENCIL_OFFSETS):
        t = offset_to_slot[(-dy, -dx)]
        out[t] = _shift(coeffs[s], -dy, -dx)
    return jnp.stack(out)


def adjoint_coefficients(coeffs):
    """Coefficient planes of H^H (conjugate transpose)."""
    return jnp.conj(transpose_coefficients(coeffs))


def h_apply_transpose(coeffs, u):
    """Apply H^T without materializing transposed planes (scatter form)."""
    out = coeffs[0] * u
    for s in range(1, 9):
        dy, dx = STENCIL_OFFSETS[s]
        out = out + _shift(coeffs[s] * u, -dy, -dx)
    return out


def h_apply_adjoint(coeffs, u):
    """Apply H^H = conj(H^T conj(.))."""
    out = jnp.conj(coeffs[0]) * u
    for s in range(1, 9):
        dy, dx = STENCIL_OFFSETS[s]
        out = out + _shift(jnp.conj(coeffs[s]) * u, -dy, -dx)
    return out


def dense_matrix(coeffs):
    """Materialize H as a dense (ny*nx, ny*nx) matrix. Test/debug only."""
    ny, nx = coeffs.shape[-2], coeffs.shape[-1]
    n = ny * nx
    eye = jnp.eye(n, dtype=coeffs.dtype).reshape(n, ny, nx)
    cols = h_apply(coeffs, eye)  # H applied to every basis field
    return cols.reshape(n, n).T
