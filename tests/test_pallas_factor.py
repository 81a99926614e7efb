"""Fused Pallas factorization kernel vs the XLA block-Thomas scan.

Runs the kernel in interpret mode (CPU CI); the real-hardware run is
exercised by bench.py / the TPU drive (PERF_NOTES.md round 2: 49 ms vs
109 ms at 301^2, solve residual 2.7e-6).
"""

import numpy as np

from waveforminversionust_tpu import Grid2D, PMLConfig
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom
from waveforminversionust_tpu.ops import cpx
from waveforminversionust_tpu.ops.pallas_factor import (banded_factor_pallas,
                                                        factor_g_pallas)
from waveforminversionust_tpu.ops.split_engine import (banded_factor_cpx,
                                                       banded_solve_cpx,
                                                       h_apply_adjoint_cpx,
                                                       h_apply_cpx,
                                                       helmholtz_coefficients_cpx)

F = 350e3
PML = PMLConfig(l_pml=2.4e-3)


def _coeffs(extent=24e-3):
    grid = Grid2D.centered(extent, 0.8e-3)
    vel = smooth_blob_phantom(grid, radius=extent / 3, dc=60)
    return helmholtz_coefficients_cpx(vel, grid, F, PML), grid


def test_factor_matches_xla_scan():
    """G parity on a grid whose nx (61) is NOT a panel multiple — exercises
    the identity-padded elimination tail."""
    coeffs, _ = _coeffs()
    g_ref = cpx.to_numpy(banded_factor_cpx(coeffs, 0).g)
    g_crop, g_padded = factor_g_pallas(coeffs, interpret=True)
    g_pal = cpx.to_numpy(g_crop)
    rel = np.linalg.norm(g_pal - g_ref) / np.linalg.norm(g_ref)
    assert rel < 5e-6, rel
    # the padded factor carries an exact identity tail (the sweeps rely on
    # the padded components staying decoupled)
    nxp = g_padded.re.shape[-1]
    nx = g_ref.shape[-1]
    tail = cpx.to_numpy(g_padded)[:, nx:, nx:]
    np.testing.assert_allclose(tail.real,
                               np.broadcast_to(np.eye(nxp - nx),
                                               tail.shape).real, atol=1e-6)


def test_solves_through_pallas_factor():
    """Forward and adjoint sweeps through the kernel's factor hit direct-
    solver residuals on the true system."""
    coeffs, grid = _coeffs()
    ny, nx = grid.shape
    rng = np.random.default_rng(0)
    b = cpx.of((rng.standard_normal((3, ny, nx))
                + 1j * rng.standard_normal((3, ny, nx))).astype(np.complex64))
    fac = banded_factor_pallas(coeffs, interpret=True)
    for adjoint, apply_fn in ((False, h_apply_cpx),
                              (True, h_apply_adjoint_cpx)):
        x = banded_solve_cpx(fac, b, adjoint=adjoint)
        r = apply_fn(coeffs, x) - b
        rel = float(np.sqrt(np.sum(np.abs(cpx.to_numpy(r)) ** 2)
                            / np.sum(np.abs(cpx.to_numpy(b)) ** 2)))
        assert rel < 2e-5, (adjoint, rel)


def test_sweep_kernel_matches_xla_sweeps():
    """Fused sweep passes == the XLA scan sweeps (identical op order, so
    the interpret-mode comparison is bitwise-tight), both directions."""
    coeffs, grid = _coeffs()
    ny, nx = grid.shape
    rng = np.random.default_rng(1)
    b = cpx.of((rng.standard_normal((3, ny, nx))
                + 1j * rng.standard_normal((3, ny, nx))).astype(np.complex64))
    fac = banded_factor_cpx(coeffs, 0)
    fac_pal = banded_factor_pallas(coeffs, interpret=True)  # carries g_pad
    from waveforminversionust_tpu.ops.pallas_sweep import banded_solve_pallas
    for adjoint in (False, True):
        x_ref = cpx.to_numpy(banded_solve_cpx(fac, b, adjoint=adjoint))
        x_pal = cpx.to_numpy(banded_solve_pallas(fac, b, adjoint=adjoint,
                                                 interpret=True))
        rel = np.linalg.norm(x_pal - x_ref) / np.linalg.norm(x_ref)
        assert rel < 1e-6, (adjoint, rel)
        # padded-factor path (no re-pad inside the sweeps)
        x_pp = cpx.to_numpy(banded_solve_pallas(fac_pal, b, adjoint=adjoint,
                                                interpret=True))
        rel = np.linalg.norm(x_pp - x_ref) / np.linalg.norm(x_ref)
        assert rel < 5e-6, (adjoint, rel)


def test_sweep_kernel_default_precision_path():
    """The mixed-precision inner-loop path (SolverConfig.fast_* ->
    banded_solve_pallas(precision=DEFAULT)) stays a correct solve. On CPU
    interpret mode DEFAULT == f32 so the check is tight; the real-MXU
    ~1e-3 accuracy/RMSE budget is measured in PERF_NOTES round 3."""
    import jax

    coeffs, grid = _coeffs()
    ny, nx = grid.shape
    rng = np.random.default_rng(2)
    b = cpx.of((rng.standard_normal((2, ny, nx))
                + 1j * rng.standard_normal((2, ny, nx))).astype(np.complex64))
    fac = banded_factor_cpx(coeffs, 0)
    from waveforminversionust_tpu.ops.pallas_sweep import banded_solve_pallas
    for adjoint, apply_fn in ((False, h_apply_cpx),
                              (True, h_apply_adjoint_cpx)):
        x = banded_solve_pallas(fac, b, adjoint=adjoint, interpret=True,
                                precision=jax.lax.Precision.DEFAULT)
        r = apply_fn(coeffs, x) - b
        rel = float(np.sqrt(np.sum(np.abs(cpx.to_numpy(r)) ** 2)
                            / np.sum(np.abs(cpx.to_numpy(b)) ** 2)))
        assert rel < 2e-5, (adjoint, rel)


def test_factor_precision_default_plumbing():
    """SolverConfig.factor_precision="default" reaches the kernel: the
    DEFAULT-panel factor must still solve the true system (on CPU interpret
    mode DEFAULT == f32, so residuals match the HIGHEST path; on the real
    chip the measured trade is 801^2 factor 564 -> 310 ms with refine=2
    recovering equal residual — PERF_NOTES round 3)."""
    import jax

    coeffs, grid = _coeffs()
    ny, nx = grid.shape
    rng = np.random.default_rng(1)
    b = cpx.of((rng.standard_normal((2, ny, nx))
                + 1j * rng.standard_normal((2, ny, nx))).astype(np.complex64))
    fac = banded_factor_pallas(coeffs, interpret=True,
                               panel_precision=jax.lax.Precision.DEFAULT)
    x = banded_solve_cpx(fac, b)
    r = cpx.to_numpy(h_apply_cpx(coeffs, x)) - cpx.to_numpy(b)
    rel = np.linalg.norm(r) / np.linalg.norm(cpx.to_numpy(b))
    assert rel < 1e-4, rel
