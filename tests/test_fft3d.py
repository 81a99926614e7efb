"""Distributed (pencil) 3D FFT + grid-sharded 3D CBS solver
(parallel/fft3d.py) on the virtual 8-device mesh.

The 3D operator is global in k-space, so its grid axis shards via a
distributed transform (two all_to_alls per application), not halo
exchange; these tests pin sharded == unsharded for the transform itself
and for the full Born solve (lossless, lossy, adjoint) — the 3D
counterpart of the 2D SPIKE parity suite (tests/test_spike.py).
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from waveforminversionust_tpu.config import PMLConfig
from waveforminversionust_tpu.models.grid3d import Grid3D
from waveforminversionust_tpu.ops import cpx
from waveforminversionust_tpu.ops.born3d import born_series_solve_3d
from waveforminversionust_tpu.parallel.fft3d import (
    born_series_solve_3d_sharded, fft3_sharded, ifft3_sharded)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-device CPU mesh")


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), ("grid",))


def _grid(nz=16, ny=24, nx=11):
    return Grid3D(nx=nx, ny=ny, nz=nz, dx=1e-3, dy=1e-3, dz=1e-3,
                  x0=-(nx - 1) * 0.5e-3, y0=-(ny - 1) * 0.5e-3,
                  z0=-(nz - 1) * 0.5e-3)


def _to_np(u):
    return np.asarray(u.re) + 1j * np.asarray(u.im)


def test_pencil_fft_matches_fftn():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 16, 24, 10))
         + 1j * rng.standard_normal((2, 16, 24, 10))).astype(np.complex64)
    xk = fft3_sharded(cpx.of(x), _mesh())
    ref = np.fft.fftn(x, axes=(-3, -2, -1))
    rel = np.linalg.norm(_to_np(xk) - ref) / np.linalg.norm(ref)
    assert rel < 1e-5, rel


def test_pencil_fft_roundtrip():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((1, 8, 8, 6))
         + 1j * rng.standard_normal((1, 8, 8, 6))).astype(np.complex64)
    mesh = _mesh()
    back = ifft3_sharded(fft3_sharded(cpx.of(x), mesh), mesh)
    rel = np.linalg.norm(_to_np(back) - x) / np.linalg.norm(x)
    assert rel < 1e-5, rel


@pytest.mark.parametrize("mode", ["lossless", "lossy", "adjoint"])
def test_sharded_born3d_matches_unsharded(mode):
    grid = _grid()
    nz, ny, nx = grid.shape
    rng = np.random.default_rng(2)
    vel = np.clip(1500 + 40 * rng.standard_normal((nz, ny, nx)),
                  1400, 1600).astype(np.float32)
    src = np.zeros((2, nz, ny, nx), np.complex64)
    src[0, nz // 2, ny // 2, nx // 2] = 1
    src[1, nz // 3, ny // 3, nx // 2] = 1
    pml = PMLConfig(a0=20.0, l_pml=3e-3)
    kw = {}
    if mode == "lossy":
        kw["attenuation"] = 5.0 * np.abs(
            rng.standard_normal((nz, ny, nx))).astype(np.float32)
    if mode == "adjoint":
        kw["adjoint"] = True
    u_ref, n_ref = born_series_solve_3d(vel, src, 200e3, grid, pml,
                                        iter_cap=200, **kw)
    u_sh, n_sh = born_series_solve_3d_sharded(vel, src, 200e3, grid,
                                              _mesh(), pml, iter_cap=200,
                                              **kw)
    assert int(n_ref) == int(n_sh)
    a, b = _to_np(u_ref), _to_np(u_sh)
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 1e-4, rel


def test_sharded_born3d_rejects_indivisible():
    grid = _grid(nz=12, ny=24)  # 12 % 8 != 0
    src = np.zeros((1,) + grid.shape, np.complex64)
    with pytest.raises(ValueError, match="must divide"):
        born_series_solve_3d_sharded(np.full(grid.shape, 1500.0, np.float32),
                                     src, 200e3, grid, _mesh())


def _cg_problem():
    """Tiny well-conditioned 3D inversion (mirrors tests/test_fwi3d._problem
    with nz/ny multiples of the 8-way mesh): returns (grid, pml, data, C0)."""
    from waveforminversionust_tpu.fwi.fwi3d import (build_fwi_data_3d,
                                                    sample_receivers_3d)
    from waveforminversionust_tpu.models.acquisition3d import (
        build_acquisition3d, cylinder_positions, source_fields_3d)
    from waveforminversionust_tpu.ops import cpx as cpxlib

    C0, F = 1500.0, 200e3
    pml = PMLConfig(a0=20.0, l_pml=6e-3)
    nz, ny, nx = 24, 24, 25
    grid = Grid3D(nx=nx, ny=ny, nz=nz, dx=1e-3, dy=1e-3, dz=1e-3,
                  x0=-(nx - 1) * 0.5e-3, y0=-(ny - 1) * 0.5e-3,
                  z0=-(nz - 1) * 0.5e-3)
    z = grid.z0 + grid.dz * np.arange(nz)
    y = grid.y0 + grid.dy * np.arange(ny)
    x = grid.x0 + grid.dx * np.arange(nx)
    r2 = (z[:, None, None] ** 2 + y[None, :, None] ** 2
          + x[None, None, :] ** 2)
    vel_true = (C0 + 40 * np.exp(-r2 / 4e-3 ** 2)).astype(np.float32)

    pos = cylinder_positions(1, 8, 8e-3, 0.0)
    acq = build_acquisition3d(grid, pos, min_angle=0.8)
    src = source_fields_3d(acq, grid)
    wv, _ = born_series_solve_3d(vel_true, src, F, grid, pml, iter_cap=500)
    rec_obs = sample_receivers_3d(wv, np.asarray(acq.rx_idx))
    data = build_fwi_data_3d(acq, rec_obs, F, grid)
    # Rescale the one-hot-source problem into f32's normal range: the raw
    # receiver perturbations are ~1e-19, so the line-search denominator
    # |drec|^2 ~ 6e-37 sits at the f32 denormal boundary, where different
    # XLA fusion orders (sharded vs not) give O(10%) step-size noise and
    # reject_nonfinite kills later iterations in BOTH paths. Scaling src
    # and rec_obs together is exact (the problem is linear in the source).
    S = 1e6
    data = data._replace(src=cpxlib.scale(data.src, S),
                         rec_obs=cpxlib.scale(data.rec_obs, S))
    return grid, pml, data, C0


def test_grid_sharded_3d_cg_matches_single_device():
    """nonlinear_cg_3d(mesh=...) — the whole 3D inversion with every solve
    running the distributed pencil-FFT CBS over z-slabs — reproduces the
    single-device trajectory (the 3D counterpart of the 2D SPIKE test
    tests/test_spike.py::test_grid_sharded_cg_matches_single_device)."""
    import jax.numpy as jnp

    from waveforminversionust_tpu import FWIConfig
    from waveforminversionust_tpu.fwi.fwi3d import nonlinear_cg_3d

    grid, pml, data, C0 = _cg_problem()
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    fwi = FWIConfig(num_iterations=3, estimate_source_strength=False,
                    clip_velocity=(C0 - 100.0, C0 + 100.0))
    v_ref, m_ref = nonlinear_cg_3d(vel0, data, grid, fwi, pml=pml,
                                   iter_cap=500)
    v_sh, m_sh = nonlinear_cg_3d(vel0, data, grid, fwi, pml=pml,
                                 iter_cap=500, mesh=_mesh())
    loss_ref = np.asarray(m_ref.loss)
    loss_sh = np.asarray(m_sh.loss)
    assert loss_ref[-1] < 0.1 * loss_ref[0], loss_ref  # real convergence
    np.testing.assert_allclose(loss_sh, loss_ref, rtol=1e-2)
    dv_ref = np.asarray(v_ref) - C0
    dv_sh = np.asarray(v_sh) - C0
    rel = np.linalg.norm(dv_sh - dv_ref) / max(np.linalg.norm(dv_ref), 1e-30)
    assert rel < 5e-3, rel  # measured 3.1e-4


def test_grid_sharded_3d_cg_gmres_matches_single_device():
    """The combined 3D levers under the inversion loop: nonlinear_cg_3d
    with mesh= AND solver3d="gmres" (pencil transforms + psum'd Arnoldi)
    tracks the single-device GMRES-CBS trajectory."""
    import jax.numpy as jnp

    from waveforminversionust_tpu import FWIConfig
    from waveforminversionust_tpu.fwi.fwi3d import nonlinear_cg_3d

    grid, pml, data, C0 = _cg_problem()
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    fwi = FWIConfig(num_iterations=2, estimate_source_strength=False,
                    clip_velocity=(C0 - 100.0, C0 + 100.0))
    kw = dict(pml=pml, iter_cap=500, solver3d="gmres", gmres_tol=1e-4,
              gmres_restart=8)
    v_ref, m_ref = nonlinear_cg_3d(vel0, data, grid, fwi, **kw)
    v_sh, m_sh = nonlinear_cg_3d(vel0, data, grid, fwi, mesh=_mesh(), **kw)
    loss_ref = np.asarray(m_ref.loss)
    loss_sh = np.asarray(m_sh.loss)
    assert loss_ref[-1] < 0.5 * loss_ref[0], loss_ref
    np.testing.assert_allclose(loss_sh, loss_ref, rtol=2e-2)
    dv_ref = np.asarray(v_ref) - C0
    dv_sh = np.asarray(v_sh) - C0
    rel = np.linalg.norm(dv_sh - dv_ref) / max(np.linalg.norm(dv_ref), 1e-30)
    assert rel < 2e-2, rel


def test_shot_grid_composed_3d_cg_matches_single_device():
    """Shot DP composed over the pencil grid decomposition: the full 3D
    CG on a 2x4 ("shot", "grid") mesh — transmit batch sharded over
    "shot" (fft3d batch_axis, auto-detected from the mesh name by
    _make_solve_3d), z-slabs over "grid" — matches the single-device
    trajectory for BOTH 3D solvers (fixed-point CBS and GMRES-CBS, whose
    per-shot-group matvec counts are independent)."""
    import jax.numpy as jnp

    from waveforminversionust_tpu import FWIConfig
    from waveforminversionust_tpu.fwi.fwi3d import nonlinear_cg_3d
    from waveforminversionust_tpu.parallel.sharding import (
        shard_fwi_data_3d_shot_grid, shot_grid_mesh)

    grid, pml, data, C0 = _cg_problem()
    mesh = shot_grid_mesh(2, 4, devices=jax.devices()[:8])
    data_sh = shard_fwi_data_3d_shot_grid(data, mesh)
    vel0 = jnp.full(grid.shape, C0, jnp.float32)
    fwi = FWIConfig(num_iterations=2, estimate_source_strength=False,
                    clip_velocity=(C0 - 100.0, C0 + 100.0))
    for kw, rtol in [(dict(), 1e-2),
                     (dict(solver3d="gmres", gmres_tol=1e-4,
                           gmres_restart=8), 2e-2)]:
        v_ref, m_ref = nonlinear_cg_3d(vel0, data, grid, fwi, pml=pml,
                                       iter_cap=500, warm_start=False, **kw)
        v_sh, m_sh = nonlinear_cg_3d(vel0, data_sh, grid, fwi, pml=pml,
                                     iter_cap=500, mesh=mesh, **kw)
        loss_ref, loss_sh = np.asarray(m_ref.loss), np.asarray(m_sh.loss)
        assert loss_ref[-1] < 0.5 * loss_ref[0], (kw, loss_ref)
        np.testing.assert_allclose(loss_sh, loss_ref, rtol=rtol)
        dv_ref = np.asarray(v_ref) - C0
        dv_sh = np.asarray(v_sh) - C0
        rel = (np.linalg.norm(dv_sh - dv_ref)
               / max(np.linalg.norm(dv_ref), 1e-30))
        assert rel < 2e-2, (kw, rel)


@pytest.mark.parametrize("mode", ["lossless", "lossy"])
def test_sharded_gmres_born3d_matches_unsharded(mode):
    """born_gmres_solve_3d_sharded (psum-reduced Arnoldi dots inside the
    pencil shard_map) lands the same solution as the single-device
    Krylov-accelerated CBS at matched tolerance."""
    from waveforminversionust_tpu.ops.born3d import born_gmres_solve_3d
    from waveforminversionust_tpu.parallel.fft3d import (
        born_gmres_solve_3d_sharded)

    grid = _grid()
    nz, ny, nx = grid.shape
    rng = np.random.default_rng(7)
    vel = np.clip(1500 + 40 * rng.standard_normal((nz, ny, nx)),
                  1400, 1600).astype(np.float32)
    src = (rng.standard_normal((2, nz, ny, nx))
           + 1j * rng.standard_normal((2, nz, ny, nx))).astype(np.complex64)
    pml = PMLConfig(a0=20.0, l_pml=3e-3)
    kw = {}
    if mode == "lossy":
        kw["attenuation"] = 5.0 * np.abs(
            rng.standard_normal((nz, ny, nx))).astype(np.float32)
    u_ref, _ = born_gmres_solve_3d(vel, src, 200e3, grid, pml,
                                   tol=1e-5, maxiter=400, restart=8, **kw)
    u_sh, _ = born_gmres_solve_3d_sharded(vel, src, 200e3, grid, _mesh(),
                                          pml, tol=1e-5, maxiter=400,
                                          restart=8, **kw)
    a, b = _to_np(u_ref), _to_np(u_sh)
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 1e-3, rel


def test_pencil_dft_spectral_matches_fftn():
    """The MXU matmul local transforms (spectral="dft") through the pencil
    path: forward == fftn and a solve matches the unsharded FFT solve."""
    rng = np.random.default_rng(5)
    x = (rng.standard_normal((2, 16, 24, 10))
         + 1j * rng.standard_normal((2, 16, 24, 10))).astype(np.complex64)
    mesh = _mesh()
    xk = fft3_sharded(cpx.of(x), mesh, spectral="dft")
    ref = np.fft.fftn(x, axes=(-3, -2, -1))
    rel = np.linalg.norm(_to_np(xk) - ref) / np.linalg.norm(ref)
    assert rel < 1e-5, rel
    back = ifft3_sharded(xk, mesh, spectral="dft")
    rel2 = np.linalg.norm(_to_np(back) - x) / np.linalg.norm(x)
    assert rel2 < 1e-5, rel2

    grid = _grid()
    z = grid.z0 + grid.dz * np.arange(grid.nz)
    y = grid.y0 + grid.dy * np.arange(grid.ny)
    xx = grid.x0 + grid.dx * np.arange(grid.nx)
    r2 = (z[:, None, None] ** 2 + y[None, :, None] ** 2
          + xx[None, None, :] ** 2)
    vel = (1500 + 50 * np.exp(-r2 / 4e-3 ** 2)).astype(np.float32)
    src = (rng.standard_normal((2,) + grid.shape)
           + 1j * rng.standard_normal((2,) + grid.shape)).astype(np.complex64)
    pml = PMLConfig(a0=20.0, l_pml=5e-3)
    u_ref, _ = born_series_solve_3d(vel, src, 250e3, grid, pml, iter_cap=300)
    u_sh, _ = born_series_solve_3d_sharded(vel, src, 250e3, grid, mesh, pml,
                                           iter_cap=300, spectral="dft")
    d = np.linalg.norm(_to_np(u_sh) - _to_np(u_ref))
    assert d / np.linalg.norm(_to_np(u_ref)) < 1e-4, d


def test_invert_dataset_3d_grid_sharded_matches_single_device():
    """The turnkey 3D driver with mesh= runs every stage grid-sharded
    (pencil-FFT CBS over z-slabs) and reproduces the single-device result
    — certifying the driver-level plumbing above nonlinear_cg_3d."""
    import jax.numpy as jnp

    from waveforminversionust_tpu import FWIConfig
    from waveforminversionust_tpu.fwi.runner3d import invert_dataset_3d

    grid, pml, data, C0 = _cg_problem()
    fwi = FWIConfig(c_init=C0, num_iterations=2,
                    estimate_source_strength=False,
                    clip_velocity=(C0 - 100.0, C0 + 100.0))
    ref = invert_dataset_3d(data, grid, fwi, pml=pml, iter_cap=500,
                            solver3d="cbs")
    sh = invert_dataset_3d(data, grid, fwi, pml=pml, iter_cap=500,
                           solver3d="cbs", mesh=_mesh())
    np.testing.assert_allclose(sh.metrics["loss"], ref.metrics["loss"],
                               rtol=1e-2)
    dv_ref = ref.velocity - C0
    dv_sh = sh.velocity - C0
    rel = np.linalg.norm(dv_sh - dv_ref) / max(np.linalg.norm(dv_ref),
                                               1e-30)
    assert rel < 5e-3, rel
