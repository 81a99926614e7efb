"""Edge-case coverage: operator-API method variants, downsampled transmit
subsets, split warm starts, Cpx checkpointing, ComplexParts plotting."""


import jax.numpy as jnp
import numpy as np

from waveforminversionust_tpu import (AcquisitionConfig, FWIConfig, Grid2D,
                                      PMLConfig, SolverConfig, SolverMethod,
                                      build_ring_acquisition)
from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
from waveforminversionust_tpu.fwi.objective import build_fwi_data
from waveforminversionust_tpu.fwi.optimizers import nonlinear_cg
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom
from waveforminversionust_tpu.ops import cpx
from waveforminversionust_tpu.ops.solve import (helmholtz_operator_solve,
                                                make_helmholtz_operator,
                                                solve_helmholtz)

F = 350e3
PML = PMLConfig(l_pml=2.4e-3)


def _tiny():
    grid = Grid2D.centered(12e-3, 0.8e-3)
    vel = smooth_blob_phantom(grid, radius=4e-3, dc=30)
    ny, nx = grid.shape
    src = np.zeros((2, ny, nx), np.complex64)
    src[0, ny // 2, nx // 2] = 1.0
    src[1, ny // 3, 2 * nx // 3] = 1.0 - 0.5j
    return grid, vel, src


def test_operator_api_gmres_method_matches_banded():
    grid, vel, src = _tiny()
    cfg_g = SolverConfig(method=SolverMethod.GMRES, pml=PML, tol=1e-5,
                         maxiter=4000)
    cfg_b = SolverConfig(method=SolverMethod.BANDED, pml=PML)
    op_g = make_helmholtz_operator(vel, F, grid, cfg_g)
    op_b = make_helmholtz_operator(vel, F, grid, cfg_b)
    for adjoint in (False, True):
        u_g = helmholtz_operator_solve(op_g, jnp.array(src), grid, cfg_g,
                                       adjoint=adjoint)
        u_b = helmholtz_operator_solve(op_b, jnp.array(src), grid, cfg_b,
                                       adjoint=adjoint)
        rel = float(jnp.linalg.norm(u_g - u_b) / jnp.linalg.norm(u_b))
        assert rel < 5e-3, (adjoint, rel)


def test_build_fwi_data_with_tx_downsample():
    grid, vel, _ = _tiny()
    acq_cfg = AcquisitionConfig(num_elements=16, radius=9e-3,
                                num_excluded_each_side=1, tx_downsample=4)
    acq = build_ring_acquisition(grid, acq_cfg)
    assert acq.num_tx == 4
    rec_full = (np.arange(16 * 16).reshape(16, 16)
                + 1j * np.ones((16, 16))).astype(np.complex64)
    data = build_fwi_data(acq, rec_full, F)
    assert data.src.shape[0] == 4
    assert data.rec_obs.shape == (4, acq.num_active_rx)
    # row i of rec_obs comes from transmit element tx_include[i]
    np.testing.assert_allclose(
        np.asarray(data.rec_obs[1]).real,
        rec_full[acq.tx_include[1], acq.rx_indices[1]].real)


def test_split_warm_start_matches_cold():
    grid, vel, src = _tiny()
    cfg = SolverConfig(pml=PML, split_complex=True, refine=1)
    u0, _ = solve_helmholtz(vel, src, F, grid, cfg)
    u1, _ = solve_helmholtz(vel, src, F, grid, cfg,
                            x0=cpx.Cpx(u0.re * 1.01, u0.im * 1.01))
    diff = float(jnp.sqrt(cpx.abs2(u1 - u0).sum() / cpx.abs2(u0).sum()))
    assert diff < 1e-4


def test_checkpoint_with_cpx_tree(tmp_path):
    from waveforminversionust_tpu.utils.checkpoint import load_state, save_state
    rng = np.random.default_rng(0)
    field = cpx.of((rng.standard_normal((4, 5))
                    + 1j * rng.standard_normal((4, 5))).astype(np.complex64))
    state = {"wavefield_re": field.re, "wavefield_im": field.im,
             "velocity": jnp.ones((4, 5))}
    path = str(tmp_path / "c")
    save_state(path, state)
    back = load_state(path)
    np.testing.assert_allclose(np.asarray(back["wavefield_re"]),
                               np.asarray(field.re))


def test_plot_wavefields_from_split_cg_result(tmp_path):
    grid, vel, _ = _tiny()
    acq_cfg = AcquisitionConfig(num_elements=8, radius=9e-3,
                                num_excluded_each_side=1)
    solver = SolverConfig(pml=PML, split_complex=True)
    ds = synthesize_ring_dataset(vel, grid, acq_cfg, f=F, seed=0,
                                 solver=SolverConfig(pml=PML))
    acq = build_ring_acquisition(grid, acq_cfg, x_elem=ds.x_circ,
                                 y_elem=ds.y_circ)
    data = build_fwi_data(acq, ds.rec_data, F, split=True)
    res = nonlinear_cg(jnp.full(grid.shape, 1500.0, jnp.float32), data, grid,
                       solver, FWIConfig(num_iterations=1))
    from waveforminversionust_tpu import viz
    import os
    viz.plot_wavefields(grid, res.wavefield, res.adjoint_field,
                        path=str(tmp_path / "wv.png"))
    assert os.path.getsize(tmp_path / "wv.png") > 10_000


def test_nonsquare_grid_full_pipeline():
    """The reference silently requires square grids (SURVEY Appendix A); our
    pipeline must work on non-square ones end to end."""
    grid = Grid2D(nx=41, ny=31, dx=0.8e-3, dy=0.8e-3, x0=-16e-3, y0=-12e-3)
    rng = np.random.default_rng(0)
    X, Y = grid.meshgrid()
    vel = (1500 + 30 * np.exp(-(X ** 2 + Y ** 2) / (2 * 16e-6))).astype(np.float32)
    ny, nx = grid.shape
    src = np.zeros((2, ny, nx), np.complex64)
    src[0, ny // 2, 5] = 1.0
    src[1, 5, nx // 2] = 1.0
    for split in (False, True):
        cfg = SolverConfig(pml=PML, split_complex=split)
        u, info = solve_helmholtz(vel, src, F, grid, cfg)
        assert float(np.asarray(info.rel_residual).max()) < 1e-4


def test_plot_time_snapshots_split_fields(tmp_path):
    """plot_time_snapshots accepts split-complex (Cpx) wavefields — the
    representation the TPU time-domain path returns (as_numpy_complex must
    unpack Cpx, not stack its planes into a (2, ny, nx) pseudo-image)."""
    from waveforminversionust_tpu import viz
    from waveforminversionust_tpu.data.timedomain import TimeDomainResult

    grid, _, _ = _tiny()
    ny, nx = grid.shape
    nt = 4
    rng = np.random.default_rng(0)
    fields = cpx.Cpx(
        jnp.asarray(rng.standard_normal((nt, ny, nx)), jnp.float32),
        jnp.asarray(rng.standard_normal((nt, ny, nx)), jnp.float32))
    res = TimeDomainResult(
        times=np.linspace(0, 1e-5, nt), freqs=np.array([3e5]),
        wavefields_t=fields,
        channel_data=rng.standard_normal((nt, 8)).astype(np.float32))
    out = str(tmp_path / "td.png")
    viz.plot_time_snapshots(grid, res, n_frames=3, path=out)
    import os
    assert os.path.exists(out)
