"""Background (water) speed calibration: the projected homogeneous-medium
misfit scan must recover the true background speed from ring data, including
through the turnkey dataset entry point. The reference has no calibration —
it hardcodes c_init = 1480 (fwi_script.py:90); this is the standard UST
preprocessing step that defends the FWI start against cycle skipping."""

import numpy as np
import pytest

from waveforminversionust_tpu import (AcquisitionConfig, Grid2D, PMLConfig,
                                      SolverConfig,
                                      calibrate_background_speed)
from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
from waveforminversionust_tpu.fwi.calibrate import background_misfit_fn
from waveforminversionust_tpu.fwi.objective import build_fwi_data
from waveforminversionust_tpu.models.acquisition import (
    build_ring_acquisition, ring_positions, snap_to_grid)
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom

F = 200e3
C0 = 1520.0  # deliberately NOT the reference's 1480 hardcode

ACQ = AcquisitionConfig(num_elements=32, radius=18e-3,
                        num_excluded_each_side=5)
SOLVER = SolverConfig(pml=PMLConfig(l_pml=4e-3))


@pytest.fixture(scope="module")
def dataset():
    """Blob-in-water acquisition, anti-inverse-crime (0.4 mm synthesis vs
    0.8 mm calibration grid), element positions snapped to the coarse grid
    so both grids place them identically (see synthesize_ring_dataset)."""
    coarse = Grid2D.centered(24e-3, 0.8e-3)
    xe, ye = ring_positions(ACQ.num_elements, ACQ.radius)
    xi, yi = snap_to_grid(coarse, xe, ye)
    xs, ys = coarse.x[xi], coarse.y[yi]
    fine = Grid2D.centered(24e-3, 0.4e-3)
    true_vel = smooth_blob_phantom(fine, radius=6e-3, dc=25, c_bkgnd=C0)
    ds = synthesize_ring_dataset(true_vel, fine, ACQ, f=F, seed=5,
                                 solver=SOLVER, x_elem=xs, y_elem=ys)
    ds_homog = synthesize_ring_dataset(np.full(fine.shape, C0, np.float32),
                                       fine, ACQ, f=F, seed=6, solver=SOLVER,
                                       x_elem=xs, y_elem=ys)
    return coarse, ds, ds_homog


def test_calibration_recovers_background(dataset):
    coarse, ds, ds_homog = dataset
    # Pure water bath: sharp recovery of the true speed (the residual m/s-
    # level offset is the anti-inverse-crime discretization difference).
    res_h = calibrate_background_speed(ds_homog, grid=coarse, acquisition=ACQ,
                                       solver=SOLVER, c_min=1440.0,
                                       c_max=1600.0, num=9, levels=2)
    assert abs(res_h.c0 - C0) < 3.0, res_h.c0
    # Blob in water: the best homogeneous fit sits at the path-averaged
    # speed — a few m/s ABOVE the water speed for a +25 m/s inclusion
    # (measured +6.6 here), never below it.
    res = calibrate_background_speed(ds, grid=coarse, acquisition=ACQ,
                                     solver=SOLVER, c_min=1440.0,
                                     c_max=1600.0, num=9, levels=2)
    assert C0 - 3.0 < res.c0 < C0 + 12.0, res.c0
    assert abs(res.c_grid_best - C0) < 15.0
    # Diagnostics: 2 levels x 9 candidates, relative misfit in (0, 1],
    # candidates sorted, and the curve is genuinely discriminating.
    assert res.candidates.shape == (18,) and res.misfits.shape == (18,)
    assert np.all(np.diff(res.candidates) >= 0)
    assert 0.0 < res.misfits.min() < 0.5 * res.misfits.max()


def test_calibration_prebuilt_data_and_misfit_curve(dataset):
    """The data=/grid= entry point matches the dataset path, and the jitted
    J(c) is reusable across candidates (one compile, many calls)."""
    coarse, ds, _ = dataset
    acq = build_ring_acquisition(coarse, ACQ, x_elem=ds.x_circ,
                                 y_elem=ds.y_circ)
    data = build_fwi_data(acq, ds.rec_data, ds.f)
    res = calibrate_background_speed(data=data, grid=coarse, solver=SOLVER,
                                     c_min=1460.0, c_max=1580.0, num=7,
                                     levels=2)
    assert C0 - 3.0 < res.c0 < C0 + 12.0, res.c0
    J = background_misfit_fn(data, coarse, SOLVER)
    j_true = float(J(C0))
    j_off = float(J(C0 - 60.0))
    assert j_true < j_off
    with pytest.raises(ValueError):
        calibrate_background_speed(data=data)  # grid= required
    with pytest.raises(ValueError):
        calibrate_background_speed()


def test_receiver_sensitivity_estimation(dataset):
    """Per-element receiver sensitivities injected into the data are
    recovered (up to one global scale) by variable projection against a
    forward solve at the true model, and compensation restores the misfit."""
    import jax

    from waveforminversionust_tpu.fwi.calibrate import (
        background_misfit_fn, estimate_receiver_sensitivities)

    coarse, ds, _ = dataset
    acq = build_ring_acquisition(coarse, ACQ, x_elem=ds.x_circ,
                                 y_elem=ds.y_circ)
    rng = np.random.default_rng(11)
    s_true = (rng.uniform(0.5, 2.0, ACQ.num_elements)
              * np.exp(1j * rng.uniform(-np.pi, np.pi, ACQ.num_elements)))
    rec_scaled = np.asarray(ds.rec_data)[acq.tx_include] * s_true[None, :]
    data = build_fwi_data(acq, rec_scaled, ds.f)
    vel_true = smooth_blob_phantom(coarse, radius=6e-3, dc=25, c_bkgnd=C0)

    s_est, data_c = estimate_receiver_sensitivities(data, acq, vel_true,
                                                    coarse, SOLVER)
    observed = np.zeros(ACQ.num_elements, bool)
    observed[np.asarray(acq.rx_indices).ravel()] = True
    r = (s_est / s_true)[observed]
    mags = np.abs(r)
    assert np.std(mags) / np.mean(mags) < 0.05, np.std(mags) / np.mean(mags)
    phases = np.angle(r * np.conj(r[0]))
    assert np.max(np.abs(phases)) < 0.15, np.max(np.abs(phases))
    # The projected misfit at the true model: sensitivities inflate it by
    # orders of magnitude; compensation restores the clean-data level.
    j_scaled = float(jax.device_get(
        background_misfit_fn(data, coarse, SOLVER)(C0)))
    j_comp = float(jax.device_get(
        background_misfit_fn(data_c, coarse, SOLVER)(C0)))
    clean = build_fwi_data(acq, np.asarray(ds.rec_data)[acq.tx_include], ds.f)
    j_clean = float(jax.device_get(
        background_misfit_fn(clean, coarse, SOLVER)(C0)))
    assert j_comp < 0.2 * j_scaled
    assert j_comp < 1.5 * j_clean


def test_runner_receiver_calibration(dataset):
    """invert_dataset(receiver_calibration=True) on receiver-scaled data
    reproduces the clean-data inversion; without it the trajectory is
    visibly corrupted."""
    from waveforminversionust_tpu import FWIConfig
    from waveforminversionust_tpu.fwi.runner import invert_dataset

    coarse, ds, _ = dataset
    rng = np.random.default_rng(13)
    ne = ACQ.num_elements
    s_true = (rng.uniform(0.5, 2.0, ne)
              * np.exp(1j * rng.uniform(-np.pi, np.pi, ne)))
    ds_scaled = ds._replace(
        rec_data=(np.asarray(ds.rec_data) * s_true[None, :]).astype(
            np.complex64))
    fwi = FWIConfig(c_init=C0, num_iterations=2)
    kw = dict(grid=coarse, acquisition=ACQ, solver=SOLVER, fwi=fwi)
    v_clean = invert_dataset(ds, **kw).velocity
    v_cal = invert_dataset(ds_scaled, receiver_calibration=True,
                           **kw).velocity
    v_raw = invert_dataset(ds_scaled, **kw).velocity
    err_cal = np.linalg.norm(v_cal - v_clean)
    err_raw = np.linalg.norm(v_raw - v_clean)
    assert err_cal < 0.2 * err_raw, (err_cal, err_raw)


def test_calibration_3d():
    """3D: the projected homogeneous-volume misfit recovers the background
    speed of a blob-in-water volume, and scattered-field data is refused
    (its direct arrival — the calibration signal — has been subtracted)."""
    import jax.numpy as jnp

    from waveforminversionust_tpu.fwi.calibrate import (
        calibrate_background_speed_3d)
    from waveforminversionust_tpu.fwi.fwi3d import (build_fwi_data_3d,
                                                    sample_receivers_3d)
    from waveforminversionust_tpu.models.acquisition3d import (
        build_acquisition3d, cylinder_positions, source_fields_3d)
    from waveforminversionust_tpu.models.grid3d import Grid3D
    from waveforminversionust_tpu.ops.born3d import born_gmres_solve_3d

    c3 = 1500.0
    pml = PMLConfig(a0=20.0, l_pml=6e-3)
    grid = Grid3D.centered(12e-3, 1.0e-3)
    pos = cylinder_positions(1, 8, 8e-3, 0.0)
    acq = build_acquisition3d(grid, pos, min_angle=0.8)
    z = grid.z0 + grid.dz * jnp.arange(grid.nz)
    y = grid.y0 + grid.dy * jnp.arange(grid.ny)
    x = grid.x0 + grid.dx * jnp.arange(grid.nx)
    r2 = (z[:, None, None] ** 2 + y[None, :, None] ** 2
          + x[None, None, :] ** 2)
    vel_true = (c3 + 30.0 * jnp.exp(-r2 / 4e-3 ** 2)).astype(jnp.float32)
    # O(1e6) source scale: the f32 denormal guard for tiny 3D problems.
    src = source_fields_3d(acq, grid) * 1e6
    wv, _ = born_gmres_solve_3d(vel_true, src, F, grid, pml, tol=1e-6)
    data = build_fwi_data_3d(
        acq, sample_receivers_3d(wv, np.asarray(acq.rx_idx)), F, grid
    )._replace(src=src)
    res = calibrate_background_speed_3d(data, grid, pml=pml, gmres_tol=1e-5,
                                        c_min=1420.0, c_max=1580.0, num=7,
                                        levels=2)
    assert c3 - 4.0 < res.c0 < c3 + 12.0, res.c0
    with pytest.raises(ValueError):
        from waveforminversionust_tpu.ops.cpx import Cpx
        calibrate_background_speed_3d(
            data._replace(rec_ref=data.rec_obs), grid, pml=pml)


def test_cli_calibrate(tmp_path, capsys):
    """`run --calibrate CMIN:CMAX:NUM` calibrates before inverting and
    reports the estimate."""
    from waveforminversionust_tpu.cli import main
    data_path = str(tmp_path / "tiny.mat")
    main(["simulate", data_path, "--xmax", "12e-3", "--dx", "0.4e-3",
          "--elements", "16", "--radius", "9e-3", "--frequency", "200e3"])
    main(["run", data_path, "--iterations", "1", "--calibrate",
          "1440:1560:4", "--grid-xmax", "12e-3", "--grid-dx", "0.8e-3",
          "--elements", "16", "--radius", "9e-3", "--exclude", "2"])
    out = capsys.readouterr().out
    line = [ln for ln in out.splitlines()
            if ln.startswith("calibrated background speed")]
    assert line, out
    c0 = float(line[0].split(":")[1].split()[0])
    assert 1440.0 <= c0 <= 1560.0


def test_zoom_search_respects_bracket_and_global_argmin():
    """The zoomed bracket must stay inside [c_min, c_max] even when a
    level's argmin lands on an endpoint, and c_grid_best is the argmin over
    ALL levels' candidates (not just the last level's)."""
    from waveforminversionust_tpu.fwi.calibrate import _zoom_search

    evaluated = []

    def J(c):  # minimum far below the bracket: every level argmins at c_min
        evaluated.append(float(c))
        return (float(c) - 1000.0) ** 2

    res = _zoom_search(J, 1400.0, 1600.0, num=5, levels=3)
    assert min(evaluated) >= 1400.0 and max(evaluated) <= 1600.0
    assert res.c_grid_best == 1400.0
    assert res.c0 >= 1400.0
    # candidates are reported sorted ascending, misfits aligned.
    assert np.all(np.diff(res.candidates) >= 0)
    assert res.misfits[0] == min(res.misfits)

    # A non-convex J where an EARLY level's candidate is the global discrete
    # best: later zoom levels never re-evaluate it, but c_grid_best must
    # still report it.
    def J2(c):
        # sharp global min at exactly 1450 (a level-0 candidate for
        # num=5 over [1400, 1600]); smooth decoy basin near 1540.
        return min(abs(float(c) - 1450.0) * 10.0 + 1.0,
                   (float(c) - 1540.0) ** 2 / 100.0 + 2.0)

    res2 = _zoom_search(J2, 1400.0, 1600.0, num=5, levels=2)
    assert res2.c_grid_best == 1450.0


def test_cli_calibrate_spec_validation():
    """Malformed --calibrate specs exit with a usage message, not a raw
    IndexError/ValueError traceback."""
    from waveforminversionust_tpu.cli import _parse_calibrate_spec

    assert _parse_calibrate_spec("1400:1600") == (1400.0, 1600.0, 9)
    assert _parse_calibrate_spec("1400:1600:5") == (1400.0, 1600.0, 5)
    for bad in ("1500", "1400-1600", "1600:1400", "a:b", "1400:1600:2",
                "1400:1600:9:9", "1400:1600:x"):
        with pytest.raises(SystemExit, match="CMIN:CMAX"):
            _parse_calibrate_spec(bad)
