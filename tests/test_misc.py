"""Viz, checkpoint, CLI and phantom coverage."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from waveforminversionust_tpu import Grid2D
from waveforminversionust_tpu.models.phantom import (breast_phantom,
                                                     disk_phantom,
                                                     phantom_from_image,
                                                     smooth_blob_phantom)
from waveforminversionust_tpu.utils.checkpoint import load_state, save_state
from waveforminversionust_tpu.utils.host import fetch, fetch_tree
from waveforminversionust_tpu import viz


def test_phantoms_physical():
    grid = Grid2D.centered(120e-3, 2e-3)
    for ph in (breast_phantom(grid), disk_phantom(grid, 30e-3),
               smooth_blob_phantom(grid, 30e-3)):
        assert ph.shape == grid.shape
        assert 1300 < ph.min() <= ph.max() < 1700
        assert ph.dtype == np.float32
    # deterministic by seed
    np.testing.assert_array_equal(breast_phantom(grid, seed=5),
                                  breast_phantom(grid, seed=5))


def test_phantom_from_image():
    grid = Grid2D.centered(30e-3, 1e-3)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (64, 64))
    ph = phantom_from_image(grid, img, pixel_size=0.7e-3)
    assert ph.shape == grid.shape
    # outside the image footprint -> background
    assert ph[0, 0] == pytest.approx(1500.0)
    assert ph.std() > 1.0  # content mapped in


def test_fetch_complex_roundtrip():
    z = jnp.full((4, 5), 1.5 - 2.5j, jnp.complex64)
    out = fetch(z)
    assert out.dtype.kind == "c"
    np.testing.assert_allclose(out, np.full((4, 5), 1.5 - 2.5j))
    tree = fetch_tree({"a": z, "b": jnp.ones(3)})
    assert tree["a"].dtype.kind == "c" and tree["b"].dtype.kind == "f"


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "velocity": np.random.default_rng(0).standard_normal((7, 9)).astype(np.float32),
        "stage": np.int32(3),
        "frequency": np.float64(2.5e5),
    }
    path = str(tmp_path / "ckpt")
    save_state(path, state)
    back = load_state(path)
    np.testing.assert_array_equal(back["velocity"], state["velocity"])
    assert int(back["stage"]) == 3
    assert float(back["frequency"]) == 2.5e5


def test_viz_smoke(tmp_path):
    grid = Grid2D.centered(12e-3, 1e-3)
    ny, nx = grid.shape
    vel = breast_phantom(grid)
    wv = jnp.ones((2, ny, nx), jnp.complex64)
    viz.plot_wavefields(grid, wv, wv, path=str(tmp_path / "wv.png"))
    viz.plot_reconstruction(grid, jnp.asarray(vel),
                            search_dir=jnp.zeros(grid.shape),
                            gradient=jnp.zeros(grid.shape),
                            true_map=vel, path=str(tmp_path / "rec.png"))
    viz.plot_convergence({"loss": np.logspace(0, -3, 10),
                          "grad_norm": np.logspace(1, -2, 10),
                          "step_size": np.ones(10)},
                         path=str(tmp_path / "conv.png"))
    for f in ("wv.png", "rec.png", "conv.png"):
        assert os.path.getsize(tmp_path / f) > 10_000


def test_cli_simulate_and_run(tmp_path):
    from waveforminversionust_tpu.cli import main
    data_path = str(tmp_path / "tiny.mat")
    main(["simulate", data_path, "--xmax", "12e-3", "--dx", "0.4e-3",
          "--elements", "16", "--radius", "9e-3", "--frequency", "200e3"])
    assert os.path.exists(data_path)
    main(["run", data_path, "--iterations", "1",
          "--grid-xmax", "12e-3", "--grid-dx", "0.8e-3",
          "--elements", "16", "--radius", "9e-3", "--exclude", "2",
          "--out", str(tmp_path / "vel.npy"),
          "--plot", str(tmp_path / "rec.png")])
    assert os.path.exists(tmp_path / "vel.npy")
    assert os.path.exists(tmp_path / "rec.png")


def test_cli_alpha_inversion(tmp_path):
    """--method alpha: the CLI attenuation-inversion path runs end to end
    and writes the recovered map (framework addition; lossless reference)."""
    from waveforminversionust_tpu.cli import main
    data_path = str(tmp_path / "tiny.mat")
    main(["simulate", data_path, "--xmax", "12e-3", "--dx", "0.4e-3",
          "--elements", "12", "--radius", "4.5e-3", "--frequency", "200e3"])
    main(["run", data_path, "--method", "alpha", "--iterations", "2",
          "--grid-xmax", "12e-3", "--grid-dx", "0.8e-3",
          "--elements", "12", "--radius", "4.5e-3", "--exclude", "1",
          "--out", str(tmp_path / "alpha.npy"),
          "--plot", str(tmp_path / "alpha.png")])
    assert os.path.exists(tmp_path / "alpha.npy")
    assert os.path.exists(tmp_path / "alpha.png")
    import numpy as np
    a = np.load(tmp_path / "alpha.npy")
    assert a.shape == (31, 31) and np.all(np.isfinite(a))


def test_cli_mat_export(tmp_path):
    """--out file.mat writes a MATLAB-compatible export of the recovered
    map (VEL_F/xi/yi/loss — the reference's workspace variable names,
    FrequencyDomainFWI.m:49-55 / nonlinearcg.py:41-55) that round-trips
    through the v7.3 reader."""
    import numpy as np

    from waveforminversionust_tpu.cli import main
    from waveforminversionust_tpu.data.matio import load_mat
    data_path = str(tmp_path / "tiny.mat")
    main(["simulate", data_path, "--xmax", "12e-3", "--dx", "0.4e-3",
          "--elements", "16", "--radius", "9e-3", "--frequency", "200e3"])
    out = tmp_path / "recon.mat"
    main(["run", data_path, "--iterations", "1",
          "--grid-xmax", "12e-3", "--grid-dx", "0.8e-3",
          "--elements", "16", "--radius", "9e-3", "--exclude", "2",
          "--precondition", "illumination",
          "--out", str(out)])
    d = load_mat(str(out))
    assert d["VEL_F"].shape == (31, 31)
    assert d["xi"].size == 31 and d["yi"].size == 31
    assert d["loss"].size == 1 and np.all(np.isfinite(d["loss"]))


def test_cli_broadband(tmp_path):
    """`broadband` runs the whole time-domain -> extraction -> continuation
    workflow at toy scale and writes the reconstruction plot."""
    from waveforminversionust_tpu.cli import main
    main(["broadband", "--xmax", "12e-3", "--fine-dx", "0.4e-3",
          "--inv-dx", "0.8e-3", "--elements", "12", "--radius", "9e-3",
          "--exclude", "2", "--f-low", "0.15e6", "--f-high", "0.25e6",
          "--df", "0.05e6", "--freqs", "0.15e6", "0.25e6",
          "--iterations", "1", "--c-init", "1500",
          "--plot", str(tmp_path / "bb.png")])
    assert os.path.exists(tmp_path / "bb.png")


def test_cli_broadband_traveltime_init(capsys):
    """`broadband --traveltime-init --traveltime-method bent` picks arrivals
    off the gated traces and starts the continuation from the bent-ray
    (eikonal) tomogram."""
    from waveforminversionust_tpu.cli import main
    main(["broadband", "--xmax", "12e-3", "--fine-dx", "0.4e-3",
          "--inv-dx", "0.8e-3", "--elements", "12", "--radius", "9e-3",
          "--exclude", "2", "--f-low", "0.15e6", "--f-high", "0.25e6",
          "--df", "0.05e6", "--freqs", "0.25e6",
          "--iterations", "1", "--c-init", "1500",
          "--traveltime-init", "--traveltime-method", "bent",
          "--gate", "2e-6", "5e-6", "2e-6"])
    out = capsys.readouterr().out
    assert "travel-time starting model RMSE" in out


def test_cli_broadband3d(tmp_path):
    """`broadband3d` runs the volumetric broadband workflow at toy scale
    and writes the slice plot + volume."""
    from waveforminversionust_tpu.cli import main
    main(["broadband3d", "--xmax", "12e-3", "--dx", "1e-3",
          "--rings", "2", "--per-ring", "8", "--radius", "8e-3",
          "--z-span", "6e-3", "--min-angle", "0.8", "--l-pml", "12e-3",
          "--f-low", "0.2e6", "--f-high", "0.3e6", "--df", "0.05e6",
          "--freqs", "0.25e6", "--iterations", "1",
          "--out", str(tmp_path / "vol.npy"),
          "--plot", str(tmp_path / "bb3.png")])
    assert os.path.exists(tmp_path / "bb3.png")
    import numpy as np
    v = np.load(tmp_path / "vol.npy")
    assert v.shape == (25, 25, 25) and np.all(np.isfinite(v))


def test_cli_broadband3d_encoded_scattered(capsys):
    """`broadband3d --encode --scattered --chunk` drives the
    weak-contrast levers (supershots + background subtraction + chunked
    scan) through the CLI."""
    from waveforminversionust_tpu.cli import main
    main(["broadband3d", "--xmax", "12e-3", "--dx", "1e-3",
          "--rings", "2", "--per-ring", "8", "--radius", "8e-3",
          "--z-span", "6e-3", "--min-angle", "0", "--l-pml", "6e-3",
          "--f-low", "0.2e6", "--f-high", "0.3e6", "--df", "0.05e6",
          "--freqs", "0.25e6", "--iterations", "2",
          "--encode", "4", "--scattered", "--chunk", "1", "--dv", "80"])
    out = capsys.readouterr().out
    assert "reconstruction RMSE vs phantom" in out


def test_cli_qc_compensate(tmp_path, capsys):
    """`run --qc-compensate` applies reciprocity QC + per-element response
    compensation in-line (the turnkey form of `qc --out` then `run`; with
    --calibrate this is the quality-record intake chain)."""
    from waveforminversionust_tpu.cli import main
    data_path = str(tmp_path / "tiny.mat")
    main(["simulate", data_path, "--xmax", "12e-3", "--dx", "0.4e-3",
          "--elements", "16", "--radius", "9e-3", "--frequency", "200e3"])
    main(["run", data_path, "--qc-compensate", "--iterations", "1",
          "--grid-xmax", "12e-3", "--grid-dx", "0.8e-3",
          "--elements", "16", "--radius", "9e-3", "--exclude", "2",
          "--out", str(tmp_path / "vel_qc.npy")])
    out = capsys.readouterr().out
    assert "qc: reciprocity asymmetry" in out
    # the synthesizer's random element amplitudes are the asymmetry source;
    # compensation must land well below the raw value
    import re
    m = re.search(r"asymmetry ([\d.eE+-]+) -> ([\d.eE+-]+)", out)
    assert m and float(m.group(2)) < 0.1 * float(m.group(1))
    import numpy as np
    v = np.load(tmp_path / "vel_qc.npy")
    assert v.shape == (31, 31) and np.all(np.isfinite(v))


def test_cli_gauss_newton_method(tmp_path):
    """`run --method gn` drives the Gauss-Newton optimizer from the CLI."""
    from waveforminversionust_tpu.cli import main
    data_path = str(tmp_path / "tiny.mat")
    main(["simulate", data_path, "--xmax", "12e-3", "--dx", "0.4e-3",
          "--elements", "16", "--radius", "9e-3", "--frequency", "200e3"])
    main(["run", data_path, "--method", "gn", "--iterations", "2",
          "--grid-xmax", "12e-3", "--grid-dx", "0.8e-3",
          "--elements", "16", "--radius", "9e-3", "--exclude", "2",
          "--out", str(tmp_path / "vel_gn.npy")])
    import numpy as np
    v = np.load(tmp_path / "vel_gn.npy")
    assert v.shape == (31, 31) and np.all(np.isfinite(v))
