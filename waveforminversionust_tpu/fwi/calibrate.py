"""Background (water) sound-speed calibration from the recorded data.

The reference hardcodes its homogeneous starting speed, c_init = 1480 m/s
(reference: fwi_script.py:90, FrequencyDomainFWI.m:46). Real ring-array UST
acquisitions calibrate the coupling-medium (water-bath) speed from the data
itself: after per-shot variable projection of the unknown source strengths,
the homogeneous-medium misfit J(c) has a sharp minimum at the true
background speed, because the transmit-receive paths are water-dominated. A
wrong background shifts every arrival phase coherently and is the dominant
cause of cycle-skipped starting models at these apertures — calibration is
the cheap first line of defense, before travel-time tomography
(fwi.traveltime) is even needed.

TPU-native shape: ONE jitted program — a full multi-RHS homogeneous
Helmholtz solve (the same fused direct kernels as an FWI iteration) plus
the projected misfit — re-executed over the candidate ladder. The candidate
speed is a traced scalar argument, so the compile is paid once for the
whole search; a multi-level zoom plus a parabolic fit of the discrete
minimum delivers sub-grid resolution with ~num + levels*... solves total.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AcquisitionConfig, SolverConfig
from ..models.acquisition import build_ring_acquisition
from ..models.grid import Grid2D
from ..ops import cpx
from ..ops.cpx import Cpx
from ..ops.solve import auto_split, solve_helmholtz
from .objective import (FWIData, build_fwi_data, estimate_source_strengths,
                        misfit, sample_receivers)


class CalibrationResult(NamedTuple):
    """Outcome of :func:`calibrate_background_speed`.

    Attributes:
        c0: calibrated background speed [m/s] (parabolic sub-grid estimate).
        candidates: (n,) all candidate speeds evaluated, sorted ascending.
        misfits: (n,) relative misfit ``J(c) / (0.5 sum |d|^2)`` per candidate.
        c_grid_best: best DISCRETE candidate (argmin of ``misfits`` over all
            levels' candidates).
    """

    c0: float
    candidates: np.ndarray
    misfits: np.ndarray
    c_grid_best: float


def background_misfit_fn(data: FWIData, grid: Grid2D,
                         solver: SolverConfig = SolverConfig()):
    """Jitted ``J(c)``: relative data misfit of a homogeneous medium at
    speed ``c`` [m/s], with per-shot source strengths projected out
    (objective.estimate_source_strengths — the same variable projection the
    CG loop applies, so J(c) is comparable to the inversion's loss scale).

    ``c`` is a traced argument: one compile serves every candidate.
    """
    solver = auto_split(solver)

    @jax.jit
    def J(c):
        vel = jnp.full(grid.shape, jnp.asarray(c, jnp.float32))
        u, _ = solve_helmholtz(vel, data.src, data.f, grid, solver,
                               attenuation=data.attenuation)
        rec = sample_receivers(u, data.rx_y, data.rx_x, data.rx_w)
        s = estimate_source_strengths(rec, data.rec_obs)
        if isinstance(rec, Cpx):
            rec = cpx.mul(rec, s[:, None])
            obs_energy = 0.5 * jnp.sum(cpx.abs2(data.rec_obs))
        else:
            rec = rec * s[:, None]
            obs_energy = 0.5 * jnp.sum(
                jnp.real(jnp.conj(data.rec_obs) * data.rec_obs))
        return misfit(rec, data.rec_obs) / jnp.maximum(obs_energy, 1e-38)

    return J


def _parabolic_min(c3, j3):
    """Vertex of the parabola through three (c, J) points; falls back to the
    middle point when the fit is degenerate or the vertex escapes the
    bracket (the discrete minimum was at an edge)."""
    (c0, c1, c2), (j0, j1, j2) = c3, j3
    denom = (c1 - c0) * (j1 - j2) - (c1 - c2) * (j1 - j0)
    if abs(denom) < 1e-30:
        return float(c1)
    c_star = c1 - 0.5 * ((c1 - c0) ** 2 * (j1 - j2)
                         - (c1 - c2) ** 2 * (j1 - j0)) / denom
    lo, hi = min(c0, c2), max(c0, c2)
    return float(np.clip(c_star, lo, hi))


def calibrate_background_speed(dataset=None, *, grid: Grid2D | None = None,
                               acquisition: AcquisitionConfig = AcquisitionConfig(),
                               solver: SolverConfig = SolverConfig(),
                               c_min: float = 1400.0, c_max: float = 1600.0,
                               num: int = 9, levels: int = 2,
                               data: FWIData | None = None,
                               attenuation=None) -> CalibrationResult:
    """Estimate the background (water) sound speed from recorded ring data.

    Multi-level grid search of the homogeneous-medium projected misfit:
    each level evaluates ``num`` equally spaced candidates over the current
    bracket, then zooms the bracket to one grid step around the discrete
    minimum; the final three points get a parabolic sub-grid fit. Total cost
    ``levels * num`` forward solves, all through one compiled program.

    Args:
        dataset: a :class:`~..data.synthesize.RingDataset` (or anything with
            ``.x_circ/.y_circ/.f/.rec_data``). Alternatively pass a prebuilt
            ``data=`` :class:`FWIData` (then ``grid`` is required and
            ``acquisition`` is ignored). Use
            ``AcquisitionConfig(tx_downsample=...)`` to calibrate on a
            transmitter subset — the misfit minimum is insensitive to it.
        grid: reconstruction grid (defaults to the reference's 301x301).
        c_min / c_max / num / levels: search bracket and resolution. The
            bracket should stay within the medium's plausible range — at
            350 kHz the projected misfit develops cycle-skip side lobes a
            few percent away from the truth, which is exactly why this scan
            exists (a gradient method started in a side lobe stalls there).
        attenuation: optional known alpha map [Np/m] (FD methods only).

    Returns:
        :class:`CalibrationResult`; feed ``result.c0`` to
        ``invert_dataset(c_init=...)`` / ``FWIConfig(c_init=...)`` or as
        ``c_ref`` of a travel-time start.
    """
    if data is None:
        if dataset is None:
            raise ValueError("pass a dataset or a prebuilt data=FWIData")
        from .runner import default_inversion_grid
        grid = grid or default_inversion_grid()
        acq = build_ring_acquisition(grid, acquisition,
                                     x_elem=dataset.x_circ,
                                     y_elem=dataset.y_circ)
        solver = auto_split(solver)
        if attenuation is not None and np.ndim(attenuation) == 0:
            attenuation = np.full(grid.shape, float(attenuation), np.float32)
        data = build_fwi_data(acq, dataset.rec_data, dataset.f,
                              split=solver.split_complex,
                              attenuation=attenuation)
    elif grid is None:
        raise ValueError("data= requires grid=")
    if num < 3:
        raise ValueError("num must be >= 3 for the parabolic refinement")

    return _zoom_search(background_misfit_fn(data, grid, solver),
                        c_min, c_max, num, levels)


def _zoom_search(J, c_min, c_max, num, levels) -> CalibrationResult:
    """Multi-level zoom grid search over a jitted scalar misfit J(c).

    The zoomed bracket is clipped to the user's [c_min, c_max] at every
    level — an argmin on a bracket endpoint must not let later levels
    evaluate speeds outside the stated physical range (that range is the
    guard against cycle-skip side lobes).
    """
    all_c: list[float] = []
    all_j: list[float] = []
    lo, hi = float(c_min), float(c_max)
    cs = js = None
    for _ in range(max(1, int(levels))):
        cs = np.linspace(lo, hi, int(num))
        js = np.array([float(jax.device_get(J(c))) for c in cs])
        all_c.extend(cs.tolist())
        all_j.extend(js.tolist())
        k = int(np.argmin(js))
        step = cs[1] - cs[0]
        lo = max(cs[k] - step, float(c_min))
        hi = min(cs[k] + step, float(c_max))
    k = int(np.argmin(js))
    k = min(max(k, 1), len(cs) - 2)
    c0 = _parabolic_min(cs[k - 1:k + 2], js[k - 1:k + 2])
    all_c_arr = np.asarray(all_c)
    all_j_arr = np.asarray(all_j)
    order = np.argsort(all_c_arr)
    return CalibrationResult(
        c0=float(c0),
        candidates=all_c_arr[order],
        misfits=all_j_arr[order],
        c_grid_best=float(all_c_arr[int(np.argmin(all_j_arr))]),
    )


def estimate_receiver_sensitivities(data: FWIData, acq, vel, grid: Grid2D,
                                    solver: SolverConfig = SolverConfig(),
                                    sweeps: int = 3):
    """Per-element receiver sensitivities from the data and a velocity model.

    Reciprocity QC (data.qc) observes only the transmit/receive RATIOS
    ``q_e/s_e``; the per-shot source estimate inside the inversion
    (objective.estimate_source_strengths) absorbs the per-SHOT factors —
    but a per-RECEIVER sensitivity ``s_r`` scales every column of the data
    in a way no per-shot scalar can explain, so it survives both and biases
    the misfit (high-|s| receivers dominate) AND the physics fit. This
    estimates ``s`` by variable projection against one forward solve:
    alternate the per-shot estimate with the per-element least-squares
    column factor ``s_e = sum_t <sim, obs>_e / sum_t |sim|^2_e`` (summed
    over the shots whose acceptance mask includes element ``e``), a
    coordinate-descent fixed point on the separable calibration.

    Args:
        data: FWIData whose observations may carry receiver sensitivities.
        acq: the :class:`~..models.acquisition.RingAcquisition` that built
            ``data`` (provides the (ntx, n_active) -> element-id map).
        vel: (ny, nx) velocity model to linearize at — the true/current
            model for late-stage calibration, or a calibrated homogeneous
            background early on (residual model error then leaks into
            ``s``; keep ``sweeps`` small and re-estimate as the model
            improves).

    Returns:
        (s, data_compensated): ``s`` (num_elements,) complex128 — unit
        magnitude-median, elements never observed set to 1 — and a new
        FWIData whose ``rec_obs`` entries are divided by their element's
        sensitivity. Identifiable up to ONE global complex scale (absorbed
        by the per-shot estimate downstream).
    """
    solver = auto_split(solver)
    u, _ = solve_helmholtz(jnp.asarray(vel, jnp.float32), data.src, data.f,
                           grid, solver, attenuation=data.attenuation)
    rec = sample_receivers(u, data.rx_y, data.rx_x, data.rx_w)
    if isinstance(rec, Cpx):
        sim = (np.asarray(jax.device_get(rec.re))
               + 1j * np.asarray(jax.device_get(rec.im))).astype(np.complex128)
        obs = (np.asarray(jax.device_get(data.rec_obs.re))
               + 1j * np.asarray(jax.device_get(data.rec_obs.im))
               ).astype(np.complex128)
    else:
        sim = np.asarray(jax.device_get(rec)).astype(np.complex128)
        obs = np.asarray(jax.device_get(data.rec_obs)).astype(np.complex128)

    elem = np.asarray(acq.rx_indices)               # (ntx, n_active) ids
    n_elem = int(acq.num_elements)
    s = np.ones(n_elem, np.complex128)
    for _ in range(max(1, int(sweeps))):
        # (a) per-shot source factors against the s-compensated obs
        obs_c = obs / s[elem]
        q = (np.sum(np.conj(sim) * obs_c, axis=1)
             / np.maximum(np.sum(np.abs(sim) ** 2, axis=1), 1e-300))
        model = q[:, None] * sim                    # q_t * sim, per entry
        # (b) per-element receiver factors: obs ≈ s_e * model
        num = np.zeros(n_elem, np.complex128)
        den = np.zeros(n_elem, np.float64)
        np.add.at(num, elem, np.conj(model) * obs)
        np.add.at(den, elem, np.abs(model) ** 2)
        s = np.where(den > 0, num / np.maximum(den, 1e-300), 1.0)
        nz = np.abs(s[den > 0])
        if nz.size:
            s = np.where(den > 0, s / np.median(nz), s)
    comp = obs / s[elem]
    if isinstance(data.rec_obs, Cpx):
        rec_obs = cpx.of(comp.astype(np.complex64))
    else:
        rec_obs = jnp.asarray(comp, jnp.complex64)
    return s, data._replace(rec_obs=rec_obs)


def background_misfit_fn_3d(data, grid, pml=None, iter_cap: int = 400,
                            solver3d: str = "gmres", gmres_tol: float = 1e-4,
                            spectral: str = "auto"):
    """3D ``J(c)``: relative projected misfit of a homogeneous volume at
    speed ``c`` through the spectral CBS/GMRES solver (fwi3d). One compile
    serves every candidate; the homogeneous-medium scattering potential is
    near zero, so each solve converges in a handful of matvecs.

    ``gmres_tol`` defaults tighter than the FWI loop's 2e-3: the misfit
    DIFFERENCES between nearby candidates must stay above the solver
    noise floor for the parabolic fit to be meaningful.
    """
    from ..config import PMLConfig
    from .fwi3d import (FWIData3D, _make_solve_3d, sample_receivers_3d)

    assert isinstance(data, FWIData3D)
    if data.rec_ref is not None:
        # Scattered-field data has the direct arrival REMOVED — but the
        # direct arrival is exactly the signal that carries the background
        # speed. Calibrate on the raw (total-field) data, then convert with
        # scattered_data_3d(c_ref=result.c0).
        raise ValueError("calibrate on total-field data (before "
                         "scattered_data_3d), not on scattered data")
    pml = pml or PMLConfig()
    solve = _make_solve_3d(grid, pml, iter_cap, solver3d=solver3d,
                           gmres_tol=gmres_tol, spectral=spectral)

    @jax.jit
    def J(c):
        vel = jnp.full(grid.shape, jnp.asarray(c, jnp.float32))
        u, _ = solve(vel, data.src, data.f, attenuation=data.attenuation)
        rec = sample_receivers_3d(u, data.rx_idx)
        s = estimate_source_strengths(rec, data.rec_obs)
        rec = cpx.mul(rec, Cpx(s.re[:, None], s.im[:, None]))
        obs_energy = 0.5 * jnp.sum(cpx.abs2(data.rec_obs))
        return misfit(rec, data.rec_obs) / jnp.maximum(obs_energy, 1e-38)

    return J


def calibrate_background_speed_3d(data, grid, *, pml=None,
                                  iter_cap: int = 400,
                                  solver3d: str = "gmres",
                                  gmres_tol: float = 1e-4,
                                  spectral: str = "auto",
                                  c_min: float = 1400.0,
                                  c_max: float = 1600.0,
                                  num: int = 9,
                                  levels: int = 2) -> CalibrationResult:
    """3D background-speed calibration over an :class:`~.fwi3d.FWIData3D`
    (same search as :func:`calibrate_background_speed`; feed ``result.c0``
    to ``invert_dataset_3d(c_init=...)`` / as the scattered-field
    ``c_ref``). Scale one-hot sources to O(1e6) first on weak-contrast
    volumes — the f32 denormal pitfall (PERF_NOTES) applies here too."""
    if num < 3:
        raise ValueError("num must be >= 3 for the parabolic refinement")
    J = background_misfit_fn_3d(data, grid, pml=pml, iter_cap=iter_cap,
                                solver3d=solver3d, gmres_tol=gmres_tol,
                                spectral=spectral)
    return _zoom_search(J, c_min, c_max, num, levels)
