"""3D frequency-domain FWI: adjoint-state gradient and nonlinear CG over a
volumetric grid.

The reference is strictly 2D (SURVEY.md preamble); this is the volumetric
extension built on the 3D convergent-Born solver (:mod:`..ops.born3d`) and
3D acquisition models (:mod:`..models.acquisition3d`). The inversion math
is the exact 3D analog of the 2D loop (reference: nonlinearcg.py:41-180):

    forward:   H(c) u_t = s_t          (CBS, all transmitters batched)
    adjoint:   H(c)^H lam_t = P^T r_t  (residual scattered to voxels)
    gradient:  g = -sum_t Re(conj(2 w^2 slow u_t) * lam_t)
    update:    slowness += step * search_dir   (HS momentum, linearized step)

Validated in tests/test_fwi3d.py: the adjoint-state gradient agrees with
central finite differences of the misfit, and a tiny 3D inversion reduces
the misfit monotonically.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FWIConfig, PMLConfig, StepSizeFormula
from ..models.acquisition3d import Acquisition3D, source_fields_3d
from ..models.grid3d import Grid3D
from ..ops import cpx
from ..ops.born3d import born_series_solve_3d
from ..ops.cpx import Cpx
from .objective import (estimate_source_strengths, illumination_map, misfit,
                        precondition_gradient)
from .optimizers import (CGMetrics, _bb_step_size, _momentum,
                         _step_size, _validate_watchdog,
                         _watchdog_apply)


class FWIData3D(NamedTuple):
    src: Cpx           # (ntx, nz, ny, nx) one-hot transmit sources
    rec_obs: Cpx       # (ntx, n_active) observed receiver pressures
    rx_idx: jnp.ndarray  # (ntx, n_active, 3) int32 receiver voxels
    f: jnp.ndarray     # scalar frequency [Hz]
    # Known attenuation map alpha [Np/m] of the medium, or None (lossless)
    # — velocity is inverted IN this fixed lossy medium, mirroring the 2D
    # engine (objective.FWIData.attenuation / ops.born3d).
    attenuation: jnp.ndarray | None = None
    # Scattered-field mode (build with :func:`scattered_data_3d`): the
    # background (reference-medium) receiver field, subtracted from every
    # simulated gather before the misfit; ``rec_obs`` then holds the
    # SCATTERED observations in simulation units. This is the standard
    # defense when the misfit is direct-arrival-dominated — in particular
    # under random source encoding, whose crosstalk noise scales with the
    # DIRECT amplitude while the signal scales with the (weak) scattering
    # (measured: the 128^3 full-aperture encoded stall, PERF_NOTES).
    rec_ref: Cpx | None = None


def build_fwi_data_3d(acq: Acquisition3D, rec_obs, f,
                      grid: Grid3D, attenuation=None) -> FWIData3D:
    src = source_fields_3d(acq, grid)
    rec = rec_obs if isinstance(rec_obs, Cpx) else cpx.of(jnp.asarray(rec_obs))
    return FWIData3D(src=src, rec_obs=rec,
                     rx_idx=jnp.asarray(acq.rx_idx, jnp.int32),
                     f=jnp.asarray(f, jnp.float32),
                     attenuation=(None if attenuation is None else
                                  jnp.asarray(attenuation, jnp.float32)))


def sample_receivers_3d(fields: Cpx, rx_idx) -> Cpx:
    """Gather (ntx, n_active) receiver samples from (ntx, nz, ny, nx)."""
    tx = jnp.arange(fields.re.shape[0])[:, None]
    iz, iy, ix = rx_idx[..., 0], rx_idx[..., 1], rx_idx[..., 2]
    return Cpx(fields.re[tx, iz, iy, ix], fields.im[tx, iz, iy, ix])


def scatter_to_volumes_3d(values: Cpx, rx_idx, shape) -> Cpx:
    """Scatter (ntx, n_active) values onto (ntx,) + shape volumes (the
    adjoint of :func:`sample_receivers_3d`)."""
    ntx = values.re.shape[0]
    tx = jnp.arange(ntx)[:, None]
    iz, iy, ix = rx_idx[..., 0], rx_idx[..., 1], rx_idx[..., 2]
    z = jnp.zeros((ntx,) + shape, jnp.float32)
    return Cpx(z.at[tx, iz, iy, ix].add(values.re),
               z.at[tx, iz, iy, ix].add(values.im))


def encode_supershots(data: FWIData3D, code) -> FWIData3D:
    """Combine the transmit batch into encoded supershots.

    Random source encoding (Krebs et al. 2009; Moghaddam & Herrmann 2010):
    with a code matrix ``code`` (ntx, m) the linearity of the Helmholtz
    equation gives u(S @ code) = U @ code, so the misfit of the m encoded
    gathers against ``code``-combined observations is, in expectation over
    Rademacher codes, the full ntx-shot misfit — at m solves instead of
    ntx. The crosstalk terms are zero-mean; redrawing the code every
    iteration (``nonlinear_cg_3d(encode=m)``) turns them into noise the
    outer iteration averages out.

    Exactness of the expectation REQUIRES every transmitter to share one
    receiver set in one ordering (full-aperture acquisition:
    ``build_acquisition3d(..., min_angle=0.0)``): with per-tx acceptance
    masks the encoded field still contains every transmitter's energy at a
    receiver, but the encoded observation omits the masked-out entries, so
    the masked crosstalk no longer cancels in expectation. Enforced by
    ``nonlinear_cg_3d``; this helper itself just combines.

    This is productized for 3D only by measurement: the 2D direct-factor
    loop's per-shot cost is ~15 ms of sweep work per iteration (mini-batch
    ledger, PERF_NOTES round 3) — no lever arm. The 3D CBS/GMRES solve
    costs are linear in the RHS count, so m supershots cut the dominant
    term by ntx/m.
    """
    m = code.shape[1]
    src = Cpx(jnp.einsum("t...,tm->m...", data.src.re, code),
              jnp.einsum("t...,tm->m...", data.src.im, code))
    rec = Cpx(code.T @ data.rec_obs.re, code.T @ data.rec_obs.im)
    rx = jnp.broadcast_to(data.rx_idx[:1], (m,) + data.rx_idx.shape[1:])
    ref = (None if data.rec_ref is None else
           Cpx(code.T @ data.rec_ref.re, code.T @ data.rec_ref.im))
    return data._replace(src=src, rec_obs=rec, rx_idx=rx, rec_ref=ref)


@partial(jax.jit, static_argnames=("grid", "pml", "iter_cap", "solver3d",
                                   "gmres_tol", "gmres_restart", "spectral"))
def _scattered_data_3d_jit(data: FWIData3D, c_ref, grid: Grid3D,
                           pml: PMLConfig, iter_cap: int, solver3d: str,
                           gmres_tol: float, gmres_restart: int,
                           spectral: str):
    solve = _make_solve_3d(grid, pml, iter_cap, solver3d=solver3d,
                           gmres_tol=gmres_tol, gmres_restart=gmres_restart,
                           spectral=spectral)
    vel0 = jnp.full(grid.shape, jnp.float32(c_ref))
    wv0, _ = solve(vel0, data.src, data.f, attenuation=data.attenuation)
    rec0 = sample_receivers_3d(wv0, data.rx_idx)
    # Per-shot source scale fitted against the BACKGROUND simulation —
    # accurate because the direct arrival dominates the gather — then
    # the observations are brought into simulation units and the
    # background is subtracted (variable projection done once, here).
    s = estimate_source_strengths(rec0, data.rec_obs)
    sb = Cpx(s.re[:, None], s.im[:, None])
    rec_scat = cpx.div(data.rec_obs, sb) - rec0
    return rec_scat, rec0


def scattered_data_3d(data: FWIData3D, grid: Grid3D, c_ref: float = 1500.0,
                      pml: PMLConfig = PMLConfig(a0=20.0, l_pml=12e-3),
                      iter_cap: int = 600, solver3d: str = "gmres",
                      gmres_tol: float = 1e-5, gmres_restart: int = 16,
                      spectral: str = "auto") -> FWIData3D:
    """Background-subtracted (scattered-field) dataset.

    One reference solve in the homogeneous ``c_ref`` medium calibrates the
    per-shot source scales and yields the background receiver field; the
    returned dataset holds the SCATTERED observations in simulation units
    (``rec_obs``) plus the background gather (``rec_ref``) that
    :func:`objective_pieces_3d` subtracts from every simulation. Use when
    the misfit is direct-arrival-dominated — above all with ``encode=``,
    whose crosstalk noise rides the direct amplitude while the gradient
    signal rides the scattering (the measured 128^3 stall, PERF_NOTES;
    cf. scattered-field source encoding in the encoding literature).

    The approximation: the background inside the loop stays the ``c_ref``
    field while the evolving model's own direct wave shifts — valid at
    soft-tissue contrasts where the direct arrival's change is itself
    scattering-sized. Uses a tight default GMRES tolerance (1e-5): a
    sloppy background leaks direct-wave residue into every gather.
    """
    rec_scat, rec0 = _scattered_data_3d_jit(
        data, jnp.float32(c_ref), grid, pml, int(iter_cap), str(solver3d),
        float(gmres_tol), int(gmres_restart), str(spectral))
    return data._replace(rec_obs=rec_scat, rec_ref=rec0)


def _make_solve_3d(grid: Grid3D, pml: PMLConfig, iter_cap: int,
                   mesh=None, grid_axis: str = "grid",
                   solver3d: str = "cbs", gmres_tol: float = 2e-3,
                   gmres_restart: int = 8, spectral: str = "auto",
                   spectral_precision: str = "highest"):
    """Solver closure: the plain CBS solve, the Krylov-accelerated CBS
    (``solver3d="gmres"``: same FFT-pair cost per matvec, typically 2-5x
    fewer of them — ops.born3d.born_gmres_solve_3d), or — with a mesh —
    the grid-sharded pencil-FFT solve (parallel.fft3d), one z-slab per
    device; mesh + gmres combine (psum-reduced Arnoldi dots).

    ``spectral_precision``: MXU precision of the DFT-as-matmul transforms
    inside the matvec (single-device paths; see ops.born3d
    ._transform_precision) — the 3D analog of the 2D fast_* sweep flags."""
    if mesh is None:
        if solver3d == "gmres":
            from ..ops.born3d import born_gmres_solve_3d
            return partial(born_gmres_solve_3d, grid=grid, pml=pml,
                           maxiter=iter_cap, tol=gmres_tol,
                           restart=gmres_restart, spectral=spectral,
                           spectral_precision=spectral_precision)
        return partial(born_series_solve_3d, grid=grid, pml=pml,
                       iter_cap=iter_cap, spectral=spectral)
    # A mesh axis named "shot" additionally shards the transmit batch
    # (shot DP composed over the pencil grid decomposition; see
    # parallel.sharding.shot_grid_mesh / shard_fwi_data_3d_shot_grid).
    batch_axis = "shot" if "shot" in mesh.axis_names else None
    if solver3d == "gmres":
        from ..parallel.fft3d import born_gmres_solve_3d_sharded
        return partial(born_gmres_solve_3d_sharded, grid=grid, mesh=mesh,
                       pml=pml, maxiter=iter_cap, tol=gmres_tol,
                       restart=gmres_restart, grid_axis=grid_axis,
                       spectral=spectral, batch_axis=batch_axis)
    from ..parallel.fft3d import born_series_solve_3d_sharded
    return partial(born_series_solve_3d_sharded, grid=grid, mesh=mesh,
                   pml=pml, iter_cap=iter_cap, grid_axis=grid_axis,
                   spectral=spectral, batch_axis=batch_axis)


def _rhs_norm(rhs: Cpx):
    """Per-shot RHS norms, shape (batch, 1, 1, 1). Normalizing each batch
    element independently keeps every shot's initial guess tight even when
    per-shot RHS magnitudes drift unevenly between outer iterations (e.g.
    adjoint sources shrinking at different rates as some shots converge
    faster) — a global norm would mis-scale individual shots' guesses
    (round-4 advisor note; efficiency, never correctness: GMRES still
    converges to gmres_tol either way)."""
    axes = tuple(range(1, rhs.re.ndim))
    return jnp.sqrt(jnp.sum(rhs.re ** 2, axis=axes, keepdims=True)
                    + jnp.sum(rhs.im ** 2, axis=axes, keepdims=True))


def _warm_x0(carry: Cpx | None, rhs: Cpx) -> Cpx | None:
    """GMRES initial guess from an RHS-normalized warm carry.

    The carry stores the previous solution per unit (per-shot) RHS norm
    (:func:`_warm_carry`), so rescaling by the CURRENT RHS norms keeps the
    guess well-scaled even when the right-hand side's magnitude drifts
    between outer iterations (the adjoint source shrinks with the
    residual; the line-search source scales with the gradient). The very
    first iteration carries zeros — identical to a cold start up to one
    extra residual matvec.
    """
    if carry is None:
        return None
    return cpx.scale(carry, _rhs_norm(rhs))


def _warm_carry(sol: Cpx, rhs: Cpx) -> Cpx:
    """Store ``sol`` normalized per unit per-shot RHS norm; zeros any
    non-finite shot.

    The non-finite guard matters: a NaN carry would otherwise poison the
    next iteration's GMRES (its per-lane NaN-freeze keeps the ITERATE
    safe but would return the NaN x0 unchanged), turning one bad solve
    into a permanently cold — or dead — warm-start chain. The guard is
    per shot, so one bad solve costs only that shot's warmth.
    """
    n = _rhs_norm(rhs)
    out = cpx.scale(sol, jnp.where(n > 0, 1.0 / n, 0.0))
    axes = tuple(range(1, out.re.ndim))
    tot = (jnp.sum(out.re ** 2, axis=axes, keepdims=True)
           + jnp.sum(out.im ** 2, axis=axes, keepdims=True))
    ok = jnp.isfinite(tot)
    return Cpx(jnp.where(ok, out.re, 0.0), jnp.where(ok, out.im, 0.0))


def objective_pieces_3d(vel, slow, data: FWIData3D, grid: Grid3D,
                        pml: PMLConfig, iter_cap: int,
                        estimate_source: bool = True,
                        fwi_precondition=None,
                        fwi_precondition_eps: float = 1e-2,
                        solve=None, warm=None):
    """One forward + one adjoint solve -> (loss, gradient, virt, rec_sim).

    The same adjoint-state identity as 2D (reference: nonlinearcg.py:118-127)
    with the lossless 3D Frechet factor 2 omega^2 slow.
    ``fwi_precondition="illumination"`` applies the same diagonal
    pseudo-Hessian scaling as the 2D loop (illumination summed over the
    transmit batch; see objective.illumination_map). ``solve`` overrides
    the Helmholtz solver (see :func:`_make_solve_3d`).

    ``warm``: optional pair of RHS-normalized warm carries (forward,
    adjoint) from the previous outer iteration (see :func:`_warm_carry`).
    Requires a solver that accepts ``x0`` (``solver3d="gmres"``). When
    set, the return gains a fifth element — the updated carries
    ``(fwd, adj)`` — and the solves start from the previous iteration's
    fields instead of zero, which cuts the dependent-matvec chain that
    dominates 3D wall-clock (PERF_NOTES round 4).
    """
    if solve is None:
        solve = _make_solve_3d(grid, pml, iter_cap)
    if warm is not None:
        wv, _ = solve(vel, data.src, data.f, attenuation=data.attenuation,
                      x0=_warm_x0(warm[0], data.src))
    else:
        wv, _ = solve(vel, data.src, data.f,
                      attenuation=data.attenuation)
    wv_raw = wv
    rec_sim = sample_receivers_3d(wv, data.rx_idx)
    if data.rec_ref is not None:
        # Scattered-field mode: subtract the background receiver field
        # from the TOTAL simulation (the wavefield itself stays total —
        # the Frechet derivative is of the total field). Source scales
        # were baked in by scattered_data_3d; re-estimating against the
        # near-zero scattered sim would be unstable, so it is forced off.
        rec_sim = rec_sim - data.rec_ref
        estimate_source = False
    if estimate_source:
        s_est = estimate_source_strengths(rec_sim, data.rec_obs)
        wv = cpx.mul(wv, Cpx(s_est.re[:, None, None, None],
                             s_est.im[:, None, None, None]))
        rec_sim = cpx.mul(rec_sim, Cpx(s_est.re[:, None], s_est.im[:, None]))
    residual = rec_sim - data.rec_obs
    loss = misfit(rec_sim, data.rec_obs)

    adj_src = scatter_to_volumes_3d(residual, data.rx_idx, grid.shape)
    if warm is not None:
        adj_wv, _ = solve(vel, adj_src, data.f, adjoint=True,
                          attenuation=data.attenuation,
                          x0=_warm_x0(warm[1], adj_src))
    else:
        adj_wv, _ = solve(vel, adj_src, data.f, adjoint=True,
                          attenuation=data.attenuation)
    omega = 2 * jnp.pi * data.f
    # Lossy Frechet factor dk^2/dslow = 2 omega (omega slow + i sgn alpha)
    # — identical to the 2D objective.virtual_source.
    fr = (2 * omega ** 2 * slow)[None]
    if data.attenuation is None:
        virt = cpx.scale(wv, fr)
    else:
        fi = (2 * omega * jnp.sign(jnp.float32(pml.sign_convention))
              * data.attenuation)[None]
        virt = cpx.mul(wv, Cpx(jnp.broadcast_to(fr, wv.re.shape),
                               jnp.broadcast_to(fi, wv.im.shape)))
    grad = -jnp.sum(virt.re * adj_wv.re + virt.im * adj_wv.im, axis=0)
    if fwi_precondition == "illumination":
        grad = precondition_gradient(grad, illumination_map(wv),
                                     fwi_precondition_eps)
    if warm is not None:
        warm_new = (_warm_carry(wv_raw, data.src),
                    _warm_carry(adj_wv, adj_src))
        return loss, grad, virt, rec_sim, warm_new
    return loss, grad, virt, rec_sim


def nonlinear_cg_3d(vel_init, data: FWIData3D, grid: Grid3D,
                    fwi: FWIConfig = FWIConfig(),
                    num_iterations: int | None = None,
                    pml: PMLConfig = PMLConfig(a0=20.0, l_pml=12e-3),
                    iter_cap: int = 600, mesh=None,
                    grid_axis: str = "grid", solver3d: str = "cbs",
                    gmres_tol: float = 2e-3, gmres_restart: int = 8,
                    spectral: str = "auto", encode: int | None = None,
                    encode_seed: int = 0,
                    chunk_iterations: int | None = None,
                    warm_start: bool | str = "auto",
                    spectral_precision: str = "auto"):
    """3D nonlinear-CG inversion (one jitted scan; CBS solver).

    ``solver3d="gmres"`` swaps every solve for the Krylov-accelerated CBS
    (ops.born3d.born_gmres_solve_3d; ``iter_cap`` becomes the matvec cap)
    — same cost per matvec, typically several-fold fewer matvecs than the
    physics-derived fixed-point count. Single-device only.

    ``mesh``/``grid_axis``: run every Helmholtz solve grid-sharded — the
    distributed pencil-FFT CBS over z-slabs (parallel.fft3d), one nz/P
    slab per device, so volumes beyond one chip's HBM invert end to end
    (the 3D counterpart of the 2D SPIKE wiring in optimizers.nonlinear_cg;
    requires nz % P == 0 and ny % P == 0). The rest of the step (gathers,
    reductions, model update) stays global-view and GSPMD inserts the
    collectives. Verified sharded == unsharded in tests/test_fft3d.py.

    ``encode=m``: random source encoding — every iteration redraws a
    Rademacher code (ntx, m) from ``encode_seed`` and runs the whole step
    (forward, adjoint, line-search solve) on m encoded supershots instead
    of ntx transmitters, cutting the per-iteration solve cost by ntx/m
    (the 3D solvers are linear in the RHS count). Requires a shared
    receiver set in one ordering across transmitters
    (``build_acquisition3d(..., min_angle=0.0)``) — see
    :func:`encode_supershots` for why. The reported per-iteration loss is
    the stochastic ENCODED misfit (different code each iteration); use
    :func:`objective_pieces_3d` on the raw data for the true misfit.
    With ``fwi.estimate_source_strength`` the fitted scale is per
    SUPERSHOT — calibrate unknown per-element amplitudes beforehand.

    ``warm_start``: carry each of the three per-iteration solves' fields
    (forward / adjoint / line-search) through the scan as the NEXT
    iteration's GMRES initial guess — the model moves a few percent per
    CG step, so consecutive solves share most of their solution and the
    Krylov iteration only has to close the gap. Carries are stored
    RHS-normalized with a non-finite guard (:func:`_warm_carry`), so
    shrinking residuals and a rejected step cannot de-scale or poison
    the chain. ``"auto"`` (default) enables it exactly where it is
    valid: ``solver3d="gmres"``, single-device, no source encoding
    (encoding redraws the sources every iteration, so the previous
    field is not a guess for anything). Solves stay within ``gmres_tol``
    of the cold-start solves, so the trajectory is tolerance-equivalent,
    not bit-identical. Measured effect: PERF_NOTES round 4.

    ``chunk_iterations=k``: run the scan as ceil(n/k) separate jitted
    programs with exact carry passthrough (identical trajectory — the
    carry is (vel, slow, sd, grad_prev) and the global iteration index
    threads through, so momentum's it=0 branch and the per-iteration
    encode redraw are unchanged). Use where a runtime bounds continuous
    per-program device time — the targeted relay kills multi-minute scan
    programs at 128^3-class volumes (PERF_NOTES round 3) — or to insert
    host-side checkpoints between chunks.

    Returns (velocity (nz, ny, nx), CGMetrics history).
    """
    if spectral_precision == "auto":
        # Measured 3D precision ladder (PERF_NOTES round 5, 64^3 bench
        # workload): "high" (bf16x3 DFT transforms) is quality-neutral
        # (RMSE 3.405 vs 3.406, loss trajectory equal) at 1.03x; "default"
        # (single-pass bf16) is REJECTED — its transform error inflates
        # the GMRES matvec count so the loop runs 2x SLOWER and degrades
        # the model (RMSE 5.51). Synthesis/standalone solver APIs
        # (ops.born3d) keep their own "highest" default — data synthesis
        # must not share the inversion's precision shortcut.
        spectral_precision = "high"
    if fwi.step_size == StepSizeFormula.BB and encode:
        raise ValueError(
            "step_size=BB is incompatible with encode=: the encoded "
            "gradient is stochastic (fresh code each iteration), so the "
            "previous-iteration curvature estimate is noise")
    _validate_watchdog(fwi)
    if fwi.reject_increase is not None:
        if encode:
            raise ValueError(
                "reject_increase (the nonmonotone watchdog) is "
                "incompatible with encode=: the encoded misfit is a fresh "
                "random projection each iteration, so consecutive-loss "
                "ratios fluctuate without any misstep and the watchdog "
                "would revert good updates")
    if warm_start == "auto":
        warm_start = (solver3d == "gmres" and mesh is None and not encode)
    elif warm_start:
        if solver3d != "gmres":
            raise ValueError("warm_start needs solver3d='gmres' (the CBS "
                             "fixed-point solver takes no initial guess)")
        if mesh is not None:
            raise ValueError("warm_start is single-device only (the "
                             "sharded GMRES takes no x0)")
        if encode:
            raise ValueError("warm_start is incompatible with encode=: "
                             "the sources are redrawn every iteration")
    warm_start = bool(warm_start)
    if encode:
        # Encoding is only exact-in-expectation over a shared receiver
        # set (see encode_supershots). Validate here, OUTSIDE the jitted
        # body, where rx_idx is still a concrete array.
        rx = np.asarray(data.rx_idx)
        if not (rx == rx[:1]).all():
            raise ValueError(
                "encode= needs one shared receiver ordering across "
                "transmitters (full aperture, build_acquisition3d with "
                "min_angle=0.0); this acquisition has per-tx masks")
    n_iter = int(fwi.num_iterations if num_iterations is None
                 else num_iterations)
    kw = dict(grid=grid, fwi=fwi, pml=pml, iter_cap=iter_cap, mesh=mesh,
              grid_axis=grid_axis, solver3d=solver3d, gmres_tol=gmres_tol,
              gmres_restart=gmres_restart, spectral=spectral, encode=encode,
              encode_seed=encode_seed, warm_start=warm_start,
              spectral_precision=spectral_precision)
    vel0 = jnp.asarray(vel_init, jnp.float32)
    zeros = jnp.zeros(grid.shape, jnp.float32)
    state = (vel0, 1.0 / vel0, zeros, zeros)
    if warm_start:
        zf = Cpx(jnp.zeros_like(data.src.re), jnp.zeros_like(data.src.im))
        state = state + ((zf, zf, zf),)
    if fwi.step_size == StepSizeFormula.BB or fwi.reject_increase is not None:
        # BB and the watchdog carry the previous slowness (see the step
        # body); the zero-history first local iteration runs the
        # linearized fallback / cannot trigger the watchdog.
        state = state + (1.0 / vel0,)
    if fwi.reject_increase is not None:
        # (loss baseline, restart flag): +inf baseline means the first
        # iteration can never read as a spike.
        state = state + ((jnp.float32(jnp.inf), jnp.asarray(False)),)
    if chunk_iterations is None or chunk_iterations >= n_iter:
        state, metrics = _nonlinear_cg_3d_jit(
            state, data, num_iterations=n_iter, it0=jnp.int32(0), **kw)
        return state[0], metrics
    parts, it = [], 0
    while it < n_iter:
        k = min(int(chunk_iterations), n_iter - it)
        state, m = _nonlinear_cg_3d_jit(state, data, num_iterations=k,
                                        it0=jnp.int32(it), **kw)
        parts.append(m)
        it += k
    metrics = CGMetrics(*(jnp.concatenate([getattr(p, f) for p in parts])
                          for f in CGMetrics._fields))
    return state[0], metrics


@partial(jax.jit, static_argnames=("grid", "fwi", "num_iterations",
                                   "pml", "iter_cap", "mesh", "grid_axis",
                                   "solver3d", "gmres_tol", "gmres_restart",
                                   "spectral", "encode", "encode_seed",
                                   "warm_start", "spectral_precision"))
def _nonlinear_cg_3d_jit(state, data, grid, fwi, num_iterations,
                         pml, iter_cap, mesh, grid_axis, solver3d,
                         gmres_tol, gmres_restart, spectral, encode,
                         encode_seed, it0, warm_start=False,
                         spectral_precision="highest"):
    """One scan of ``num_iterations`` CG steps from ``state`` = (vel,
    slow, search_dir, grad_prev[, warm-carry Cpx triple]), global
    iteration indices starting at the TRACED ``it0`` (so every chunk of a
    chunked run reuses one program)."""
    n_iter = num_iterations
    solve = _make_solve_3d(grid, pml, iter_cap, mesh=mesh,
                           grid_axis=grid_axis, solver3d=solver3d,
                           gmres_tol=gmres_tol, gmres_restart=gmres_restart,
                           spectral=spectral,
                           spectral_precision=spectral_precision)
    ntx = data.src.re.shape[0]
    # BB curvature-scalar step: same contract as the 2D loop (see
    # config.StepSizeFormula.BB and optimizers.make_cg_step) — skips the
    # line-search solve on iterations where the BB2 estimate is valid.
    bb = fwi.step_size == StepSizeFormula.BB
    # Nonmonotone watchdog (FWIConfig.reject_increase): carries the
    # previous slowness (shared with BB), the loss baseline and a restart
    # flag; a loss spike reverts the model and restarts the recurrence.
    guard = fwi.reject_increase is not None

    def step(state, it):
        rest = list(state)
        vel, slow, sd, gprev = rest[:4]
        rest = rest[4:]
        warm = rest.pop(0) if warm_start else None
        slow_prev = rest.pop(0) if (bb or guard) else None
        prev_loss, restart_prev = rest.pop(0) if guard else (None, None)
        if encode:
            code = jax.random.rademacher(
                jax.random.fold_in(jax.random.PRNGKey(encode_seed), it),
                (ntx, encode), jnp.float32)
            data_it = encode_supershots(data, code)
        else:
            data_it = data
        pieces = objective_pieces_3d(
            vel, slow, data_it, grid, pml, iter_cap,
            estimate_source=fwi.estimate_source_strength,
            fwi_precondition=fwi.precondition,
            fwi_precondition_eps=fwi.precondition_eps,
            solve=solve, warm=None if warm is None else warm[:2])
        if warm is None:
            loss, grad, virt, rec_sim = pieces
        else:
            loss, grad, virt, rec_sim, warm_fa = pieces

        beta = _momentum(fwi.momentum, it, grad, gprev, sd,
                         fwi.eps_stabilizer)
        if guard:
            # A watchdog restart on the previous iteration invalidates the
            # carried recurrence: force a steepest-descent restart.
            beta = jnp.where(restart_prev, 0.0, beta)
        sd_new = beta * sd - grad

        # Linearized line search: third solve with the perturbation source
        # -virt * sd (reference: nonlinearcg.py:140-159).
        pert_src = cpx.mul(virt, Cpx(-sd_new[None], jnp.zeros_like(sd_new)[None]))

        def _lin_step():
            if warm is None:
                pert, _ = solve(vel, pert_src, data_it.f,
                                attenuation=data_it.attenuation)
            else:
                pert, _ = solve(vel, pert_src, data_it.f,
                                attenuation=data_it.attenuation,
                                x0=_warm_x0(warm[2], pert_src))
            drec = sample_receivers_3d(pert, data_it.rx_idx)
            # Full 3-formula step matrix, shared with the 2D loop
            # (reference: FrequencyDomainFWI.m:42-45, 149-172).
            formula = (StepSizeFormula.RESIDUAL if bb else fwi.step_size)
            sz = _step_size(formula, drec, data_it.rec_obs, rec_sim,
                            grad, sd_new, fwi.eps_stabilizer)
            if warm is None:
                return sz
            return sz, _warm_carry(pert, pert_src)

        if bb:
            # BB2 quadratic-model step (shared helper _bb_step_size); the
            # line-search GMRES solve runs only inside the fallback cond
            # branch (zero/invalid curvature history — incl. the cold
            # start and post-watchdog reverts). The warm line-search
            # carry is left unchanged on BB iterations (still a valid
            # RHS-normalized previous solution).
            bb_sz, valid = _bb_step_size(slow, slow_prev, grad, gprev,
                                         sd_new, fwi.eps_stabilizer)
            if warm is None:
                step_sz = jax.lax.cond(valid, lambda: bb_sz, _lin_step)
                pert_carry = None
            else:
                step_sz, pert_carry = jax.lax.cond(
                    valid, lambda: (bb_sz, warm[2]), _lin_step)
        else:
            if warm is None:
                step_sz = _lin_step()
                pert_carry = None
            else:
                step_sz, pert_carry = _lin_step()

        slow_new = slow + step_sz * sd_new
        vel_new = 1.0 / slow_new
        if fwi.clip_velocity is not None:
            lo, hi = fwi.clip_velocity
            vel_new = jnp.clip(vel_new, lo, hi)
            slow_new = 1.0 / vel_new
        if fwi.reject_nonfinite:
            ok = (jnp.isfinite(step_sz) & jnp.isfinite(beta)
                  & jnp.all(jnp.isfinite(slow_new)))
            vel_new = jnp.where(ok, vel_new, vel)
            slow_new = jnp.where(ok, slow_new, slow)
            sd_new = jnp.where(ok, sd_new, sd)
            step_sz = jnp.where(ok, step_sz, 0.0)

        slow_next_prev = slow
        if guard:
            (bad, slow_new, vel_new, slow_next_prev,
             prev_loss_new) = _watchdog_apply(
                fwi.reject_increase, loss, prev_loss, slow, slow_prev,
                slow_new, vel_new)

        metrics = CGMetrics(loss=loss, grad_norm=jnp.linalg.norm(grad),
                            beta=beta, step_size=step_sz)
        new_state = (vel_new, slow_new, sd_new, grad)
        if warm is not None:
            new_state = new_state + ((warm_fa[0], warm_fa[1], pert_carry),)
        if bb or guard:
            new_state = new_state + (slow_next_prev,)
        if guard:
            new_state = new_state + ((prev_loss_new, bad),)
        return new_state, metrics

    state, metrics = jax.lax.scan(step, state, it0 + jnp.arange(n_iter))
    return state, metrics
