"""Configuration objects for the TPU-native UST full-waveform-inversion framework.

The reference codebase scatters its configuration as hardcoded constants at the
top of each script (reference: fwi_script.py:31-91, FrequencyDomainFWI.m:14-59).
Here the entire configuration surface is collected into small frozen dataclasses
that are hashable, so they can be passed through ``jax.jit`` as static arguments.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple


class MomentumFormula(enum.IntEnum):
    """Conjugate-gradient momentum formulas.

    Mirrors the 5-way ``momentumFormula`` switch of the reference MATLAB driver
    (reference: FrequencyDomainFWI.m:36-41,119-146). The JAX port of the
    reference hardcodes Hestenes-Stiefel; we expose all five.
    """

    GRADIENT_DESCENT = 0
    FLETCHER_REEVES = 1
    POLAK_RIBIERE = 2
    PR_FR_CLAMPED = 3
    HESTENES_STIEFEL = 4


class StepSizeFormula(enum.IntEnum):
    """Linearized line-search step-size formulas.

    Mirrors ``stepSizeCalculation`` (reference: FrequencyDomainFWI.m:42-45,
    149-172).
    """

    RESIDUAL = 1  # Re<dREC, d - u>/<dREC, dREC>  (not involving gradient)
    GRADIENT = 2  # <g, g>/<dREC, dREC>
    GRADIENT_SD = 3  # -<g, sd>/<dREC, dREC>
    # Beyond-reference extension: Barzilai-Borwein curvature-scalar step.
    # Formulas 1-3 all need dREC — the receiver projection of a THIRD
    # Helmholtz solve per iteration (the linearized forward on the search
    # direction; reference: FrequencyDomainFWI.m:149-172). BB replaces it
    # with the quadratic-model step alpha = -sigma <g, p>/<p, p>, where
    # sigma = <dm, dg>/<dg, dg> is the BB2 inverse-curvature estimate from
    # the PREVIOUS iteration's (model, gradient) increments — no extra
    # solve, cutting the iteration from 3 solves to 2. The first iteration
    # (and any non-descent/negative-curvature fallback) runs the RESIDUAL
    # line search under lax.cond, so only the iterations where BB is valid
    # skip the solve. Measured (PERF_NOTES round 5): 1.11x at equal RMSE
    # from a CALIBRATED background (the intake chain's c0), but WORSE
    # model + non-monotone loss from a badly-wrong background (the
    # reference's c_init=1480) where the misfit is non-quadratic and the
    # previous-step curvature mispredicts; ALSO degrades the illumination-
    # preconditioned intake chain (4.18 -> 6.82 m/s — the preconditioner
    # rescales the geometry the curvature scalar lives in). Use on plain
    # CG after calibrate_background_speed (or any good c0); the parity
    # default stays RESIDUAL everywhere.
    BB = 4


class SolverMethod(enum.Enum):
    """Which on-device Helmholtz solver to use.

    The reference escapes to host SuperLU via ``jax.pure_callback``
    (reference: solve_helmholtz.py:85-93); all methods here run entirely on
    the TPU.
    """

    BANDED = "banded"  # block-Thomas direct solve of the exact 9-pt FD system
    GMRES = "gmres"  # preconditioned restarted GMRES on the exact 9-pt FD system
    BORN = "born"  # convergent Born series (spectral, FFT-based)


@dataclasses.dataclass(frozen=True)
class PMLConfig:
    """Perfectly-matched-layer parameters.

    Defaults match the reference (a0=10, L_PML=9 mm, sign convention -1 for
    exp(-ikr) fields; reference: fwi_script.py:33-34, solve_helmholtz.py:23).
    """

    a0: float = 10.0
    l_pml: float = 9.0e-3
    sign_convention: int = -1


@dataclasses.dataclass(frozen=True)
class StencilConfig:
    """Dispersion-minimizing 9-point stencil fit parameters.

    Chen/Cheng/Feng/Wu 2013 optimal parameters; the least-squares fit
    resolutions and the fixed b=5/6 choice match the reference
    (reference: solve_helmholtz.py:122-141, solveHelmholtz.m:152-171).
    """

    angular_resolution: int = 100
    range_resolution: int = 10
    fix_b: bool = True
    # Corner-term A/B gather convention. "matlab" (default) follows the
    # MATLAB original's face-consistent staggered sampling
    # (solveHelmholtz.m:104-126) — the discretization that synthesized the
    # recorded dataset. "jax_port" replicates the reference JAX port's
    # shifted corner gathers incl. their out-of-bounds clamping
    # (solve_helmholtz.py:224-260); use for head-to-head trajectory parity
    # with the runnable reference implementation.
    corner_mode: str = "matlab"


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Helmholtz solver configuration.

    ``tol`` is the relative-residual target for the Krylov solver; ``maxiter``
    bounds its iteration count. ``shift_beta`` is the complex shift of the
    shifted-Laplacian FFT preconditioner (standard choice ~0.5).
    ``born_iter_cap`` bounds the Born-series fixed-point iteration count
    (the physics-derived count is used when smaller; reference:
    solveHelmholtzBornSeries.m:45-49).

    ``born_pml``: the Born solver uses its own absorbing-layer parameters.
    The reference reuses the FD-PML's (a0=10, L=9mm), which leaves ~14%
    boundary-reflection error in the Born solution; a0=20 / L=12mm reaches
    ~2e-4 against the analytic free-space Green's function at the same
    iteration budget (measured; see tests/test_solvers.py).
    """

    method: SolverMethod = SolverMethod.BANDED
    split_complex: bool = False  # carry complex data as (re, im) f32 pairs;
    # required on TPU runtimes without full complex64 support (see ops.cpx)
    # Direct-method factorization (split engine): "auto" = the fused Pallas
    # block-Thomas kernel on TPU (whole recurrence + blocked Gauss-Jordan
    # inverses in one kernel, ~2.2x the XLA scan; see ops.pallas_factor),
    # XLA scan elsewhere; "thomas" = the XLA lax.scan block-Thomas;
    # "pallas" = force the fused kernel; "twisted" = two-sided (BABE)
    # elimination from both grid ends toward the middle row — identical
    # flops to block-Thomas in HALF the dependent grid steps
    # (ops.twisted / ops.pallas_twisted; fused kernels off-CPU, XLA
    # scans on CPU). MEASURED (PERF_NOTES round 5): solve sweeps 1.26x
    # at 301^2 HIGHEST (1.01-1.17x at 601-801^2), factor NEUTRAL at
    # every scale (it is throughput-bound on pivot instructions, which
    # twisted conserves), bench-config end-to-end neutral (production
    # sweeps run DEFAULT where the win is small) — so "auto" stays the
    # default and "twisted" is the opt-in for HIGHEST-precision
    # many-solves-per-factor forward modeling at <= ~600^2;
    # "cr" = block cyclic reduction
    # (ops.cyclic — measured slower end-to-end on the targeted runtime,
    # kept for batched-elimination reference); "spike" = the distributed
    # grid-sharded SPIKE factorization (parallel.spike) — one y-slab per
    # device on a mesh 'grid' axis; requires passing mesh= to the operator
    # API / nonlinear_cg / invert_dataset, removes the one-chip grid limit.
    factorization: str = "auto"
    tol: float = 1e-5
    maxiter: int = 1000
    shift_beta: float = 0.5
    # Two-level (deflated) shifted-Laplacian preconditioning for the GMRES
    # method (split engine): adds a direct coarse-grid correction on the
    # re-discretized 2h operator before the FFT sweep, deflating the
    # near-resonant modes that make one-level iteration counts grow with
    # wavenumber (ops.preconditioner.make_two_level_preconditioner_cpx;
    # measured matvec counts in PERF_NOTES round 3). Needs odd grid dims.
    gmres_two_level: bool = False
    # Complex shift (fraction of k^2) of the two-level COARSE operator:
    # the raw coarse Helmholtz is indefinite with near-singular modes at
    # different wavenumbers than the fine operator; a small shift keeps
    # the coarse resolvent bounded (see solve._coarse_factor_cpx).
    coarse_shift_beta: float = 0.1
    refine: int = 0  # iterative-refinement passes after a banded solve
    # (0 suffices at f32 contraction precision: ~3e-6 true relative residual
    # measured at the reference 301^2/256-tx workload on TPU and CPU)
    # MXU precision of the fused factor kernel's panel updates ("highest" |
    # "default"). "default" (single-pass bf16) pays only at LARGE grids,
    # where the O(nx^3/row) panel matmuls dominate the factorization:
    # measured at 801^2 on the real chip, factor 564 -> 310 ms and — with
    # refine=2 — equal solve residual (6.9e-6 vs 1.0e-5) at 422 vs 603 ms
    # total per 64-RHS solve. At 301^2 the kernel is op-issue-bound and
    # "default" buys nothing (PERF_NOTES). Use with refine=2 at >=601^2.
    factor_precision: str = "highest"
    # Hybrid factorization (split engine only): >0 replaces most exact
    # Schur-complement inverses with warm-started Newton-Schulz steps
    # (~2.5x faster factorization on the targeted TPU runtime); 0 = exact.
    factor_schulz_steps: int = 0
    # Precompute dense real-embedded sweep operators at factor time so each
    # solve-sweep scan step is ONE MXU matmul instead of ~a dozen
    # latency-bound ops (split engine; see split_engine.prepare_sweep_ops).
    # Costs 4x the factor memory (~1.7 GB at 301^2) and the embedding work
    # exceeds the sweep saving on the benchmark workload (measured: 0.160 vs
    # 0.148 s/iter), so None/False = off; set True only for workloads doing
    # MANY solves per factorization (forward-modeling sweeps).
    fast_sweeps: bool | None = None
    # Mixed-precision FWI inner loop (off-CPU pallas sweeps only; the
    # factorization, data synthesis and the standalone solve_helmholtz API
    # always run HIGHEST). The three flags run the corresponding CG-loop
    # solve's fused sweeps at DEFAULT MXU precision (single-pass bf16,
    # ~1e-3 relative field accuracy) instead of HIGHEST (6-pass f32):
    #   * fast_linesearch — the perturbation solve feeds only the scalar
    #     step size (first-order sensitivity);
    #   * fast_adjoint — the adjoint solve feeds the gradient IMAGE, whose
    #     ~1e-3 direction error is absorbed by the CG iteration (inexact-
    #     Newton argument);
    #   * fast_forward — the forward solve's ~1e-3 residual bias sits far
    #     below FWI residual levels (the converged misfit here is ~28 % of
    #     the data norm).
    # Measured on the reference workload (301^2, 256 tx, 10 iters, real
    # chip): 0.0650 (all HIGHEST) -> 0.0613 (ls) -> 0.0559 (ls+adj) ->
    # 0.0522 s/iter (all three) = 100x the MATLAB baseline; reconstruction
    # RMSE 15.06 / 15.07 / 14.98 / 15.10 m/s (noise band), loss monotone
    # in every case, final loss within 0.7 % (PERF_NOTES round 3). Set all
    # False to reproduce the full-precision trajectory.
    fast_linesearch: bool = True
    fast_adjoint: bool = True
    fast_forward: bool = True
    # Frozen-factor CG: with refactor_every = K > 1 the CG loop runs the
    # banded factorization (the dominant in-loop cost: ~32 ms of ~52 at
    # 301^2) only on iterations where it % K == 0 and reuses the previous
    # factor in between — the velocity moves ~1%/iteration on the
    # reference workload, so the stale factorization stays an excellent
    # approximate inverse of the CURRENT operator. The reused factor is
    # FULLY stale (G blocks and sweep planes from the same factorization:
    # a consistent, stable elimination — mixing stale G with current
    # planes overflows f32 beyond ~600 rows; PERF_NOTES round 4). On stale
    # iterations the forward and adjoint solves take one extra iterative-
    # refinement pass against the current operator when stale_refine is
    # set (the line-search solve feeds only a first-order scalar step and
    # is never refined). CG-loop only (nonlinear_cg / invert_dataset),
    # split-complex banded method, not with factorization="spike".
    # Default 1 (off): see PERF_NOTES rounds 3-4 for the measured (K,
    # refine) -> s/iter / RMSE trade-offs; pays at 301^2-class grids,
    # rejected at 601^2 (factor is a smaller cost share than the extra
    # refinement there).
    refactor_every: int = 1
    stale_refine: bool = True
    # Fused 9-point operator application (ops.pallas_stencil) for the
    # banded refinement passes and GMRES matvecs: "auto" = off-CPU, the
    # whole-field kernel (h_apply_pallas_cpx) when it fits VMEM (<= 704^2,
    # measured; fused_apply_fits), and past that the y-tiled kernel
    # (h_apply_tiled_cpx) only at NON-8-aligned row widths — the measured
    # win region (801^2: 1.8x; XLA's own one-pass fusion of the jnp apply
    # is faster at 8-aligned widths; PERF_NOTES round 5). "on" = force
    # whole-field; "tiled" = force the y-tiled kernel; "off" = the jnp
    # apply everywhere.
    fused_apply: str = "auto"
    born_iter_cap: int = 1000
    born_iter_scale: float = 1.0
    born_krylov: bool = True  # GMRES-accelerate the Born series (2-5x fewer FFTs)
    born_restart: int = 16
    born_pml: PMLConfig = PMLConfig(a0=20.0, l_pml=12.0e-3)
    pml: PMLConfig = PMLConfig()
    stencil: StencilConfig = StencilConfig()


@dataclasses.dataclass(frozen=True)
class AcquisitionConfig:
    """Ring-array acquisition geometry.

    Defaults reproduce the reference acquisition: 256 elements on a 110 mm
    ring, +/-31 elements (plus self) excluded around each transmitter
    (reference: SimulateData.m:15-20, fwi_script.py:39).
    """

    num_elements: int = 256
    radius: float = 110.0e-3
    num_excluded_each_side: int = 31
    tx_downsample: int = 1
    # Element placement on the grid: "nearest" snaps to the closest pixel
    # (reference behavior: fwi_script.py:53-66; up to half a pixel of
    # position error, which acts as coherent phase noise — measured to
    # degrade and even diverge single-frequency FWI when the synthesis and
    # inversion grids snap differently). "bilinear" spreads each element
    # over its 4 neighboring pixels with exact interpolation weights,
    # eliminating the snapping error; sampling and injection use the same
    # weights, so the adjoint stays consistent.
    interpolation: str = "nearest"  # "nearest" | "bilinear"


@dataclasses.dataclass(frozen=True)
class FWIConfig:
    """Outer-loop inversion configuration.

    Defaults match the reference benchmark workload (c_init=1480 m/s,
    10 iterations, HS momentum, step formula 1; reference:
    fwi_script.py:90-91, FrequencyDomainFWI.m:35-46).
    """

    c_init: float = 1480.0
    num_iterations: int = 10
    momentum: MomentumFormula = MomentumFormula.HESTENES_STIEFEL
    step_size: StepSizeFormula = StepSizeFormula.RESIDUAL
    eps_stabilizer: float = 0.0  # added to beta/step denominators (0 = reference behavior)
    estimate_source_strength: bool = True
    # Failure guards (the reference has none — SURVEY.md section 5; its
    # stabilizers are commented out and division by ~0 is possible at
    # convergence, nonlinearcg.py:28,133):
    reject_nonfinite: bool = True  # skip an update that would produce NaN/inf
    # Nonmonotone watchdog (CG loops, 2D + 3D): when set, an iteration
    # whose misfit exceeds reject_increase x the previous iteration's is
    # treated as a MISstep — the model reverts to the previous iterate,
    # the CG recurrence restarts (beta forced to 0 next iteration), and
    # the loss baseline keeps the pre-spike value. One iteration's solves
    # are sacrificed per trigger. With step_size=BB the revert zeroes the
    # (dm, dg) increments, so the next step automatically falls back to
    # the exact line search — together they make BB safe near the solver
    # truncation floor (measured: PERF_NOTES round 5). None = off (the
    # reference has no such guard; its loss may spike silently).
    reject_increase: Optional[float] = None  # e.g. 1.5
    clip_velocity: Optional[Tuple[float, float]] = None  # physical bounds [m/s]
    # Model-space regularization (absent from the reference; see
    # fwi.regularization for the per-optimizer weighting conventions).
    reg_tikhonov: float = 0.0  # first-order smoothing weight
    reg_tv: float = 0.0        # total-variation weight
    reg_tv_eps: float = 1.0    # TV smoothing epsilon [m/s per pixel]
    # Gradient preconditioning (absent from the reference — its gradient is
    # the raw adjoint-state correlation, nonlinearcg.py:126-127).
    # "illumination" divides the gradient by sum_tx |u_tx|^2 (the diagonal
    # Gauss-Newton pseudo-Hessian surrogate), equalizing update strength
    # between the strongly-insonified center of the ring and its edges.
    # Measured on the reference RecordedData workload (real chip, eps=1e-2;
    # PERF_NOTES round 3): reaches the baseline's 10-iteration quality in 5
    # iterations (RMSE 14.99 vs 16.25 unpreconditioned at 5; baseline 15.09
    # at 10), and with bilinear receivers improves the 10-iteration
    # reconstruction outright: RMSE 13.41 -> 12.47 m/s, lower final loss,
    # monotone. Default None = the reference's raw gradient.
    precondition: Optional[str] = None  # None | "illumination"
    precondition_eps: float = 1e-2  # illumination floor, fraction of its max


@dataclasses.dataclass(frozen=True)
class ContinuationConfig:
    """Multi-frequency continuation schedule (low to high, warm-started).

    The reference lists this as future work (single 350 kHz inversion only);
    its only multi-frequency machinery is a serial loop in
    TimeDomainSimulation.m:41-46.
    """

    frequencies: Tuple[float, ...] = ()
    iterations_per_frequency: int = 10
    simultaneous: int = 1  # how many frequencies to batch/shard per stage
