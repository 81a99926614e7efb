"""3D convergent Born series Helmholtz solver — the volumetric slab extension.

The reference is strictly 2D; this extends the CBS machinery of
:mod:`.born` (reference: solveHelmholtzBornSeries.m) to 3D, where FFT-based
matrix-free solvers are the only practical option on accelerator memory
budgets (a 3D direct factorization stores dense (ny*nz)^2 blocks). One
iteration is a 3D FFT pair + elementwise updates — ideal TPU work; grids
shard over the mesh z-axis for slabs beyond one chip (halo-free: the
operator is global in k-space, so sharding happens at the batch/frequency
level or via distributed FFT in later rounds).

Split-complex throughout (see :mod:`.cpx`).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PMLConfig
from ..models.grid3d import Grid3D
from . import cpx
from .cpx import Cpx


def _fft3(x: Cpx) -> Cpx:
    fr = jnp.fft.fftn(x.re, axes=(-3, -2, -1))
    fi = jnp.fft.fftn(x.im, axes=(-3, -2, -1))
    return Cpx(jnp.real(fr) - jnp.imag(fi), jnp.imag(fr) + jnp.real(fi))


def _ifft3(x: Cpx) -> Cpx:
    n = x.re.shape[-1] * x.re.shape[-2] * x.re.shape[-3]
    y = _fft3(x.conj()).conj()
    return Cpx(y.re / n, y.im / n)


# DFT-as-matmul spectral transform: on the TPU the per-axis DFT is a
# (n, n) matmul that runs on the MXU, while XLA's fftn lowers to VPU
# butterflies. Measured on the real chip (PERF_NOTES round 3, f32/HIGHEST,
# batch-16 volumes): 1.35x faster at 64^3, 4.2x at 96^3 (XLA FFT degrades
# hard off powers of two), ~1.1x at 48, a wash at 32, and still 1.34x at
# 128^3 — so "auto" takes the matmul path for axes <= _DFT_MAX_AXIS on
# TPU backends. Cumulative transform error vs fftn is ~1e-5 over 50
# round trips (HIGHEST contractions; DEFAULT/bf16 measured at 9e-2 and
# rejected).
_DFT_MAX_AXIS = 128


@functools.lru_cache(maxsize=None)
def _dft_mats(n: int):
    k = np.arange(n)
    w = np.exp(-2j * np.pi * np.outer(k, k) / n)
    return w.real.astype(np.float32), w.imag.astype(np.float32)


_DFT_SPECS = ("...zyx,zw->...wyx", "...zyx,yw->...zwx", "...zyx,xw->...zyw")


def _transform_precision(precision) -> jax.lax.Precision:
    """Map a transform-precision name to the MXU contraction precision of
    the DFT matmuls: "highest" (6-pass f32, the default), "high" (3-pass
    bf16x3, ~f32 accuracy at half the MXU passes), "default" (single-pass
    bf16, ~1e-3 relative per transform — acceptable only where the
    consumer is quality-gated, e.g. the FWI inner loop's solves; see
    fwi.fwi3d.nonlinear_cg_3d(spectral_precision=...))."""
    if isinstance(precision, jax.lax.Precision):
        return precision
    return {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[precision]


def _dft3(x: Cpx, inverse: bool = False, precision="highest") -> Cpx:
    """3D DFT over the last three axes as three MXU matmul contractions
    (numerically the same transform as :func:`_fft3` / its inverse)."""
    dims = x.re.shape[-3:]
    prec = _transform_precision(precision)
    for spec, n in zip(_DFT_SPECS, dims):
        wr, wi = _dft_mats(n)
        if inverse:
            wi = -wi
        er_r = jnp.einsum(spec, x.re, wr, precision=prec)
        er_i = jnp.einsum(spec, x.re, wi, precision=prec)
        ei_r = jnp.einsum(spec, x.im, wr, precision=prec)
        ei_i = jnp.einsum(spec, x.im, wi, precision=prec)
        x = Cpx(er_r - ei_i, er_i + ei_r)
    if inverse:
        s = 1.0 / float(np.prod(dims))
        x = Cpx(x.re * s, x.im * s)
    return x


def _use_dft(shape, spectral: str) -> bool:
    if spectral == "dft":
        return True
    if spectral == "fft":
        return False
    if spectral != "auto":
        raise ValueError(f"spectral must be auto|fft|dft, got {spectral!r}")
    return (max(shape) <= _DFT_MAX_AXIS
            and jax.default_backend() not in ("cpu",))


def born_operator_3d(vel, f, grid: Grid3D, pml: PMLConfig,
                     adjoint: bool = False, n_order: int = 9,
                     attenuation=None, spectral: str = "auto",
                     shell_k0=None, spectral_precision="highest",
                     eps_scale: float = 1.0):
    """3D CBS split: k-space Green's function, potential, preconditioner.

    ``spectral``: "fft" (XLA fftn), "dft" (MXU matmul transform), or
    "auto" (matmul on TPU for axes <= 128 — see :data:`_DFT_MAX_AXIS`).

    ``spectral_precision``: MXU precision of the DFT-as-matmul transforms
    ("highest" | "high" | "default"; :func:`_transform_precision`). Only
    the dft path consumes it — the fftn path is precision-fixed. The
    standalone-solver default stays "highest" (the 50-round-trip
    cumulative-error ladder measured DEFAULT at 9e-2 and rejected it for
    data synthesis); the FWI inner loop exposes it per-solve where final
    model quality, not per-solve accuracy, is the gate.

    ``attenuation``: optional (nz, ny, nx) alpha map [Np/m] for lossy
    media — k = omega/c + i*sgn*alpha exactly as in the 2D engines
    (stencil.helmholtz_coefficients; the wavenumber is engine-agnostic),
    so k^2 gains Re -= alpha^2 and Im += 2*sgn*alpha*omega/c. The adjoint
    operator is the conjugate (complex-symmetric CBS), handled by the same
    ``sign`` flip as the absorbing shell.

    ``shell_k0``: optional fixed wavenumber [rad/m] for the absorbing
    shell's impedance tuning. Default None derives it from the medium
    (sqrt of the mean k^2) with a ``stop_gradient``: the absorber is part
    of the DISCRETIZATION, not the physics, so the model gradient must not
    flow through it — otherwise every interior voxel picks up a spurious
    O(1/N) mean-coupling term through the shell (measured at 2.2x the
    physical gradient on a 25^3 toy where the shell is a large volume
    fraction). Pass an explicit float (e.g. omega/c_background) to ALSO
    freeze it functionally, which makes finite differences of a loss
    through this operator match the adjoint-state/custom-VJP gradient."""
    nz, ny, nx = grid.shape
    sign = float(pml.sign_convention) * (-1.0 if adjoint else 1.0)

    vel = jnp.asarray(vel, jnp.float32)
    k_real = 2 * jnp.pi * f / vel

    kx = (2 * jnp.pi * jnp.fft.fftfreq(nx, d=grid.dx)).astype(jnp.float32)
    ky = (2 * jnp.pi * jnp.fft.fftfreq(ny, d=grid.dy)).astype(jnp.float32)
    kz = (2 * jnp.pi * jnp.fft.fftfreq(nz, d=grid.dz)).astype(jnp.float32)
    p2 = (kz[:, None, None] ** 2 + ky[None, :, None] ** 2
          + kx[None, None, :] ** 2)

    # Polynomial absorbing shell on all six faces.
    c_att = pml.a0 / pml.l_pml
    if shell_k0 is None:
        k0_b = jax.lax.stop_gradient(jnp.sqrt(jnp.mean(k_real ** 2)))
    else:
        k0_b = jnp.float32(shell_k0)
    x = jnp.asarray(grid.x, jnp.float32)
    y = jnp.asarray(grid.y, jnp.float32)
    z = jnp.asarray(grid.z, jnp.float32)
    x_p = jnp.maximum(jnp.abs(x) + pml.l_pml - (nx - 1) * grid.dx / 2, 0.0)
    y_p = jnp.maximum(jnp.abs(y) + pml.l_pml - (ny - 1) * grid.dy / 2, 0.0)
    z_p = jnp.maximum(jnp.abs(z) + pml.l_pml - (nz - 1) * grid.dz / 2, 0.0)
    r_b = jnp.sqrt(z_p[:, None, None] ** 2 + y_p[None, :, None] ** 2
                   + x_p[None, None, :] ** 2)
    cr = c_att * r_b
    trunc_exp = jnp.ones_like(cr)
    for m in range(n_order, 0, -1):
        trunc_exp = 1 + trunc_exp * cr / m
    denom = math.factorial(n_order) * trunc_exp
    curve = Cpx((c_att ** 2) * (n_order - cr) * cr ** (n_order - 1) / denom,
                (c_att ** 2) * (2 * k0_b * r_b * sign) * cr ** (n_order - 1) / denom)
    if attenuation is not None:
        alpha = jnp.asarray(attenuation, jnp.float32)
        k2 = Cpx(k_real ** 2 - alpha ** 2 + curve.re,
                 curve.im + 2 * sign * alpha * k_real)
    else:
        k2 = Cpx(k_real ** 2 + curve.re, curve.im)
    k = cpx.sqrt(k2)

    # k_0 / eps only shape the G/V splitting (the preconditioner): the
    # converged solution is independent of them, so gradients must not
    # flow through these nonsmooth min/max reductions (truncation noise).
    # ``eps_scale`` rescales eps away from the classical CBS bound
    # (eps = max|V|, the MINIMAL damping that makes the fixed point a
    # contraction — Osnabrugge 2016). The fixed-point solver requires
    # scale >= 1; GMRES only needs A nonsingular, and a smaller eps gives
    # a sharper Green's function, trading fixed-point-safety for Krylov
    # convergence speed (measured ladder: PERF_NOTES round 5).
    k_0 = jax.lax.stop_gradient((jnp.min(k.re) + jnp.max(k.re)) / 2)
    v_pot0 = Cpx(k2.re - k_0 ** 2, k2.im)
    eps = (jax.lax.stop_gradient(jnp.max(cpx.absval(v_pot0)))
           * sign * jnp.float32(eps_scale))
    v_pot = Cpx(v_pot0.re, v_pot0.im - eps)
    gamma = cpx.mul(Cpx(jnp.zeros_like(eps), 1.0 / eps), v_pot)

    pseudo_prop_len = 2 * k_0 / jnp.abs(eps)
    n_iter = jnp.ceil(jnp.float32(grid.diagonal) / pseudo_prop_len)

    g0 = cpx.reciprocal(Cpx(p2 - k_0 ** 2, -eps * jnp.ones_like(p2)))

    if _use_dft(grid.shape, spectral):
        def greens(w: Cpx) -> Cpx:
            return _dft3(cpx.mul(g0, _dft3(w, precision=spectral_precision)),
                         inverse=True, precision=spectral_precision)
    else:
        def greens(w: Cpx) -> Cpx:
            return _ifft3(cpx.mul(g0, _fft3(w)))

    return greens, v_pot, gamma, n_iter


def born_series_solve_3d(vel, src, f, grid: Grid3D,
                         pml: PMLConfig = PMLConfig(a0=20.0, l_pml=12e-3),
                         adjoint: bool = False, n_order: int = 9,
                         iter_cap: int = 2000, iter_scale: float = 1.0,
                         attenuation=None, spectral: str = "auto",
                         shell_k0=None):
    """Solve the 3D Helmholtz equation by convergent Born series.

    Args:
        vel: (nz, ny, nx) wave-speed volume [m/s].
        src: (batch, nz, ny, nx) complex sources (array or Cpx).
        f: frequency [Hz].
        attenuation: optional (nz, ny, nx) alpha [Np/m] lossy-medium map
            (see born_operator_3d).

    Returns:
        (wavefield Cpx (batch, nz, ny, nx), iterations int32)
    """
    greens, v_pot, gamma, n_heur = born_operator_3d(vel, f, grid, pml,
                                                    adjoint, n_order,
                                                    attenuation=attenuation,
                                                    spectral=spectral,
                                                    shell_k0=shell_k0)
    n_iter = jnp.minimum((iter_scale * n_heur).astype(jnp.int32), iter_cap)
    src = cpx.of(src)

    def body(i, u):
        upd = u - greens(cpx.mul(v_pot, u) - src)
        return u - cpx.mul(gamma, upd)

    u0 = cpx.zeros(src.shape)
    u = jax.lax.fori_loop(0, n_iter, body, u0)
    return u, n_iter


def born_gmres_solve_3d(vel, src, f, grid: Grid3D,
                        pml: PMLConfig = PMLConfig(a0=20.0, l_pml=12e-3),
                        adjoint: bool = False, n_order: int = 9,
                        tol: float = 1e-5, maxiter: int = 600,
                        restart: int = 16, attenuation=None,
                        spectral: str = "auto", shell_k0=None,
                        x0: Cpx | None = None, spectral_precision="highest",
                        eps_scale: float = 1.0):
    """Krylov-accelerated 3D convergent Born series (split-complex).

    The 3D analog of 2D :func:`..born.born_gmres_solve`: the CBS fixed
    point ``u <- u - gamma (u - G(Vu - src))`` is a Richardson iteration
    on ``A u = b`` with ``A = gamma (I - G V)`` and ``b = -gamma G src``,
    whose spectrum lies inside the unit disk centered at 1 (the CBS
    convergence bound). Restarted GMRES on the SAME preconditioned
    operator minimizes the residual over the Krylov space instead of
    taking fixed-point steps — each matvec costs exactly one 3D FFT pair,
    the same as one CBS iteration, so the matvec count IS the speedup
    ratio. On the physics-derived counts of realistic contrasts
    (hundreds of CBS iterations per solve) this is the 3D hot-path
    accelerator; the Arnoldi inner products add O(restart) volume passes
    per cycle, negligible next to the FFTs.

    ``eps_scale``: rescale the CBS damping eps away from the classical
    contraction bound (fixed-point solvers need >= 1; GMRES tolerates
    < 1 — see born_operator_3d). Measured at the 64^3 bench point:
    PERF_NOTES round 5.

    Returns (wavefield Cpx (batch, nz, ny, nx), matvecs int32).
    """
    from .krylov import gmres_cpx

    greens, v_pot, gamma, _ = born_operator_3d(
        vel, f, grid, pml, adjoint, n_order, attenuation=attenuation,
        spectral=spectral, shell_k0=shell_k0,
        spectral_precision=spectral_precision, eps_scale=eps_scale)
    src = cpx.of(src)

    def a_op(u):
        return cpx.mul(gamma, u - greens(cpx.mul(v_pot, u)))

    b = -cpx.mul(gamma, greens(src))
    # x0: optional warm start (e.g. the previous comb line's field in a
    # frequency sweep — data/timedomain3d.py measures the benefit).
    res = gmres_cpx(a_op, b, x0=x0, tol=tol, maxiter=maxiter,
                    restart=restart)
    return res.x, res.iterations


# ---------------------------------------------------------------------------
# Differentiable solve: continuous adjoint-state VJP (the 3D analog of the
# 2D ops.solve._born_solve custom_vjp, solve.py:323-348)
# ---------------------------------------------------------------------------

def _born3d_diff_impl(vel, rhs: Cpx, f, grid, pml, iter_cap, spectral,
                      use_gmres, tol, restart, adjoint, shell_k0,
                      attenuation=None):
    if use_gmres:
        u, _ = born_gmres_solve_3d(vel, rhs, f, grid, pml, adjoint=adjoint,
                                   tol=tol, maxiter=iter_cap,
                                   restart=restart, spectral=spectral,
                                   shell_k0=shell_k0,
                                   attenuation=attenuation)
    else:
        u, _ = born_series_solve_3d(vel, rhs, f, grid, pml, adjoint=adjoint,
                                    iter_cap=iter_cap, spectral=spectral,
                                    shell_k0=shell_k0,
                                    attenuation=attenuation)
    return u


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11))
def _born3d_diff_lossless(vel, rhs: Cpx, f, grid: Grid3D, pml: PMLConfig,
                          iter_cap: int, spectral: str, use_gmres: bool,
                          tol: float, restart: int, adjoint: bool,
                          shell_k0) -> Cpx:
    return _born3d_diff_impl(vel, rhs, f, grid, pml, iter_cap, spectral,
                             use_gmres, tol, restart, adjoint, shell_k0)


def _born3d_diff_fwd(vel, rhs, f, grid, pml, iter_cap, spectral, use_gmres,
                     tol, restart, adjoint, shell_k0):
    u = _born3d_diff_lossless(vel, rhs, f, grid, pml, iter_cap, spectral,
                              use_gmres, tol, restart, adjoint, shell_k0)
    return u, (vel, u, f)


def _born3d_diff_bwd(grid, pml, iter_cap, spectral, use_gmres, tol, restart,
                     adjoint, shell_k0, residuals, g: Cpx):
    vel, u, f = residuals
    # A^H lam = g: one solve with the conjugated operator (the engine's
    # `adjoint` flag flips the sign convention = conjugation, matching the
    # hand adjoint-state solve in fwi.fwi3d.objective_pieces_3d).
    lam = _born3d_diff_impl(vel, g, f, grid, pml, iter_cap, spectral,
                            use_gmres, tol, restart, not adjoint, shell_k0)
    dk2_dvel = -2.0 * (2 * jnp.pi * f) ** 2 / vel ** 3
    vel_bar = -jnp.sum(lam.re * u.re + lam.im * u.im, axis=0) * dk2_dvel
    f_bar = jnp.zeros_like(jnp.asarray(f, jnp.float32))
    return vel_bar, lam, f_bar


_born3d_diff_lossless.defvjp(_born3d_diff_fwd, _born3d_diff_bwd)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12))
def _born3d_diff_lossy(vel, alpha, rhs: Cpx, f, grid: Grid3D,
                       pml: PMLConfig, iter_cap: int, spectral: str,
                       use_gmres: bool, tol: float, restart: int,
                       adjoint: bool, shell_k0) -> Cpx:
    return _born3d_diff_impl(vel, rhs, f, grid, pml, iter_cap, spectral,
                             use_gmres, tol, restart, adjoint, shell_k0,
                             attenuation=alpha)


def _born3d_diff_lossy_fwd(vel, alpha, rhs, f, grid, pml, iter_cap,
                           spectral, use_gmres, tol, restart, adjoint,
                           shell_k0):
    u = _born3d_diff_lossy(vel, alpha, rhs, f, grid, pml, iter_cap,
                           spectral, use_gmres, tol, restart, adjoint,
                           shell_k0)
    return u, (vel, alpha, u, f)


def _born3d_diff_lossy_bwd(grid, pml, iter_cap, spectral, use_gmres, tol,
                           restart, adjoint, shell_k0, residuals, g: Cpx):
    """Adjoint-state VJP, lossy case. The interior potential k^2 = (omega/c
    + i*sgn*alpha)^2 is complex-analytic in both REAL fields, so with
    s = sum_b conj(lam) * u each field's cotangent is -Re(s * dk2/dfield):

        dk2/dc     = -2 (omega/c^2) k_c
        dk2/dalpha =  2 i sgn      k_c ,   k_c = omega/c + i sgn alpha.

    The sign flip in the adjoint solve conjugates the LOSSY operator too
    (k2.im is proportional to sgn throughout), so lam = A^-H g stays one
    flag-flipped solve with the same alpha map.
    """
    vel, alpha, u, f = residuals
    lam = _born3d_diff_impl(vel, g, f, grid, pml, iter_cap, spectral,
                            use_gmres, tol, restart, not adjoint, shell_k0,
                            attenuation=alpha)
    omega = 2 * jnp.pi * f
    sgn = float(pml.sign_convention) * (-1.0 if adjoint else 1.0)
    # s = sum_b conj(lam) * u, split parts.
    s_re = jnp.sum(lam.re * u.re + lam.im * u.im, axis=0)
    s_im = jnp.sum(lam.re * u.im - lam.im * u.re, axis=0)
    kc_re = omega / vel
    kc_im = sgn * alpha
    # q_vel = -2 (omega/c^2) k_c
    c2 = 2.0 * omega / vel ** 2
    vel_bar = -(s_re * (-c2 * kc_re) - s_im * (-c2 * kc_im))
    # q_alpha = 2 i sgn k_c = -2 alpha + 2 i sgn omega/c
    alpha_bar = -(s_re * (-2.0 * alpha) - s_im * (2.0 * sgn * kc_re))
    f_bar = jnp.zeros_like(jnp.asarray(f, jnp.float32))
    return vel_bar, alpha_bar, lam, f_bar


_born3d_diff_lossy.defvjp(_born3d_diff_lossy_fwd, _born3d_diff_lossy_bwd)


def born_solve_3d_diff(vel, rhs: Cpx, f, grid: Grid3D,
                       pml: PMLConfig = PMLConfig(a0=20.0, l_pml=12e-3),
                       iter_cap: int = 600, spectral: str = "auto",
                       use_gmres: bool = True, tol: float = 2e-3,
                       restart: int = 8, adjoint: bool = False,
                       shell_k0=None, attenuation=None) -> Cpx:
    """Differentiable 3D Helmholtz solve (CBS engine, split-complex).

    Reverse-mode rule = the continuous adjoint-state identity: with the
    complex-symmetric Born operator A (diagonal potential + even
    convolution kernel, so A^T = A and A^H = conj(A)), the cotangent
    solve is ONE adjoint Helmholtz solve, lam = A^-H g, and

        vel_bar = -Re(conj(lam) * u) * dk^2/dvel
        rhs_bar = lam,

    with dk^2/dvel = -2 w^2/c^3 in lossless media and the complex
    k_c-weighted factors of :func:`_born3d_diff_lossy_bwd` when an
    ``attenuation`` map is given (which is then differentiable too —
    alpha-map inversion through the 3D spectral engine).

    This makes ``jax.grad`` through the 3D solver cost exactly one extra
    solve — the identity the reference's broken autodiff path aspired to
    (SURVEY.md section 3.2; its pure_callback had no VJP), lifted to 3D.

    ``rhs``: Cpx (batch, nz, ny, nx). Returns the wavefield Cpx.
    """
    if attenuation is None:
        return _born3d_diff_lossless(vel, rhs, f, grid, pml, iter_cap,
                                     spectral, use_gmres, tol, restart,
                                     adjoint, shell_k0)
    return _born3d_diff_lossy(vel, jnp.asarray(attenuation, jnp.float32),
                              rhs, f, grid, pml, iter_cap, spectral,
                              use_gmres, tol, restart, adjoint, shell_k0)
