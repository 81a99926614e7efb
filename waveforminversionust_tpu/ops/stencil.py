"""Dispersion-minimizing 9-point Helmholtz stencil with PML, matrix-free.

The reference assembles a (nx*ny)^2 sparse matrix from this stencil and
LU-factorizes it on the host (reference: solve_helmholtz.py:158-290,
solveHelmholtz.m:41-129). TPUs have no sparse direct solver and don't need
one: the operator is a 9-point stencil, i.e. nine spatially-varying complex
coefficient planes applied as shifted multiply-adds. This module builds those
planes; :mod:`.apply` applies them.

Discretization: Chen/Cheng/Feng/Wu 2013 optimal 9-point scheme for
(d/dx (A du/dx) + d/dy (B du/dy) + C k^2 u) with PML stretch fields A, B, C
sampled on a staggered half-step grid (reference: solveHelmholtz.m:27-45).

Parity note: the neighbor gathers below follow the MATLAB original
(solveHelmholtz.m:53-126), which samples the staggered A/B fields
consistently. The reference's JAX port shifts some corner-term A/B gathers by
one cell (reference: solve_helmholtz.py:224-260 vs solveHelmholtz.m:104-126);
the difference is confined to the PML ring (A=B=1 elsewhere) and carries
weight (1-b)/2 = 1/12. We implement the MATLAB-canonical version since the
recorded dataset was synthesized with it.

Stencil neighbor order used throughout this package:
    0: C  (y,   x  )    center
    1: L  (y,   x-1)
    2: R  (y,   x+1)
    3: D  (y-1, x  )
    4: U  (y+1, x  )
    5: DL (y-1, x-1)
    6: DR (y-1, x+1)
    7: UL (y+1, x-1)
    8: UR (y+1, x+1)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import PMLConfig, StencilConfig
from ..models.grid import Grid2D

# (dy, dx) offsets per stencil slot, in the order documented above.
STENCIL_OFFSETS = (
    (0, 0), (0, -1), (0, 1), (-1, 0), (1, 0),
    (-1, -1), (-1, 1), (1, -1), (1, 1),
)


def stencil_params(vmin, vmax, f, h: float, g: float,
                   config: StencilConfig = StencilConfig()):
    """Optimal (b, d, e) for the 9-point stencil.

    Least-squares fit of the stencil's dispersion relation over propagation
    angles [0, pi/4] and normalized wavelengths G in [vmin, vmax]/(f h),
    after Chen/Cheng/Feng/Wu 2013 (reference: solve_helmholtz.py:104-154,
    solveHelmholtz.m:141-181).

    Args:
        vmin, vmax: min/max wave speed (may be traced scalars).
        f: frequency [Hz].
        h: grid spacing in x.
        g: dy/dx anisotropy ratio.

    Returns:
        (b, d, e) scalars (float32).
    """
    l = config.angular_resolution
    r = config.range_resolution
    g = jnp.asarray(g, jnp.float32)
    gmin = vmin / (f * h)
    gmax = vmax / (f * h)

    m = jnp.arange(1, l + 1, dtype=jnp.float32)
    n = jnp.arange(1, r + 1, dtype=jnp.float32)
    theta = (m - 1) * jnp.pi / (4 * (l - 1))
    G = 1.0 / (1.0 / gmax + (n - 1) / (r - 1) * (1.0 / gmin - 1.0 / gmax))
    TH, GG = jnp.meshgrid(theta, G)

    P = jnp.cos(g * 2 * jnp.pi * jnp.cos(TH) / GG)
    Q = jnp.cos(2 * jnp.pi * jnp.sin(TH) / GG)

    S1 = (1 + 1 / g**2) * GG**2 * (1 - P - Q + P * Q)
    S2 = jnp.pi**2 * (2 - P - Q)
    S3 = 2 * jnp.pi**2 * (1 - P * Q)
    S4 = 2 * jnp.pi**2 + GG**2 * ((1 + 1 / g**2) * P * Q - P - Q / g**2)

    if config.fix_b:
        b = jnp.float32(5.0 / 6.0)
        M = jnp.stack([S2.ravel(), S3.ravel()], axis=1)
        rhs = S4.ravel() - b * S1.ravel()
    else:
        M = jnp.stack([S1.ravel(), S2.ravel(), S3.ravel()], axis=1)
        rhs = S4.ravel()

    # Small (2x2 or 3x3) normal-equation solve; well-conditioned at this size.
    gram = M.T @ M
    params = jnp.linalg.solve(gram, M.T @ rhs)

    if config.fix_b:
        return b, params[0], params[1]
    return params[0], params[1], params[2]


def pml_stretch_fields(grid: Grid2D, f, pml: PMLConfig):
    """Staggered PML coefficient fields (A, B, C).

    Quadratic PML profile s = 2*pi*a0*f*((|r - ctr| - span + L)_+ / L)^2
    evaluated on the half-step grid (2N-1 points per axis), then sampled:
      A = (ey/ex) at (integer y, half-integer x)   -> shape (ny, nx-1)
      B = (ex/ey) at (half-integer y, integer x)   -> shape (ny-1, nx)
      C = (ex*ey) at (integer y, integer x)        -> shape (ny, nx)
    (reference: solve_helmholtz.py:30-60, solveHelmholtz.m:27-39)
    """
    xmin, xmax, ymin, ymax = grid.extent
    xe = jnp.linspace(xmin, xmax, 2 * (grid.nx - 1) + 1, dtype=jnp.float32)
    ye = jnp.linspace(ymin, ymax, 2 * (grid.ny - 1) + 1, dtype=jnp.float32)
    Xe, Ye = jnp.meshgrid(xe, ye, indexing="xy")

    xctr, xspan = (xmin + xmax) / 2, (xmax - xmin) / 2
    yctr, yspan = (ymin + ymax) / 2, (ymax - ymin) / 2
    L = pml.l_pml

    sx = 2 * jnp.pi * pml.a0 * f * (jnp.maximum(jnp.abs(Xe - xctr) - xspan + L, 0.0) / L) ** 2
    sy = 2 * jnp.pi * pml.a0 * f * (jnp.maximum(jnp.abs(Ye - yctr) - yspan + L, 0.0) / L) ** 2

    sgn = jnp.sign(jnp.float32(pml.sign_convention))
    ex = 1 + 1j * sx * sgn / (2 * jnp.pi * f)
    ey = 1 + 1j * sy * sgn / (2 * jnp.pi * f)

    A = (ey / ex)[::2, 1::2]
    B = (ex / ey)[1::2, ::2]
    C = (ex * ey)[::2, ::2]
    return A.astype(jnp.complex64), B.astype(jnp.complex64), C.astype(jnp.complex64)


def dirichlet_scale(grid: Grid2D) -> float:
    """Row scale applied to the Dirichlet boundary rows.

    The reference writes raw identity rows (value 1) next to interior rows of
    magnitude ~1/h^2 (reference: solve_helmholtz.py:266-276). A direct solver
    doesn't care; an iterative one does — the 10^6 row-scale imbalance puts
    near-zero eigenvalues into the preconditioned spectrum. We scale the
    boundary rows (and, in the solver, the matching RHS entries) by 1/h^2,
    which preserves the solution exactly while keeping the system
    well-scaled.
    """
    return 1.0 / (grid.h * grid.h)


def boundary_mask(grid: Grid2D):
    """(ny, nx) float32 mask: 1 on the outer boundary ring, 0 inside."""
    m = jnp.zeros((grid.ny, grid.nx), jnp.float32)
    m = m.at[0, :].set(1.0).at[-1, :].set(1.0)
    m = m.at[:, 0].set(1.0).at[:, -1].set(1.0)
    return m


def helmholtz_coefficients(vel, grid: Grid2D, f, pml: PMLConfig = PMLConfig(),
                           stencil: StencilConfig = StencilConfig(),
                           dirichlet_value: float | None = None,
                           attenuation=None, pml_fields=None):
    """Build the nine complex coefficient planes of the Helmholtz operator.

    Returns ``coeffs`` of shape (9, ny, nx) complex64 such that
    ``(H u)[y, x] = sum_s coeffs[s, y, x] * u[y + dy_s, x + dx_s]`` on
    interior points, and scaled-identity (Dirichlet) rows on the boundary
    (reference: solveHelmholtz.m:53-126 for the entries,
    solve_helmholtz.py:266-276 for the Dirichlet border; see
    :func:`dirichlet_scale` for why the rows are scaled).

    Args:
        vel: (ny, nx) real wave-speed map [m/s].
        grid: the computational grid.
        f: frequency [Hz] (scalar, may be traced).
        dirichlet_value: boundary row value; defaults to
            :func:`dirichlet_scale`. Pass 1.0 for bit-parity with the
            reference matrix.
        attenuation: optional (ny, nx) attenuation map alpha [Np/m]. The
            wavenumber becomes k = omega/c + i*sgn*alpha with sgn the PML
            sign convention, so waves decay as exp(-alpha * distance)
            (the reference models lossless media only; attenuation is a
            framework addition).
        pml_fields: optional precomputed (A, B, C) from
            :func:`pml_stretch_fields` — they depend only on (grid, f, pml),
            so callers that rebuild the operator per iteration (the FWI
            loops) hoist them out of the loop.
    """
    ny, nx = grid.ny, grid.nx
    h = jnp.float32(grid.h)
    g = jnp.float32(grid.aspect)
    vel = jnp.asarray(vel, jnp.float32)

    kr = 2 * jnp.pi * f / vel
    if attenuation is None:
        k2 = (kr * kr).astype(jnp.complex64)
    else:
        sgn = jnp.sign(jnp.float32(pml.sign_convention))
        alpha = jnp.asarray(attenuation, jnp.float32)
        k = jax.lax.complex(kr, sgn * alpha)
        k2 = k * k

    A, B, C = (pml_fields if pml_fields is not None
               else pml_stretch_fields(grid, f, pml))
    b, d, e = stencil_params(jnp.min(vel), jnp.max(vel), f, h, g, stencil)
    b = b.astype(jnp.complex64) if hasattr(b, "astype") else jnp.complex64(b)
    d = d.astype(jnp.complex64)
    e = e.astype(jnp.complex64)
    g2 = (g * g).astype(jnp.complex64)
    h2 = (h * h).astype(jnp.complex64)

    # Interior slices: rows y in [1, ny-2], cols x in [1, nx-2].
    # Helper slice notations over the (ny, nx) node grid:
    #   cc -> [1:-1, 1:-1]; and A/B are staggered so their column/row counts
    #   differ by one (A: (ny, nx-1) x-face field, B: (ny-1, nx) y-face field).
    def s(arr, ys, xs):
        return jax.lax.slice(arr, (ys, xs), (ys + ny - 2, xs + nx - 2))

    # A[y, x] is the x-face at (y, x+1/2); B[y, x] is the y-face at (y+1/2, x).
    A_xm = s(A, 1, 0)   # A[y, x-1]  : left face
    A_xc = s(A, 1, 1)   # A[y, x]    : right face
    A_ym_xm = s(A, 0, 0)  # A[y-1, x-1]
    A_ym_xc = s(A, 0, 1)  # A[y-1, x]
    A_yp_xm = s(A, 2, 0)  # A[y+1, x-1]
    A_yp_xc = s(A, 2, 1)  # A[y+1, x]

    B_ym = s(B, 0, 1)   # B[y-1, x]  : bottom face
    B_yc = s(B, 1, 1)   # B[y, x]    : top face
    B_ym_xm = s(B, 0, 0)  # B[y-1, x-1]
    B_ym_xp = s(B, 0, 2)  # B[y-1, x+1]
    B_yc_xm = s(B, 1, 0)  # B[y, x-1]
    B_yc_xp = s(B, 1, 2)  # B[y, x+1]

    Ck2 = C * k2
    Ck2_c = s(Ck2, 1, 1)
    Ck2_l = s(Ck2, 1, 0)
    Ck2_r = s(Ck2, 1, 2)
    Ck2_d = s(Ck2, 0, 1)
    Ck2_u = s(Ck2, 2, 1)
    Ck2_dl = s(Ck2, 0, 0)
    Ck2_dr = s(Ck2, 0, 2)
    Ck2_ul = s(Ck2, 2, 0)
    Ck2_ur = s(Ck2, 2, 2)

    half = (1 - b) / 2

    val_c = (1 - d - e) * Ck2_c - b * (A_xc + A_xm + (B_yc + B_ym) / g2) / h2
    val_l = (b * A_xm - half * (B_yc_xm + B_ym_xm) / g2) / h2 + (d / 4) * Ck2_l
    val_r = (b * A_xc - half * (B_yc_xp + B_ym_xp) / g2) / h2 + (d / 4) * Ck2_r
    val_d = (b * B_ym / g2 - half * (A_ym_xc + A_ym_xm)) / h2 + (d / 4) * Ck2_d
    val_u = (b * B_yc / g2 - half * (A_yp_xc + A_yp_xm)) / h2 + (d / 4) * Ck2_u
    if stencil.corner_mode == "jax_port":
        # Replicate the reference JAX port's corner gathers: A/B indexed at
        # the corner node (y±1, x±1) directly, which on the staggered
        # (ny, nx-1)/(ny-1, nx) fields runs one past the far edge and is
        # clamped by jnp's out-of-bounds gather semantics
        # (solve_helmholtz.py:224-260). Modeled by edge-duplicated fields.
        # The dl corner coincides with the MATLAB convention.
        A_ext = jnp.concatenate([A, A[:, -1:]], axis=1)   # (ny, nx)
        B_ext = jnp.concatenate([B, B[-1:, :]], axis=0)   # (ny, nx)
        A_dr_p = s(A_ext, 0, 2)
        B_dr_p = s(B_ext, 0, 2)
        A_ul_p = s(A_ext, 2, 0)
        B_ul_p = s(B_ext, 2, 0)
        A_ur_p = s(A_ext, 2, 2)
        B_ur_p = s(B_ext, 2, 2)
        val_dl = half * (A_ym_xm + B_ym_xm / g2) / h2 + (e / 4) * Ck2_dl
        val_dr = half * (A_dr_p + B_dr_p / g2) / h2 + (e / 4) * Ck2_dr
        val_ul = half * (A_ul_p + B_ul_p / g2) / h2 + (e / 4) * Ck2_ul
        val_ur = half * (A_ur_p + B_ur_p / g2) / h2 + (e / 4) * Ck2_ur
    elif stencil.corner_mode == "matlab":
        val_dl = half * (A_ym_xm + B_ym_xm / g2) / h2 + (e / 4) * Ck2_dl
        val_dr = half * (A_ym_xc + B_ym_xp / g2) / h2 + (e / 4) * Ck2_dr
        val_ul = half * (A_yp_xm + B_yc_xm / g2) / h2 + (e / 4) * Ck2_ul
        val_ur = half * (A_yp_xc + B_yc_xp / g2) / h2 + (e / 4) * Ck2_ur
    else:
        raise ValueError(f"unknown corner_mode {stencil.corner_mode!r}")

    interior = jnp.stack(
        [val_c, val_l, val_r, val_d, val_u, val_dl, val_dr, val_ul, val_ur]
    )  # (9, ny-2, nx-2)

    coeffs = jnp.zeros((9, ny, nx), dtype=jnp.complex64)
    coeffs = coeffs.at[:, 1:-1, 1:-1].set(interior)
    # Dirichlet boundary rows: scaled identity.
    if dirichlet_value is None:
        dirichlet_value = dirichlet_scale(grid)
    border = boundary_mask(grid).astype(jnp.complex64) * dirichlet_value
    coeffs = coeffs.at[0].add(border)
    return coeffs


def constant_stencil_symbol_parts(b, d, e, h: float, g: float,
                                  nfy: int, nfx: int):
    """Real decomposition of the constant-coefficient stencil symbol.

    The symbol is affine in the (complex) reference wavenumber-squared:
    ``symbol(k2) = S0 + k2 * S1`` with S0, S1 real (b, d, e are real in
    practice — the dispersion fit returns real parameters). Returns
    (S0, S1) as (nfy, nfx) float32 arrays; shared by the native and
    split-complex preconditioner symbols.
    """
    g2 = g * g
    h2 = h * h
    # k2-independent parts of (c0, lr, ud, corner)
    c0_a = -b * (2 + 2 / g2) / h2
    lr_a = (b - (1 - b) / g2) / h2
    ud_a = (b / g2 - (1 - b)) / h2
    co_a = ((1 - b) / 2) * (1 + 1 / g2) / h2
    # coefficients of k2
    c0_k = 1 - d - e
    lr_k = d / 4
    ud_k = d / 4
    co_k = e / 4

    ty = 2 * jnp.pi * jnp.fft.fftfreq(nfy).astype(jnp.float32)
    tx = 2 * jnp.pi * jnp.fft.fftfreq(nfx).astype(jnp.float32)
    cy = jnp.cos(ty)[:, None]
    cx = jnp.cos(tx)[None, :]

    def combine(c0, lr, ud, co):
        return (c0 + 2 * lr * cx + 2 * ud * cy + 4 * co * cx * cy).astype(
            jnp.float32)

    return combine(c0_a, lr_a, ud_a, co_a), combine(c0_k, lr_k, ud_k, co_k)


def constant_stencil_symbol(k2_ref, b, d, e, h: float, g: float,
                            nfy: int, nfx: int):
    """Fourier symbol of the constant-coefficient 9-point stencil.

    With A = B = C = 1 and constant (complex) k^2 = ``k2_ref``, the stencil is
    diagonalized by the DFT on an (nfy, nfx) periodic grid. Used by the
    shifted-Laplacian preconditioner (:mod:`.preconditioner`).

    Returns: (nfy, nfx) complex64 eigenvalue array.
    """
    s0, s1 = constant_stencil_symbol_parts(jnp.real(b), jnp.real(d),
                                           jnp.real(e), h, g, nfy, nfx)
    return (s0 + k2_ref * s1).astype(jnp.complex64)
