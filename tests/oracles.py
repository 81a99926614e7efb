"""Independent slow-but-simple oracles used to validate the vectorized ops.

These re-derive the discretization from the published scheme (Chen, Cheng,
Feng & Wu 2013, "An optimal 9-point finite difference scheme for the
Helmholtz equation with PML") with explicit scalar loops, mirroring the
reference MATLAB semantics (reference: Functions/solveHelmholtz.m:41-139)
without sharing any code with the package under test.
"""

import numpy as np


def pml_fields_oracle(x, y, f, a0, l_pml, sign=-1):
    """Staggered A, B, C fields via direct evaluation (loop-free but naive)."""
    nx, ny = len(x), len(y)
    xe = np.linspace(x[0], x[-1], 2 * (nx - 1) + 1)
    ye = np.linspace(y[0], y[-1], 2 * (ny - 1) + 1)
    Xe, Ye = np.meshgrid(xe, ye)
    xctr, xspan = (x[0] + x[-1]) / 2, (x[-1] - x[0]) / 2
    yctr, yspan = (y[0] + y[-1]) / 2, (y[-1] - y[0]) / 2
    sx = 2 * np.pi * a0 * f * (np.maximum(np.abs(Xe - xctr) - xspan + l_pml, 0) / l_pml) ** 2
    sy = 2 * np.pi * a0 * f * (np.maximum(np.abs(Ye - yctr) - yspan + l_pml, 0) / l_pml) ** 2
    ex = 1 + 1j * sx * np.sign(sign) / (2 * np.pi * f)
    ey = 1 + 1j * sy * np.sign(sign) / (2 * np.pi * f)
    A = (ey / ex)[0::2, 1::2]
    B = (ex / ey)[1::2, 0::2]
    C = (ex * ey)[0::2, 0::2]
    return A, B, C


def stencil_params_oracle(vmin, vmax, f, h, g, fix_b=True, l=100, r=10):
    """Least-squares 9-point parameters, scalar numpy implementation."""
    gmin = vmin / (f * h)
    gmax = vmax / (f * h)
    m = np.arange(1, l + 1)
    n = np.arange(1, r + 1)
    theta = (m - 1) * np.pi / (4 * (l - 1))
    G = 1.0 / (1.0 / gmax + (n - 1) / (r - 1) * (1.0 / gmin - 1.0 / gmax))
    TH, GG = np.meshgrid(theta, G)
    P = np.cos(g * 2 * np.pi * np.cos(TH) / GG)
    Q = np.cos(2 * np.pi * np.sin(TH) / GG)
    S1 = (1 + 1 / g**2) * GG**2 * (1 - P - Q + P * Q)
    S2 = np.pi**2 * (2 - P - Q)
    S3 = 2 * np.pi**2 * (1 - P * Q)
    S4 = 2 * np.pi**2 + GG**2 * ((1 + 1 / g**2) * P * Q - P - Q / g**2)
    if fix_b:
        b = 5.0 / 6.0
        A = np.stack([S2.ravel(), S3.ravel()], axis=1)
        rhs = S4.ravel() - b * S1.ravel()
        d, e = np.linalg.lstsq(A, rhs, rcond=None)[0]
        return b, d, e
    A = np.stack([S1.ravel(), S2.ravel(), S3.ravel()], axis=1)
    b, d, e = np.linalg.lstsq(A, S4.ravel(), rcond=None)[0]
    return b, d, e


def dense_helmholtz_oracle(x, y, vel, f, a0, l_pml, dirichlet_value=1.0):
    """Dense Helmholtz matrix via explicit MATLAB-style double loop.

    1-based MATLAB indexing translated literally; row-major linear index
    j = y*nx + x to match the package convention. Follows
    solveHelmholtz.m:53-126 entry by entry (independently re-derived).
    """
    nx, ny = len(x), len(y)
    h = float(np.mean(np.diff(x)))
    g = float(np.mean(np.diff(y))) / h
    k = 2 * np.pi * f / np.asarray(vel, np.float64)
    A, B, C = pml_fields_oracle(x, y, f, a0, l_pml)
    b, d, e = stencil_params_oracle(vel.min(), vel.max(), f, h, g)

    H = np.zeros((nx * ny, nx * ny), np.complex128)
    lin = lambda xi, yi: yi * nx + xi
    g2, h2 = g * g, h * h
    for yi in range(ny):
        for xi in range(nx):
            row = lin(xi, yi)
            if xi in (0, nx - 1) or yi in (0, ny - 1):
                H[row, row] = dirichlet_value
                continue
            Ck2 = C * k**2
            # center
            H[row, lin(xi, yi)] = ((1 - d - e) * Ck2[yi, xi]
                                   - b * (A[yi, xi] + A[yi, xi - 1]
                                          + B[yi, xi] / g2 + B[yi - 1, xi] / g2) / h2)
            # left
            H[row, lin(xi - 1, yi)] = ((b * A[yi, xi - 1]
                                        - (1 - b) / 2 * (B[yi, xi - 1] + B[yi - 1, xi - 1]) / g2) / h2
                                       + d / 4 * Ck2[yi, xi - 1])
            # right
            H[row, lin(xi + 1, yi)] = ((b * A[yi, xi]
                                        - (1 - b) / 2 * (B[yi, xi + 1] + B[yi - 1, xi + 1]) / g2) / h2
                                       + d / 4 * Ck2[yi, xi + 1])
            # down (y-1)
            H[row, lin(xi, yi - 1)] = ((b * B[yi - 1, xi] / g2
                                        - (1 - b) / 2 * (A[yi - 1, xi] + A[yi - 1, xi - 1])) / h2
                                       + d / 4 * Ck2[yi - 1, xi])
            # up (y+1)
            H[row, lin(xi, yi + 1)] = ((b * B[yi, xi] / g2
                                        - (1 - b) / 2 * (A[yi + 1, xi] + A[yi + 1, xi - 1])) / h2
                                       + d / 4 * Ck2[yi + 1, xi])
            # down-left
            H[row, lin(xi - 1, yi - 1)] = ((1 - b) / 2 * (A[yi - 1, xi - 1] + B[yi - 1, xi - 1] / g2) / h2
                                           + e / 4 * Ck2[yi - 1, xi - 1])
            # down-right
            H[row, lin(xi + 1, yi - 1)] = ((1 - b) / 2 * (A[yi - 1, xi] + B[yi - 1, xi + 1] / g2) / h2
                                           + e / 4 * Ck2[yi - 1, xi + 1])
            # up-left
            H[row, lin(xi - 1, yi + 1)] = ((1 - b) / 2 * (A[yi + 1, xi - 1] + B[yi, xi - 1] / g2) / h2
                                           + e / 4 * Ck2[yi + 1, xi - 1])
            # up-right
            H[row, lin(xi + 1, yi + 1)] = ((1 - b) / 2 * (A[yi + 1, xi] + B[yi, xi + 1] / g2) / h2
                                           + e / 4 * Ck2[yi + 1, xi + 1])
    return H
