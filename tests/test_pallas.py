"""Pallas kernel correctness (interpreter mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from waveforminversionust_tpu import Grid2D, PMLConfig
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom
from waveforminversionust_tpu.ops.apply import h_apply
from waveforminversionust_tpu.ops.pallas_stencil import h_apply_pallas
from waveforminversionust_tpu.ops.stencil import helmholtz_coefficients

INTERPRET = jax.devices()[0].platform != "tpu"


def test_pallas_apply_matches_jnp(rng):
    grid = Grid2D.centered(12e-3, 0.8e-3)
    vel = smooth_blob_phantom(grid, radius=4e-3, dc=40)
    coeffs = helmholtz_coefficients(jnp.array(vel), grid, jnp.float32(350e3),
                                    PMLConfig(l_pml=2.4e-3))
    shape = (3,) + grid.shape
    u = jnp.array((rng.standard_normal(shape)
                   + 1j * rng.standard_normal(shape)).astype(np.complex64))
    ref = h_apply(coeffs, u)
    out = h_apply_pallas(coeffs, u, interpret=INTERPRET)
    assert float(jnp.abs(out - ref).max() / jnp.abs(ref).max()) < 1e-5


def test_pallas_apply_nonsquare(rng):
    grid = Grid2D(nx=20, ny=14, dx=0.8e-3, dy=0.8e-3, x0=-7.6e-3, y0=-5.2e-3)
    vel = np.full(grid.shape, 1500.0, np.float32)
    coeffs = helmholtz_coefficients(jnp.array(vel), grid, jnp.float32(350e3),
                                    PMLConfig(l_pml=2e-3))
    shape = (2,) + grid.shape
    u = jnp.array((rng.standard_normal(shape)
                   + 1j * rng.standard_normal(shape)).astype(np.complex64))
    ref = h_apply(coeffs, u)
    out = h_apply_pallas(coeffs, u, interpret=INTERPRET)
    assert float(jnp.abs(out - ref).max() / jnp.abs(ref).max()) < 1e-5
