"""Host transfer helpers.

Some TPU runtimes (including the one this framework targets) implement
complex64 math on device but not complex64 device->host buffer transfers.
``fetch`` works around this by splitting complex arrays into (real, imag)
float32 planes inside a jitted function and reassembling on the host; real
arrays pass straight through. Use it anywhere a complex field leaves the
device (plots, golden-file dumps, checkpoints).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ComplexParts(NamedTuple):
    """A complex array carried as (real, imag) float planes.

    Jitted entry points that must hand complex fields back to the host
    return this instead of complex64: on the targeted TPU runtime a program
    with any complex64 *output* leaves ALL its outputs unfetchable (and a
    failed fetch can wedge the device relay), so complex data crosses the
    jit boundary split.
    """

    real: jnp.ndarray
    imag: jnp.ndarray

    @classmethod
    def of(cls, z) -> "ComplexParts":
        return cls(jnp.real(z), jnp.imag(z))

    def combined(self):
        """Recombine on device (or host for numpy inputs)."""
        return self.real + 1j * self.imag

    @property
    def shape(self):
        return self.real.shape


@jax.jit
def _split_complex(x):
    return jnp.real(x), jnp.imag(x)


def as_numpy_complex(x) -> np.ndarray:
    """Fetch any of {ComplexParts, Cpx, complex array, real array} to
    numpy."""
    if isinstance(x, ComplexParts):
        return (np.asarray(jax.device_get(x.real))
                + 1j * np.asarray(jax.device_get(x.imag)))
    from ..ops.cpx import Cpx
    if isinstance(x, Cpx):
        return (np.asarray(jax.device_get(x.re))
                + 1j * np.asarray(jax.device_get(x.im)))
    return fetch(x)


def fetch(x) -> np.ndarray:
    """Device -> numpy, safe for complex dtypes on all backends."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        re, im = _split_complex(x)
        return np.asarray(jax.device_get(re)) + 1j * np.asarray(jax.device_get(im))
    return np.asarray(jax.device_get(x))


def fetch_tree(tree):
    """``fetch`` mapped over a pytree."""
    return jax.tree_util.tree_map(fetch, tree)
