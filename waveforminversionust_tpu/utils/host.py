"""Host transfer helpers.

Some TPU runtimes (including the one this framework targets) implement
complex64 math on device but not complex64 device->host buffer transfers.
``fetch`` works around this by splitting complex arrays into (real, imag)
float32 planes inside a jitted function and reassembling on the host; real
arrays pass straight through. Use it anywhere a complex field leaves the
device (plots, golden-file dumps, checkpoints).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _split_complex(x):
    return jnp.real(x), jnp.imag(x)


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
