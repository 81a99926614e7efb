"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are tested on host CPU devices
(``--xla_force_host_platform_device_count``), per the reference test strategy
gap analysis (SURVEY.md section 4): the reference has no automated tests at
all; this suite is the framework's correctness contract.
"""

import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The persistent compilation cache is deliberately DISABLED for the suite:
# on this image (jax 0.9 / XLA:CPU AOT), deserializing certain large cached
# executables (the banded-factorization scans) SEGFAULTS inside
# backend.deserialize_executable — two full-suite runs died at the same
# compilation_cache.get_executable_and_time frame (2026-08-17), one of them
# reading an entry written moments earlier by the same process, and the
# cpu_aot_loader logs machine-feature mismatches ("+prefer-no-scatter …
# could lead to execution errors such as SIGILL") even on the machine that
# compiled the entry. Recompiling duplicates across test modules costs
# ~2x suite wall time; a suite that segfaults at 87% costs more.
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_DIR, "Lecture19_Fwi"))


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run slow-marked tests (full-workload reference "
                          "parity, large-grid inversions)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running validation (opt in with --runslow)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after every test module.

    A full-suite process accumulates thousands of XLA:CPU JIT'd
    executables in one LLVM ORC instance; on this image the compiler
    nondeterministically SEGFAULTS deep into the run (observed three
    times at tests ~100-170, always inside backend_compile_and_load;
    each crashing test passes standalone). Releasing the jit caches per
    module keeps the JIT footprint bounded — the cross-module recompiles
    this costs were mostly happening anyway (the persistent cache is
    disabled above for its own segfault, and modules rarely share traced
    signatures)."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
