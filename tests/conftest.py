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
# Persistent compilation cache: the suite is compile-dominated (the banded
# factorization scans take tens of seconds to compile); repeat runs reuse
# executables keyed by HLO hash (~2x faster reruns). The entries are local
# artifacts (gitignored). If a run is killed mid-write it can leave a
# truncated entry that SEGFAULTS jax on the next read — `rm -rf
# tests/.jax_cache` and rerun if the suite dies inside
# compilation_cache.get_executable_and_time.
_CACHE = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
