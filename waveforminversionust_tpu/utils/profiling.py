"""Profiling and timing helpers.

The reference's timing is ad hoc ``tic/toc`` / ``time.time()`` spans — and
its published per-solve Helmholtz number is a trace-time artifact of timing
``pure_callback`` inside ``@jit`` (SURVEY.md section 5; the famous
"4.68e-05 s"). These helpers time *execution*, not tracing: every span
blocks on the computation before reading the clock, and :func:`trace` wraps
``jax.profiler`` for real XLA timelines.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, results: dict | None = None):
    """Wall-clock span that waits for async device work to finish."""
    t0 = time.perf_counter()
    yield
    # Block on everything the context launched.
    jax.effects_barrier()
    dt = time.perf_counter() - t0
    if results is not None:
        results[label] = dt
    else:
        print(f"[timed] {label}: {dt:.4f}s")


def benchmark(fn: Callable, *args, warmup: int = 1, iters: int = 3,
              **kwargs) -> dict:
    """Compile-then-measure benchmark of a jitted callable.

    Returns {'compile_s': first-call time, 'mean_s': steady-state mean,
    'min_s': best} with results blocked on (true run time, not dispatch).
    """
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(max(0, warmup - 1)):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return {"compile_s": compile_s, "mean_s": sum(times) / len(times),
            "min_s": min(times)}
