"""Profiling hooks: JAX profiler traces + simple kernel timers.

The reference's only profiling story is a pinned line-profiler with
commented-out @profile decorators (SURVEY §5); here tracing is first-class:
wrap any region in `trace(logdir)` and inspect with TensorBoard/XProf, or
use `time_fn` for steady-state kernel timing with compile exclusion.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/waveflow_tpu_trace"):
    """Capture a JAX profiler trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, iters: int = 20, warmup: int = 2):
    """Steady-state wall time per call (seconds), excluding compilation."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
