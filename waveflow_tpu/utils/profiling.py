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


def enable_persistent_compilation_cache(
        cache_dir: str = "~/.cache/waveflow_tpu/xla",
        min_compile_secs: float = 1.0) -> str:
    """Turn on JAX's on-disk executable cache so recompiles of the fused VMC
    window (minutes on a remote TPU the first time) are disk hits across
    processes — restarts, multi-seed studies, and evaluation scripts start
    in seconds.  Verified to work through the axon remote backend.  Returns
    the resolved cache directory."""
    import os
    path = os.path.expanduser(cache_dir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
