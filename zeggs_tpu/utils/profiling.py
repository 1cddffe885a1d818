"""Profiling and timing harness.

The reference has no tracing/profiling at all (SURVEY.md §5) — only
wall-clock ETA bars. TPU-native equivalent: `jax.profiler` trace contexts
(viewable in TensorBoard/Perfetto/XProf) plus a `block_until_ready` timing
helper for microbenchmarks.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir, create_perfetto_link=False):
    """Capture a device trace for the enclosed block:

        with profiling.trace("/tmp/trace"):
            train_step(...)
    """
    jax.profiler.start_trace(str(logdir), create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region inside a trace (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)


def time_fn(fn, *args, iters=10, warmup=2, **kwargs):
    """Median/percentile wall times of a jitted fn with proper device sync.

    Returns dict(median_s, p10_s, p90_s, times).
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times)
    return {
        "median_s": float(np.median(arr)),
        "p10_s": float(np.percentile(arr, 10)),
        "p90_s": float(np.percentile(arr, 90)),
        "times": times,
    }


def device_memory_stats():
    """Per-device memory stats when the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
