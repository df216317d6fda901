"""Profiling hooks: jax.profiler traces + dispatch-accurate timing.

The reference has no tracing/profiling at all (SURVEY.md §5); these helpers
are the TPU-native replacements used by bench.py and ad-hoc investigations.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard-viewable device trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn: Callable, *args, reps: int = 3, warmup: int = 1, **kwargs):
    """Wall-clock a jitted callable with proper device synchronization.

    Returns (seconds_per_call, last_output).
    """
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps, out
