"""Tracing / profiling (SURVEY §5 aux subsystem).

The reference times forwards with CUDA event pairs (test_demo.py:413-433)
and measures FLOPs by hook execution. TPU-native equivalents:

- ``device_timer``: wall-clock a jitted callable with a device fence.
  ``block_until_ready`` does not synchronize some tunnelled backends, so
  the fence is a 1-element device->host read of the result.
- ``trace``: context manager around ``jax.profiler`` emitting an xplane
  trace directory viewable in TensorBoard/xprof.
- ``compiled_stats``: per-model XLA cost analysis (see harness.summary for
  the structural StableHLO counter).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Sequence, Tuple

import jax
import numpy as np


def fence(out) -> None:
    """Force completion of device work producing ``out`` (tiny D2H read)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    if getattr(leaf, "ndim", 0):
        leaf = leaf[(0,) * leaf.ndim]  # 1-element view, no device-side copy
    np.asarray(jax.device_get(leaf))


def device_timer(fn: Callable, *args, iters: int = 10, warmup: int = 1) -> Tuple[float, Sequence[float]]:
    """Median + all per-call wall times (seconds) of ``fn(*args)``."""
    for _ in range(warmup):
        fence(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fence(fn(*args))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2], times


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (xprof/TensorBoard viewable)."""
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False  # some backends do not support profiling
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
