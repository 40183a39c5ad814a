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


def require_device(timeout_s: float = 180.0) -> None:
    """Fail fast when the backend is unreachable.

    The tunnelled axon backend hangs *indefinitely* in backend init while
    the device is down (observed: a 25-minute stall before UNAVAILABLE),
    which turns unattended measurement tools into silent zombies. A
    daemon-thread probe bounds the wait: raises RuntimeError if
    ``jax.devices()`` has not returned within ``timeout_s``. Instant on
    healthy backends (CPU included). Tune/disable with
    NTIRE_DEVICE_TIMEOUT (seconds; 0 disables)."""
    import os
    import threading

    env = os.environ.get("NTIRE_DEVICE_TIMEOUT")
    if env is not None:
        timeout_s = float(env)
    if timeout_s <= 0:
        return
    ok: list = []
    t = threading.Thread(target=lambda: ok.append(jax.devices()), daemon=True)
    t.start()
    t.join(timeout_s)
    if not ok:
        raise RuntimeError(
            f"device backend not ready within {timeout_s:.0f}s "
            "(axon tunnel down?) — set NTIRE_DEVICE_TIMEOUT to adjust")


def chain_timer(apply, params, x, reps: int = 8, iters: int = 3) -> float:
    """Chain-method sustained timing (docs/RUNTIME_TPU.md): ``reps`` async
    dispatches of a small forward+reduce executable back-to-back (the
    device queue pipelines them; validated 0.2% from an in-graph fori loop
    on-chip), fenced once, median over ``iters``. Returns median SECONDS
    per chain — callers divide by reps (and batch) for ms/img.

    The input is varied per rep (``* (1 + 1e-6*i)``) so no dispatch can be
    elided; a fresh jit cache is created per call, so monkeypatched model
    internals (component-ablation tools) retrace correctly. This is THE
    canonical implementation — the sustained sweep and every A/B probe
    tool time through it so their numbers stay methodology-comparable.
    ``params``/``x`` should already be on device (jax.device_put).
    """
    import jax.numpy as jnp

    def step(p, a, i):
        return jnp.sum(apply(p, a * (1.0 + 1e-6 * i)))

    jitted = jax.jit(step)
    fence(jitted(params, x, jnp.float32(0.0)))  # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        acc = None
        for r in range(reps):
            acc = jitted(params, x, jnp.float32(r))
        fence(acc)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


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
