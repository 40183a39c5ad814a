"""Production serving pipeline: bounded-depth pipelined SR inference.

The reference is a scoring harness (one image at a time, host-driven,
test_demo.py:416-437); this module is the TPU-first deployment shape of
the same models: a persistent server that accepts uint8 frames, batches
them per LR shape, keeps the device queue primed with a bounded number of
in-flight batches, and returns uint8 SR frames.

Design (measured on the tunnelled v5e, docs/RUNTIME_TPU.md):
- **uint8 device boundary** — uint2nhwc / nhwc2uint semantics run
  in-graph (exact tensor2uint rounding); H2D and D2H shrink 4x and the
  smaller output buffers keep XLA out of its memory-conserving schedule
  at large batches.
- **Bounded in-flight depth** — dispatch is async; the server keeps at
  most ``depth`` batches in flight (holding every output live OOMs HBM at
  production batch sizes; depth 2 already hides host dispatch latency).
- **Shape bucketing** — one compiled executable per distinct LR shape
  (XLA requires static shapes); frames of the same shape batch together
  up to ``max_batch``.
"""

from __future__ import annotations

import collections
import threading
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ntire2022_esr_tpu.harness import registry


class SRServer:
    """Synchronous bounded-pipeline SR server over one zoo model.

    >>> srv = SRServer(model_id=4)               # doctest: +SKIP
    >>> sr = srv.process_one(lr_u8)              # doctest: +SKIP
    >>> for sr in srv.process_stream(frames): ...  # doctest: +SKIP
    """

    def __init__(self, model_id: int = 4, *, max_batch: int = 32, depth: int = 2,
                 apply: Optional[Callable] = None, params=None,
                 data_range: Optional[float] = None, mesh=None,
                 stage_split: "bool | int" = False):
        if apply is None:
            apply, params, name, data_range, tile = registry.build_model(model_id)
            if tile is not None:
                raise ValueError(
                    f"model {model_id} requires tiled inference; serve it via "
                    "harness.tiling.tiled_apply, not the batch server")
        elif data_range is None:
            raise ValueError("data_range is required with a user-supplied apply")
        self._params = jax.device_put(params)
        self._dr = float(data_range)
        self._max_batch = int(max_batch)
        self._depth = max(1, int(depth))
        self._mesh = mesh
        dr = self._dr

        def u8_in(u8):
            return u8.astype(jnp.float32) / (255.0 / dr)

        def u8_out(y):
            y = jnp.clip(y, 0, dr) * (255.0 / dr)
            return jnp.round(y).astype(jnp.uint8)

        def serve(p, u8):
            return u8_out(apply(p, u8_in(u8)))

        self._split = None
        if stage_split:
            # stage-split dispatch (harness/stagesplit.py): body at the full
            # batch + the x4 tail over chunks, two executables — lifts the
            # compile bytes-ceiling so big-tail models serve at their
            # utilization-efficient batch (NASNetBN: 8 -> 128)
            from ntire2022_esr_tpu.harness import stagesplit

            if mesh is not None:
                raise ValueError("stage_split does not compose with mesh "
                                 "serving (shard the batch OR split stages)")
            sp = stagesplit.get_split(model_id)
            if sp is None:
                raise ValueError(
                    f"model {model_id} has no registered stage split "
                    f"(available: {stagesplit.split_ids()})")
            chunk = (int(stage_split) if stage_split is not True
                     else stagesplit.SHIPPED.get(model_id, (0, 8))[1])

            def body_serve(p, u8):
                return sp.body(p, u8_in(u8))

            def tail_serve(p, h, u8, c):
                hs = jax.tree_util.tree_map(
                    lambda a: jax.lax.dynamic_slice_in_dim(a, c * chunk, chunk, 0), h)
                xs = jax.lax.dynamic_slice_in_dim(u8, c * chunk, chunk, 0)
                return u8_out(sp.tail(p, hs, u8_in(xs)))

            self._split = (jax.jit(body_serve), jax.jit(tail_serve), chunk)

        if mesh is not None:
            # data-parallel over ICI: params replicated, batch sharded
            from ntire2022_esr_tpu.parallel import sharded_batch_apply

            if self._max_batch % mesh.devices.size:
                raise ValueError(
                    f"max_batch {self._max_batch} must be a multiple of the "
                    f"mesh size {mesh.devices.size}")
            self._jitted = sharded_batch_apply(serve, mesh)
        else:
            self._jitted = jax.jit(serve)
        self._lock = threading.Lock()

    def warmup(self, hw: Tuple[int, int], batch: Optional[int] = None) -> None:
        """Pre-compile for an LR shape (first compile is seconds-minutes)."""
        b = batch or self._max_batch
        if self._mesh is not None and b % self._mesh.devices.size:
            raise ValueError(
                f"warmup batch {b} must be a multiple of the mesh size "
                f"{self._mesh.devices.size} (sharded batches are padded to "
                "the mesh at submit time; warm the padded size)")
        u = jnp.zeros((b, hw[0], hw[1], 3), jnp.uint8)
        if self._split is not None:
            body_j, tail_j, chunk = self._split
            pad = (-b) % chunk
            if pad:
                u = jnp.concatenate([u, jnp.zeros((pad,) + u.shape[1:], u.dtype)])
            h = body_j(self._params, u)
            np.asarray(tail_j(self._params, h, u, jnp.int32(0))[0, 0, 0, 0])
        else:
            np.asarray(self._jitted(self._params, u)[0, 0, 0, 0])

    def _submit(self, frames: List[np.ndarray]):
        batch = np.stack(frames)
        if self._mesh is not None:
            # a sharded batch must be divisible by the mesh; pad with zeros
            # (outputs are sliced back to the real count by the caller)
            pad = (-len(frames)) % self._mesh.devices.size
            if pad:
                batch = np.concatenate(
                    [batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)])
        if self._split is not None:
            body_j, tail_j, chunk = self._split
            pad = (-len(frames)) % chunk
            if pad:
                batch = np.concatenate(
                    [batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)])
            # the lock serialises dispatch only — it must never be held
            # across a yield (a suspended generator would deadlock callers)
            with self._lock:
                u = jnp.asarray(batch)
                h = body_j(self._params, u)
                return [tail_j(self._params, h, u, jnp.int32(c))
                        for c in range(batch.shape[0] // chunk)]
        with self._lock:
            return self._jitted(self._params, jnp.asarray(batch))

    def process_one(self, lr_u8: np.ndarray) -> np.ndarray:
        """uint8 HWC in -> uint8 (4H, 4W, C) out."""
        out = self._submit([lr_u8])
        if isinstance(out, list):  # stage-split: first chunk holds frame 0
            out = out[0]
        return np.asarray(out)[0]

    def process_stream(self, frames: Iterable[np.ndarray],
                       batch: Optional[int] = None) -> Iterator[np.ndarray]:
        """Stream uint8 frames through the device, preserving order.

        Frames are grouped into consecutive same-shape batches (a shape
        change flushes the open batch — order preservation is a stronger
        contract than global bucketing). At most ``depth`` batches are in
        flight; results are yielded as host uint8 arrays. Safe to interleave
        with other calls on the same server (dispatch is locked per batch;
        nothing is held across yields).
        """
        max_b = batch or self._max_batch
        inflight: "collections.deque" = collections.deque()
        pending: List[np.ndarray] = []
        pend_shape: Optional[Tuple[int, ...]] = None

        def flush():
            nonlocal pending, pend_shape
            if pending:
                inflight.append((self._submit(pending), len(pending)))
                pending, pend_shape = [], None

        def drain_one():
            out, n = inflight.popleft()
            if isinstance(out, list):  # stage-split: per-chunk outputs
                arr = np.concatenate([np.asarray(o) for o in out])
            else:
                arr = np.asarray(out)
            for k in range(n):
                yield arr[k]

        for f in frames:
            if pend_shape is not None and (f.shape != pend_shape or len(pending) >= max_b):
                flush()
            if not pending:
                pend_shape = f.shape
            pending.append(f)
            if len(pending) >= max_b:
                flush()
            while len(inflight) >= self._depth:
                yield from drain_one()
        flush()
        while inflight:
            yield from drain_one()


def bucketed_throughput(server: SRServer, frames: List[np.ndarray],
                        batch: Optional[int] = None) -> Dict[str, float]:
    """Measure sustained images/sec of ``process_stream`` over ``frames``."""
    import time

    t0 = time.perf_counter()
    n = 0
    for _ in server.process_stream(frames, batch=batch):
        n += 1
    dt = time.perf_counter() - t0
    return {"images": n, "seconds": dt, "images_per_sec": n / dt}
