"""Stage-pipelined inference across devices (the "pp" axis).

The stage-split seams (harness/stagesplit.py: LR body | x4 tail) map onto
a two-stage device pipeline: the body runs on one device, the tail on
another, the intermediate activation crossing ICI once per batch. All
dispatches are asynchronous, so in steady state the two stages overlap
and throughput is set by the SLOWER stage, not the sum — the pp analogue
of the single-chip stage-split schedule (which interleaves the two
executables on one device instead).

When this pays: the split models' body and tail are comparable in time
(both HBM-bound), so two chips in pipeline approach 2x one chip's
stage-split throughput with NO batch-axis constraint — unlike dp, the
per-device batch stays the full batch, so the compile bytes-ceiling and
HBM footprint per device are those of ONE stage, not the whole model
(the body's ceiling is what stage-split already exploits on one chip).

The reference has no analogue (strictly single-GPU, SURVEY §2.3); this is
TPU-native deployment shape. Validated for exactness on the virtual CPU
mesh (tests/test_parallel.py) and compile-checked by dryrun_multichip;
real-ICI timing needs >1 physical chip (not available in this
environment — see docs/RUNTIME_TPU.md).
"""

from __future__ import annotations

import collections
from typing import Callable, Iterable, Iterator, List, Optional, Sequence

import jax
import numpy as np


class PipelinedSR:
    """Two-stage (body | tail) pipelined SR over two devices.

    >>> pipe = PipelinedSR(model_id=28)           # doctest: +SKIP
    >>> for sr in pipe.process_stream(batches): ...  # doctest: +SKIP

    Frames are float NHWC batches at the model's data_range (the uint8
    boundary composes via harness.serving semantics if needed). ``depth``
    bounds in-flight batches per stage.
    """

    def __init__(self, model_id: int, devices: Optional[Sequence] = None,
                 depth: int = 2, params=None):
        from ntire2022_esr_tpu.harness import registry, stagesplit

        split = stagesplit.get_split(model_id)
        if split is None:
            raise KeyError(f"model {model_id} has no stage split "
                           f"(available: {stagesplit.split_ids()})")
        devs = list(devices) if devices is not None else jax.devices()[:2]
        if len(devs) != 2:
            raise ValueError(f"pipeline needs exactly 2 devices, got {len(devs)}")
        self._d0, self._d1 = devs
        if params is None:
            _, params, *_ = registry.build_model(model_id)
        # each stage holds the params it reads on its own device; the full
        # tree is small (<= a few MB) so no per-stage pruning is needed
        self._params0 = jax.device_put(params, self._d0)
        self._params1 = jax.device_put(params, self._d1)
        self._body = jax.jit(split.body)
        self._tail = jax.jit(split.tail)
        self._depth = max(1, int(depth))

    def _submit(self, batch: np.ndarray):
        x0 = jax.device_put(np.asarray(batch), self._d0)
        h = self._body(self._params0, x0)           # stage 0 (async)
        h1 = jax.device_put(h, self._d1)             # ICI hop (async)
        x1 = jax.device_put(x0, self._d1)            # residual/crop input
        return self._tail(self._params1, h1, x1)     # stage 1 (async)

    def process_one(self, batch: np.ndarray) -> np.ndarray:
        return np.asarray(self._submit(batch))

    def process_stream(self, batches: Iterable[np.ndarray]) -> Iterator[np.ndarray]:
        """Pipeline a stream of same-shape batches; order-preserving.
        At most ``depth`` batches in flight keeps both stages busy without
        holding every x4 output live."""
        inflight: "collections.deque" = collections.deque()
        for batch in batches:
            inflight.append(self._submit(batch))
            while len(inflight) >= self._depth:
                yield np.asarray(inflight.popleft())
        while inflight:
            yield np.asarray(inflight.popleft())

    @property
    def devices(self):
        return (self._d0, self._d1)
