"""Stage-split dispatch: body-at-large-batch + chunked x4 tail.

The remote compile helper's executable-size ceiling tracks PER-EXECUTABLE
live buffer bytes (docs/RUNTIME_TPU.md, chunked-batch probe), and for the
sub-8x f32 models those bytes are dominated by the x4-resolution tail.
Splitting one forward into TWO executables —

  body:  the LR-domain trunk at a LARGE batch (its live bytes are ~16x
         smaller per image than the tail's, so batch 64-128 compiles where
         the full model 500s at 8-16)
  tail:  the x4 upsampler over CHUNKS of the body output, dispatched
         back-to-back (HBM-bound, so chunk-level dispatch costs little;
         the device queue pipelines body and tail dispatches alike)

— keeps the active mode's numerics (identical math; only the XLA fusion
boundary moves) while the compute-heavy body runs at a utilization-
efficient batch. Each split model exposes ``body(params, x)`` and
``tail(params, h, x_lr)`` in its own module with ``apply`` composing them,
so split-vs-whole exactness holds by construction (regression-tested in
tests/test_stagesplit.py).

On-chip verdicts (tools/bench_stage_split.py; artifacts
results/protocol/stage_split_r3*.json + _r4*.json, ledger
docs/RUNTIME_TPU.md): LWFANet 42.89 -> **19.96** ms/img (body 128 /
chunk 8, confirmed at reps 16) and NASNetBN 17.75 -> **13.86** (body 128
/ chunk 8) WIN and ship in ``SHIPPED``. The post-split ceiling is real
HBM, not the compile helper: body batches 192-256 OOM at compile (21.5-
27.6 G vs 15.75 G). m_RFDN (36.7 vs 28.2 at 64/8; 96+ OOM), MobileSR
(29.4 vs 27.3) and IMDTN (31.5 vs 30.6) measured SLOWER at every
feasible point, and SCET's dual-path body output (two 64-lane LR maps
per image) OOMs the chunked-tail schedule at its batch-64 operating
point — their splits stay available for A/B but are not scheduled.

Reference anchor: the reference runs strictly batch-1 single-executable
inference (test_demo.py:364-391); this scheduling layer has no analogue
there and exists because the TPU backend's compile ceiling, not HBM, caps
the profitable batch.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class Split(NamedTuple):
    body: Callable          # body(params, x_lr) -> h (any pytree, batch-major)
    tail: Callable          # tail(params, h, x_lr) -> y


def _splits() -> Dict[int, Split]:
    # deferred imports: model modules are light, but keep registry-style
    # laziness so importing harness.stagesplit never pulls the whole zoo
    from ntire2022_esr_tpu.models.imdtn import imdtn_body, imdtn_tail
    from ntire2022_esr_tpu.models.m_rfdn import m_rfdn_body, m_rfdn_tail
    from ntire2022_esr_tpu.models.misc_conv import lwfanet_body, lwfanet_tail
    from ntire2022_esr_tpu.models.mobilesr import mobilesr_body, mobilesr_tail
    from ntire2022_esr_tpu.models.nasnetbn import nasnetbn_body, nasnetbn_tail
    from ntire2022_esr_tpu.models.scet import scet_body, scet_tail

    return {
        9: Split(imdtn_body, imdtn_tail),
        20: Split(mobilesr_body, mobilesr_tail),
        27: Split(lwfanet_body, lwfanet_tail),
        28: Split(nasnetbn_body, nasnetbn_tail),
        30: Split(scet_body, scet_tail),
        33: Split(m_rfdn_body, m_rfdn_tail),
    }


def get_split(model_id: int) -> Optional[Split]:
    """The (body, tail) pair for a split-capable model, else None."""
    return _splits().get(model_id)


def split_ids():
    return sorted(_splits())


# Shipped schedule: model_id -> (body_batch, tail_chunk) for the sites the
# on-chip A/B measured FASTER than the best whole-forward dispatch (module
# docstring). The sustained sweep (tools/sweep_zoo_sustained.py --method
# split) and serving read this table.
SHIPPED: Dict[int, Tuple[int, int]] = {
    27: (128, 8),  # LWFANet  42.89 -> 19.96 ms/img (2.15x)
    28: (128, 8),  # NASNetBN 17.75 -> 13.86 ms/img (1.28x)
}


def _slice_chunk(tree, start: int, size: int):
    return jax.tree_util.tree_map(
        lambda a: jax.lax.dynamic_slice_in_dim(a, start, size, 0), tree)


def split_apply(model_id: int, chunk: int,
                split: Optional[Split] = None) -> Callable:
    """A host-level ``(params, x) -> y`` that runs body once and the tail
    over ``chunk``-sized slices as separate executables, concatenating the
    chunk outputs on host-visible device arrays. The batch must be a
    multiple of ``chunk``. Output is identical math to ``apply`` (the
    executable boundary only moves XLA fusion seams)."""
    sp = split or get_split(model_id)
    if sp is None:
        raise KeyError(f"model {model_id} has no registered stage split "
                       f"(available: {split_ids()})")

    body_j = jax.jit(sp.body)

    def tail_chunk(p, h, x, c):
        return sp.tail(p, _slice_chunk(h, c * chunk, chunk),
                       jax.lax.dynamic_slice_in_dim(x, c * chunk, chunk, 0))

    tail_j = jax.jit(tail_chunk)

    def run(params, x):
        n = x.shape[0]
        if n % chunk:
            raise ValueError(f"batch {n} not a multiple of tail chunk {chunk}")
        h = body_j(params, x)
        outs = [tail_j(params, h, x, jnp.int32(c)) for c in range(n // chunk)]
        return jnp.concatenate(outs, axis=0)

    return run


def split_chain_timer(body: Callable, tail: Callable, params, x,
                      chunk: int, reps: int = 8, iters: int = 3) -> float:
    """Chain-method sustained timing of the split schedule — the exact
    split analogue of harness.profiling.chain_timer (same input variation,
    same per-dispatch full-output reduce, same single fence per chain), so
    split and whole-forward numbers stay methodology-comparable. Returns
    median SECONDS per chain (reps x (1 body + n_chunks tails))."""
    from ntire2022_esr_tpu.harness.profiling import fence

    n = x.shape[0]
    if n % chunk:
        raise ValueError(f"batch {n} not a multiple of tail chunk {chunk}")
    n_chunks = n // chunk

    body_j = jax.jit(lambda p, a, i: body(p, a * (1.0 + 1e-6 * i)))

    def tail_step(p, h, a, c):
        return jnp.sum(tail(p, _slice_chunk(h, c * chunk, chunk),
                            jax.lax.dynamic_slice_in_dim(a, c * chunk, chunk, 0)))

    tail_j = jax.jit(tail_step)

    h0 = body_j(params, x, jnp.float32(0.0))
    fence(tail_j(params, h0, x, jnp.int32(0)))  # compile + warm both
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        acc = None
        for r in range(reps):
            h = body_j(params, x, jnp.float32(r))
            for c in range(n_chunks):
                acc = tail_j(params, h, x, jnp.int32(c))
        fence(acc)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]
