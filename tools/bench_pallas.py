#!/usr/bin/env python
"""On-chip benchmark: Pallas fusions vs XLA for the north-star kernels.

Measures (fenced, median of iters):
  chain  — 3x conv3x3+LeakyReLU+residual (the RLFB body) at RLFN widths:
           XLA vs fused_conv3x3_chain (9-dot) vs pack_dx (K>=128 im2col)
  tail   — conv3x3 (46->48) + PixelShuffle(4): XLA vs fused kernel

CAUTION (axon tunnel): Mosaic remote-compiles can take ~10 min per shape
and a failed compile can wedge the helper — run one variant at a time via
--only, nohup, never kill mid-compile. Validate interpret-mode first
(tests/test_pallas_kernels.py).

Usage: python tools/bench_pallas.py [--only chain_xla|chain_pallas|
       chain_packed|tail_xla|tail_pallas] [--batch 8] [--size 256]
       [--mode fast] [--iters 20] [--out FILE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--cin", type=int, default=48)
    ap.add_argument("--mode", default="fast")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=20,
                    help="in-graph repetitions per timed call; the tunnel's "
                         "dispatch+fence floor is ~26 ms, so per-call timing "
                         "of a ~5 ms kernel is meaningless without this")
    ap.add_argument("--tile", type=int, nargs=2, default=(32, 32))
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ntire2022_esr_tpu import config, ops
    from ntire2022_esr_tpu.harness.profiling import device_timer
    from ntire2022_esr_tpu.ops.pallas import fused_conv3x3_chain, fused_conv3x3_pixelshuffle

    config.set_mode(args.mode)
    rng = np.random.RandomState(0)
    n, s, c = args.batch, args.size, args.cin
    dt = np.float32
    x = jnp.asarray(rng.randn(n, s, s, c).astype(dt) * 0.5)
    ws = [jnp.asarray(rng.randn(3, 3, c, c).astype(dt) * 0.05) for _ in range(3)]
    bs = [jnp.asarray(rng.randn(c).astype(dt) * 0.1) for _ in range(3)]
    x3 = jnp.asarray(rng.randn(n, s, s, 46).astype(dt) * 0.5)
    wt = jnp.asarray(rng.randn(3, 3, 46, 48).astype(dt) * 0.05)
    bt = jnp.asarray(rng.randn(48).astype(dt) * 0.1)

    def chain_xla(a):
        h = a
        for wk, bk in zip(ws, bs):
            h = ops.leaky_relu(ops.conv2d(h, wk, bk), 0.05)
        return h + a

    def tail_xla(a):
        return ops.pixel_shuffle(ops.conv2d(a, wt, bt), 4)

    tile = tuple(args.tile)

    def chain_rep(op):
        # shape-preserving op: chain serially (each iter consumes the last
        # — no CSE, dispatch floor amortised over reps)
        def f(a):
            return jax.lax.fori_loop(0, args.reps, lambda i, h: op(h) * 0.5, a)
        return f

    def tail_rep(op):
        # shape-changing op: vary the input per iter and reduce the outputs
        # to one scalar so neither CSE nor DCE can elide iterations
        def f(a):
            def body(i, acc):
                y = op(a * (1.0 + 1e-6 * i.astype(a.dtype)))
                return acc + jnp.sum(y[0, 0, :2, :])
            return jax.lax.fori_loop(0, args.reps, body, jnp.zeros((), a.dtype))
        return f

    chain_var = lambda **kw: (lambda a: fused_conv3x3_chain(
        a, ws, bs, slope=0.05, residual=True, tile=tile, **kw))
    tail_var = lambda a: fused_conv3x3_pixelshuffle(a, wt, bt, r=4, tile=tile)
    variants = {
        "chain_xla": (chain_rep(chain_xla), (x,)),
        "chain_pallas": (chain_rep(chain_var()), (x,)),
        "chain_packed": (chain_rep(chain_var(pack_dx=True)), (x,)),
        "tail_xla": (tail_rep(tail_xla), (x3,)),
        "tail_pallas": (tail_rep(tail_var), (x3,)),
    }

    results = {}
    if args.out and os.path.exists(args.out):
        results = json.load(open(args.out))
    for name, (fn, fargs) in variants.items():
        if args.only and name != args.only:
            continue
        med, times = device_timer(jax.jit(fn), *fargs, iters=args.iters, warmup=2)
        key = f"{name}@{args.mode}/b{n}s{s}c{c}/t{tile[0]}x{tile[1]}/r{args.reps}"
        results[key] = {"median_ms_per_rep": med * 1e3 / args.reps,
                        "min_ms_per_rep": min(times) * 1e3 / args.reps,
                        "reps": args.reps}
        print(f"{key}: median {med*1e3/args.reps:.3f} ms/rep  "
              f"min {min(times)*1e3/args.reps:.3f} ms/rep", flush=True)
    if args.out:
        json.dump(results, open(args.out, "w"), indent=1)


if __name__ == "__main__":
    main()
