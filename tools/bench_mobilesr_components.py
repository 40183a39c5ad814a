#!/usr/bin/env python
"""MobileSR on-chip time attribution by component ablation (chain timing).

Splits the 31 ms/img sustained (batch 16, high) between the windowed
transformers (head_dim 5 — a lane-hostile minor dimension), the
inverted-residual conv blocks, and the fixed tail/residual. Measurement
only, not a correctness path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/mobilesr_components.json")
    ap.add_argument("--mode", default="high")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ntire2022_esr_tpu import config
    from ntire2022_esr_tpu.harness import registry
    from ntire2022_esr_tpu.harness.profiling import chain_timer
    from ntire2022_esr_tpu.models import mobilesr

    config.set_mode(args.mode)
    apply, params, name, dr, tile = registry.build_model(20)
    params = jax.device_put(params)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.batch, args.size, args.size, 3).astype(np.float32) * dr)

    def timed(tag):
        # lambda defers to the module attr so the tool's monkeypatched
        # components take effect at trace time; chain_timer jits a fresh
        # closure per call, so each ablation retraces
        sec = chain_timer(lambda p, a: mobilesr.mobilesr_apply(p, a),
                          params, x, args.reps, args.iters)
        ms = sec * 1e3 / args.reps / args.batch
        print(f"{tag}: {ms:.2f} ms/img", flush=True)
        return ms

    results = {}
    results["full"] = timed("full")

    real_sa, real_tf, real_rb = (mobilesr._self_attn, mobilesr._transformer,
                                 mobilesr._res_block)
    mobilesr._self_attn = lambda p, t, nh: t
    try:
        results["no_attn_core"] = timed("no_attn_core")
    finally:
        mobilesr._self_attn = real_sa

    mobilesr._transformer = lambda p, t, *a, **k: t
    try:
        results["no_transformer"] = timed("no_transformer")
    finally:
        mobilesr._transformer = real_tf

    mobilesr._res_block = lambda p, t, *a, **k: t
    try:
        results["no_resblocks"] = timed("no_resblocks")
    finally:
        mobilesr._res_block = real_rb

    results.update(mode=args.mode, size=args.size, batch=args.batch, reps=args.reps)
    json.dump(results, open(args.out, "w"), indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
