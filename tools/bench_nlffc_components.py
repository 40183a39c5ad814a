#!/usr/bin/env python
"""NLFFC on-chip time attribution by component ablation.

The MAC attributor says the spectral DFT matmuls dominate at the real tile
size (O(H^2) vs the convs' O(HW): ~60% of MACs at H=1024), but the model
could equally be HBM-bound on its 1M-pixel activations. Decisive and
cheap: time the full model and variants with spectral_tx / global-context
stubbed to identity, same chain methodology as the sustained sweep.
NOT a correctness path — measurement only.

Usage: python tools/bench_nlffc_components.py [--size 256] [--reps 8]
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
    ap.add_argument("--out", default="/tmp/nlffc_components.json")
    ap.add_argument("--mode", default="high")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ntire2022_esr_tpu import config
    from ntire2022_esr_tpu.harness import registry
    from ntire2022_esr_tpu.harness.profiling import chain_timer
    from ntire2022_esr_tpu.models import nlffc

    config.set_mode(args.mode)
    apply, params, name, dr, tile = registry.build_model(2)
    params = jax.device_put(params)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, args.size, args.size, 3).astype(np.float32) * dr)

    def timed(tag, fn):
        # chain_timer jits a fresh closure per call, so monkeypatched
        # nlffc components retrace correctly (canonical chain timing,
        # harness.profiling)
        ms = chain_timer(fn, params, x, args.reps, args.iters) * 1e3 / args.reps
        print(f"{tag}: {ms:.1f} ms", flush=True)
        return ms

    results = {}
    results["full"] = timed("full", nlffc.nlffc_apply)

    real_sp, real_gc = nlffc.spectral_tx, nlffc._global_context
    nlffc.spectral_tx = lambda p, x: x
    try:
        results["no_spectral"] = timed("no_spectral", nlffc.nlffc_apply)
    finally:
        nlffc.spectral_tx = real_sp

    nlffc._global_context = lambda p, x: x
    try:
        results["no_globalctx"] = timed("no_globalctx", nlffc.nlffc_apply)
    finally:
        nlffc._global_context = real_gc

    nlffc.spectral_tx = lambda p, x: x
    nlffc._global_context = lambda p, x: x
    try:
        results["convs_only"] = timed("convs_only", nlffc.nlffc_apply)
    finally:
        nlffc.spectral_tx, nlffc._global_context = real_sp, real_gc

    results.update(mode=args.mode, size=args.size, reps=args.reps)
    json.dump(results, open(args.out, "w"), indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
