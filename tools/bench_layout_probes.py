#!/usr/bin/env python
"""On-chip A/B for the two layout levers (chain-method sustained timing):

1. channel padding: RLFN (4) with 46/48-wide convs zero-padded to 64 lanes
   (porter/pad.pad_rlfn) vs stock — the direct test of the layout-bound
   hypothesis from the int8 probe (docs/RUNTIME_TPU.md).
2. grouped-conv densify: IMDTN (9) / LWFANet (27) with grouped convs
   lowered as block-diagonal dense (config.densify_grouped) vs stock.

Writes rows into --out JSON. Usage:
  python tools/bench_layout_probes.py [--out F] [--mode high] [--reps 8]
         [--iters 3] [--batch 32] [--probe pad|dense9|dense27] ...
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


def measure_chain(apply, params, batch, size, data_range, reps, iters):
    """ms/img via the canonical chain-method timer (harness.profiling)."""
    import jax
    import jax.numpy as jnp

    from ntire2022_esr_tpu.harness.profiling import chain_timer

    params = jax.device_put(params)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32) * data_range)
    return chain_timer(apply, params, x, reps, iters) * 1e3 / reps / batch


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/layout_probes.json")
    ap.add_argument("--mode", default="high")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--probe", action="append", default=None,
                    choices=["pad", "dense9", "dense27", "fuse33", "fuse27",
                             "padheads20", "branch0", "branch2", "branch27",
                             "attn20", "attn9", "attn12",
                             "tail33", "tail27", "tail28", "tail20"])
    ap.add_argument("--tail-tiers", action="append", default=None,
                    choices=["bf16", "f16"],
                    help="restrict tail probes to these tiers (stock always runs)")
    ap.add_argument("--attn-variants", action="append", default=None,
                    choices=["off", "probs", "scores", "scores_f16"],
                    help="restrict attn probes to these variants")
    args = ap.parse_args(argv)
    probes = args.probe or ["pad", "dense9", "dense27"]

    from ntire2022_esr_tpu import config
    from ntire2022_esr_tpu.harness import registry
    from ntire2022_esr_tpu.harness.profiling import require_device

    require_device()
    config.set_mode(args.mode)
    results = {}
    if os.path.exists(args.out):
        results = json.load(open(args.out))

    if "pad" in probes:
        from ntire2022_esr_tpu.porter.pad import pad_rlfn

        apply, params, name, dr, _ = registry.build_model(4)
        stock = measure_chain(apply, params, args.batch, args.size, dr,
                              args.reps, args.iters)
        padded = measure_chain(apply, pad_rlfn(params, 64), args.batch,
                               args.size, dr, args.reps, args.iters)
        results["pad_rlfn_64"] = {"stock_ms": stock, "padded_ms": padded,
                                  "batch": args.batch, "mode": args.mode}
        print(f"RLFN pad-to-64: stock {stock:.3f} vs padded {padded:.3f} ms/img",
              flush=True)
        json.dump(results, open(args.out, "w"), indent=1)

    for key, mid in (("dense9", 9), ("dense27", 27)):
        if key not in probes:
            continue
        # stock arm must bypass any load-time densify the zoo ships by
        # default (IMDTN registers _densify_imdtn as load_transform —
        # without this both arms would measure the identical dense graph)
        apply, params, name, dr, _ = registry.build_model(
            mid, apply_load_transform=False)
        config.set_densify_grouped(False)
        stock = measure_chain(apply, params, args.batch, args.size, dr,
                              args.reps, args.iters)
        config.set_densify_grouped(True)
        try:
            dense = measure_chain(apply, params, args.batch, args.size, dr,
                                  args.reps, args.iters)
        finally:
            config.set_densify_grouped(False)
        results[f"densify_{name}"] = {"stock_ms": stock, "dense_ms": dense,
                                      "batch": args.batch, "mode": args.mode}
        print(f"{name} densify: stock {stock:.3f} vs dense {dense:.3f} ms/img",
              flush=True)
        json.dump(results, open(args.out, "w"), indent=1)

    if "padheads20" in probes:
        from ntire2022_esr_tpu.porter.pad import pad_mobilesr_heads

        apply, params, name, dr, _ = registry.build_model(20)
        stock = measure_chain(apply, params, args.batch, args.size, dr,
                              args.reps, args.iters)
        padded = measure_chain(apply, pad_mobilesr_heads(params), args.batch,
                               args.size, dr, args.reps, args.iters)
        results["padheads_20_MobileSR"] = {"stock_ms": stock, "padded_ms": padded,
                                           "batch": args.batch, "mode": args.mode}
        print(f"MobileSR head-pad 5->8: stock {stock:.3f} vs padded {padded:.3f} "
              "ms/img", flush=True)
        json.dump(results, open(args.out, "w"), indent=1)

    for key, mid in (("branch0", 0), ("branch2", 2), ("branch27", 27)):
        if key not in probes:
            continue
        apply, params, name, dr, _ = registry.build_model(mid)
        config.set_fuse_parallel_branches(False)
        stock = measure_chain(apply, params, args.batch, args.size, dr,
                              args.reps, args.iters)
        config.set_fuse_parallel_branches(True)
        try:
            fused = measure_chain(apply, params, args.batch, args.size, dr,
                                  args.reps, args.iters)
        finally:
            config.set_fuse_parallel_branches(None)
        results[f"branchfuse_{name}"] = {"stock_ms": stock, "fused_ms": fused,
                                         "batch": args.batch, "mode": args.mode}
        print(f"{name} branch-fuse: stock {stock:.3f} vs fused {fused:.3f} ms/img",
              flush=True)
        json.dump(results, open(args.out, "w"), indent=1)

    for key, mid in (("fuse33", 33), ("fuse27", 27)):
        if key not in probes:
            continue
        apply, params, name, dr, _ = registry.build_model(mid)
        config.set_fuse_upsample_conv(False)
        stock = measure_chain(apply, params, args.batch, args.size, dr,
                              args.reps, args.iters)
        config.set_fuse_upsample_conv(True)
        try:
            fused = measure_chain(apply, params, args.batch, args.size, dr,
                                  args.reps, args.iters)
        finally:
            config.set_fuse_upsample_conv(None)
        results[f"fuse_{name}"] = {"stock_ms": stock, "fused_ms": fused,
                                   "batch": args.batch, "mode": args.mode}
        print(f"{name} fused-upconv: stock {stock:.3f} vs fused {fused:.3f} ms/img",
              flush=True)
        json.dump(results, open(args.out, "w"), indent=1)


    for key, mid in (("tail33", 33), ("tail27", 27), ("tail28", 28),
                     ("tail20", 20)):
        if key not in probes:
            continue
        apply, params, name, dr, _ = registry.build_model(mid)
        row = {"batch": args.batch, "mode": args.mode}
        for tier, col in (("off", "stock_ms"), ("bf16", "tail_bf16_ms"),
                          ("f16", "tail_f16_ms")):
            if tier != "off" and args.tail_tiers and tier not in args.tail_tiers:
                continue
            config.set_hr_tail(tier)
            try:
                row[col] = measure_chain(apply, params, args.batch, args.size,
                                         dr, args.reps, args.iters)
            finally:
                config.set_hr_tail(None)
        results[f"hrtail_{name}"] = row
        print(f"{name} hr-tail: " + " / ".join(
            f"{k.replace('_ms', '')} {v:.3f}" for k, v in row.items()
            if k.endswith("_ms")) + " ms/img", flush=True)
        json.dump(results, open(args.out, "w"), indent=1)

    for key, mid in (("attn20", 20), ("attn9", 9), ("attn12", 12)):
        if key not in probes:
            continue
        apply, params, name, dr, _ = registry.build_model(mid)
        row = {"batch": args.batch, "mode": args.mode}
        for variant in ("off", "probs", "scores", "scores_f16"):
            if args.attn_variants and variant not in args.attn_variants:
                continue
            config.set_attn_bf16(variant)
            try:
                row[f"{variant}_ms"] = measure_chain(
                    apply, params, args.batch, args.size, dr, args.reps, args.iters)
            finally:
                config.set_attn_bf16(None)  # back to AUTO
        results[f"attnbf16_{name}"] = row
        print(f"{name} attn-storage: " + " / ".join(
            f"{k[:-3]} {v:.3f}" for k, v in row.items() if k.endswith("_ms"))
            + " ms/img", flush=True)
        json.dump(results, open(args.out, "w"), indent=1)


if __name__ == "__main__":
    main()
