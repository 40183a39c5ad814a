#!/usr/bin/env python
"""Run this framework at the full challenge protocol (reference run(), but
TPU-native) over a DIV2K-layout dataset, one model at a time, and record
per-image PSNR + fenced per-image runtimes.

Pairs with tools/run_reference_protocol.py (the torch CPU oracle on the
same pixels); tools/compare_protocol.py diffs the two artifacts to prove
the +-0.01 dB claim at true DIV2K shapes.

Usage:
  python tools/run_tpu_protocol.py --data_dir /tmp/div2k_surrogate \
      --out /tmp/tpu_protocol.json [--mode parity] [ids...]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ids", nargs="*", type=int, default=None)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--mode", default="parity")
    ap.add_argument("--save_dir", default="/tmp/tpu_protocol_sr")
    ap.add_argument("--ssim", action="store_true",
                    help="also score SSIM (reference test_demo.py:450-453)")
    args = ap.parse_args(argv)

    from ntire2022_esr_tpu import config
    from ntire2022_esr_tpu.harness import data as data_mod
    from ntire2022_esr_tpu.harness import registry, runner

    config.set_mode(args.mode)
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    logger = logging.getLogger("tpu_protocol")

    ids = args.ids or registry.available_ids()

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for model_id in ids:
        try:
            apply, params, name, data_range, tile = registry.build_model(model_id)
        except Exception as e:
            print(f"[{model_id}] SKIP ({e})", file=sys.stderr)
            continue
        if name in results:
            print(f"[{model_id}] {name}: cached", file=sys.stderr)
            continue
        pairs = [(l, h) for l, h in data_mod.select_dataset(args.data_dir, "valid")
                 if os.path.exists(l) and os.path.exists(h)]
        if not pairs:
            sys.exit(f"no DIV2K valid pairs under {args.data_dir}")
        ns = types.SimpleNamespace(save_dir=args.save_dir, ssim=args.ssim)
        t0 = time.time()
        try:
            res = runner.run(apply, params, name, data_range, tile, logger, ns,
                             mode="valid", pairs=pairs,
                             max_tiles_per_call=registry.get_spec(model_id).max_tiles_per_call)
        except Exception as e:
            print(f"[{model_id}] {name} FAILED: {e}", file=sys.stderr)
            continue
        results[name] = {
            "model_id": model_id,
            "numerics_mode": args.mode,
            "images": [os.path.basename(h) for _, h in pairs],
            "valid_psnr": res["valid_psnr"],
            "valid_runtime_ms": res["valid_runtime"],
            "valid_ave_psnr": res["valid_ave_psnr"],
            "valid_ave_runtime_ms": res["valid_ave_runtime"],
            "wall_seconds": time.time() - t0,
        }
        if args.ssim:
            results[name]["valid_ssim"] = res["valid_ssim"]
            results[name]["valid_ave_ssim"] = res["valid_ave_ssim"]
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"[{model_id}] {name}: ave {res['valid_ave_psnr']:.4f} dB, "
              f"{res['valid_ave_runtime']:.1f} ms/img ({time.time()-t0:.0f}s wall)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
