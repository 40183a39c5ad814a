#!/usr/bin/env python
"""Byte-compare reference SR outputs against the TPU protocol's saved SR.

The full-protocol comparison (tools/compare_protocol.py) shows 0.0000 dB
per-image PSNR deltas; this tool proves the stronger claim behind that
number: the uint8 SR images are *bit-identical*, so every metric computed
from them (PSNR, SSIM — reference test_demo.py:447-453) is identical by
construction, not merely within tolerance.

Runs the torch reference per image on CPU (reference protocol:
imread_uint -> uint2tensor4 -> forward -> tensor2uint, test_demo.py:416-437)
and compares element-wise against the PNGs the TPU protocol run saved
(tools/run_tpu_protocol.py --save_dir).

Usage:
  python tools/check_bitexact.py --data_dir /tmp/div2k_surrogate \
      --sr_dir /tmp/tpu_protocol_sr [--out FILE.json] ids...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

import numpy as np

from _refenv import REPO, setup_reference


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ids", nargs="+", type=int)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--sr_dir", default="/tmp/tpu_protocol_sr")
    ap.add_argument("--ref_sr_dir", default=None,
                    help="directory of reference SR PNGs saved by "
                         "tools/run_reference_protocol.py --save_dir (same "
                         "<name>/valid/NNNN.png layout) — compares saved "
                         "trees directly instead of re-running torch")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import torch

    test_demo = setup_reference()
    from utils import utils_image as util

    report = {}
    for model_id in args.ids:
        ns = types.SimpleNamespace(model_id=model_id)
        if args.ref_sr_dir:
            # name lookup without instantiating the model: the saved trees
            # are keyed by registry name, identical to select_model's
            sys.path.insert(0, REPO)
            from ntire2022_esr_tpu.harness.registry import get_spec

            name, data_range, tile, model = get_spec(model_id).name, None, None, None
        else:
            model, name, data_range, tile = test_demo.select_model(
                ns, torch.device("cpu"))
            model = model.float().eval()
        pairs = [(l, h) for l, h in test_demo.select_dataset(args.data_dir, "valid")
                 if os.path.exists(l)]
        rows = []
        for lr_path, hr_path in pairs:
            img_name, ext = os.path.splitext(os.path.basename(hr_path))
            tpu_png = os.path.join(args.sr_dir, name, "valid", img_name[:4] + ext)
            if not os.path.exists(tpu_png):
                print(f"[{name}] {img_name}: no TPU SR saved, skipping", file=sys.stderr)
                continue
            if args.ref_sr_dir:
                ref_png = os.path.join(args.ref_sr_dir, name, "valid",
                                       img_name[:4] + ext)
                if not os.path.exists(ref_png):
                    print(f"[{name}] {img_name}: no reference SR saved, "
                          f"skipping", file=sys.stderr)
                    continue
                ref_sr = util.imread_uint(ref_png, n_channels=3)
            else:
                x = util.uint2tensor4(util.imread_uint(lr_path, n_channels=3),
                                      data_range)
                with torch.no_grad():
                    y = test_demo.forward(x, model, tile)
                ref_sr = util.tensor2uint(y, data_range)
            tpu_sr = util.imread_uint(tpu_png, n_channels=3)
            ndiff = int(np.count_nonzero(ref_sr.astype(np.int16) - tpu_sr.astype(np.int16)))
            rows.append({"image": img_name, "pixels": int(ref_sr.size),
                         "mismatched": ndiff,
                         "max_abs_diff": int(np.abs(ref_sr.astype(np.int16)
                                                    - tpu_sr.astype(np.int16)).max())})
            tag = "BITEXACT" if ndiff == 0 else f"DIFF {ndiff}/{ref_sr.size}"
            print(f"[{name}] {img_name}: {tag}", file=sys.stderr)
        report[name] = {"model_id": model_id, "rows": rows,
                        "bitexact": all(r["mismatched"] == 0 for r in rows) and bool(rows)}
        print(f"[{model_id}] {name}: bitexact={report[name]['bitexact']}", file=sys.stderr)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    ok = all(v["bitexact"] for v in report.values())
    print(json.dumps({k: v["bitexact"] for k, v in report.items()}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
