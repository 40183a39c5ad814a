#!/usr/bin/env python
"""Run the torch reference at the full challenge protocol on CPU (oracle).

Replicates reference test_demo.run (test_demo.py:394-477) exactly —
imread_uint -> uint2tensor4(data_range) -> forward (with the overlap-tile
path for tiled models) -> tensor2uint -> modcrop(HR) -> calculate_psnr
(border=4) — minus the CUDA-event timing (CPU host). The per-image PSNRs
are the oracle the TPU framework's full-protocol run must match to
+-0.01 dB (the challenge's parity claim).

Usage:
  python tools/run_reference_protocol.py --data_dir /tmp/div2k_surrogate \
      --out /tmp/ref_protocol.json [ids...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

from _refenv import REPO, setup_reference


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ids", nargs="*", type=int, default=None)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--threads", type=int, default=0)
    ap.add_argument("--ssim", action="store_true",
                    help="also score SSIM (reference test_demo.py:450-453)")
    ap.add_argument("--save_dir", default=None,
                    help="save the reference SR outputs as "
                         "<save_dir>/<name>/valid/NNNN.png — the byte-level "
                         "oracle for tools/check_bitexact.py --ref_sr_dir")
    args = ap.parse_args(argv)

    import torch

    if args.threads:
        torch.set_num_threads(args.threads)

    test_demo = setup_reference()
    from utils import utils_image as util

    ids = args.ids
    if not ids:
        sys.path.insert(0, REPO)
        from ntire2022_esr_tpu.harness.registry import available_ids

        ids = available_ids()

    # merge into an existing artifact so the sweep is resumable per model
    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    sf, border = 4, 4
    for model_id in ids:
        ns = types.SimpleNamespace(model_id=model_id)
        try:
            model, name, data_range, tile = test_demo.select_model(ns, torch.device("cpu"))
        except Exception as e:
            print(f"[{model_id}] SKIP ({e})", file=sys.stderr)
            continue
        if name in results:
            print(f"[{model_id}] {name}: cached", file=sys.stderr)
            continue
        model = model.float().eval()
        pairs = test_demo.select_dataset(args.data_dir, "valid")
        pairs = [(l, h) for l, h in pairs if os.path.exists(l) and os.path.exists(h)]
        if not pairs:
            sys.exit(f"no DIV2K valid pairs under {args.data_dir}")
        psnrs, ssims, names = [], [], []
        save_path = None
        if args.save_dir:
            save_path = os.path.join(args.save_dir, name, "valid")
            os.makedirs(save_path, exist_ok=True)
        t0 = time.time()
        for lr_path, hr_path in pairs:
            img_lr = util.imread_uint(lr_path, n_channels=3)
            x = util.uint2tensor4(img_lr, data_range)
            with torch.no_grad():
                y = test_demo.forward(x, model, tile)
            sr = util.tensor2uint(y, data_range)
            hr = util.modcrop(util.imread_uint(hr_path, n_channels=3).squeeze(), sf)
            psnr = util.calculate_psnr(sr, hr, border=border)
            psnrs.append(float(psnr))
            names.append(os.path.basename(hr_path))
            line = f"  {names[-1]}: {psnr:.4f} dB"
            if args.ssim:
                ssims.append(float(util.calculate_ssim(sr, hr, border=border)))
                line += f"; SSIM {ssims[-1]:.6f}"
            if save_path:
                img_name, ext = os.path.splitext(names[-1])
                util.imsave(sr, os.path.join(save_path, img_name[:4] + ext))
            print(line, file=sys.stderr)
        results[name] = {
            "model_id": model_id,
            "images": names,
            "valid_psnr": psnrs,
            "valid_ave_psnr": sum(psnrs) / len(psnrs),
            "host_seconds": time.time() - t0,
        }
        if args.ssim:
            results[name]["valid_ssim"] = ssims
            results[name]["valid_ave_ssim"] = sum(ssims) / len(ssims)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"[{model_id}] {name}: ave {results[name]['valid_ave_psnr']:.4f} dB "
              f"({results[name]['host_seconds']:.0f}s)", file=sys.stderr)


if __name__ == "__main__":
    main()
