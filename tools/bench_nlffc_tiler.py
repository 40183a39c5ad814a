#!/usr/bin/env python
"""NLFFC tiled-serving probe: whole-grid jit vs ChunkedTiler, tiles/call
ceiling, high vs fast tier — at TRUE DIV2K shape (VERDICT r4 item 6).

The protocol path jits the ENTIRE overlap-tile sweep as one executable per
image shape (harness/runner.py); its executable inlines ceil(T/chunk)
NLFFC bodies, which is why the model is capped at max_tiles_per_call=2
(models/zoo.py). ChunkedTiler (harness/tiling.py) dispatches one jitted
fixed-(chunk,256,256,3) body per chunk instead, so the compile ceiling
binds on ONE body instance and the executable is image-shape independent.

Arms, each timed as median of --iters fenced full-image passes on the
first surrogate frame (339x510 LR -> 2x3 = 6 tiles at tile 256/overlap 32):

  - wholegrid/chunk2: status quo (the jitted runner path)
  - tiler/chunk 2, 3, 6: dispatch-chunked; 6 = the whole grid in one call
  - each under high and fast tiers

Agreement: every arm's uint8 SR is compared against the parity whole-grid
output (the 0.0000 dB-verified path); tier arms must sit within the tier's
own benchmark-delta story, same-tier tiler-vs-wholegrid must agree to
<= 1e-3*data_range in uint8 (the stage-split seam bar).

Usage: python tools/bench_nlffc_tiler.py [--iters 5]
       [--data_dir /tmp/div2k_surrogate]
       [--out results/protocol/nlffc_tiler_r5.json]
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
    import jax

    from ntire2022_esr_tpu import config
    from ntire2022_esr_tpu.harness import registry
    from ntire2022_esr_tpu.harness import tiling
    from ntire2022_esr_tpu.harness.profiling import fence, require_device
    from ntire2022_esr_tpu.utils import image as img_util

    require_device()

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--data_dir", default="/tmp/div2k_surrogate")
    ap.add_argument("--chunks", nargs="*", type=int, default=[2, 3, 6])
    ap.add_argument("--modes", nargs="*", default=["high", "fast"])
    ap.add_argument("--out", default=os.path.join(
        REPO, "results", "protocol", "nlffc_tiler_r5.json"))
    args = ap.parse_args(argv)

    lr_path = os.path.join(args.data_dir, "DIV2K_valid_LR", "0801x4.png")
    lr = img_util.imread_uint(lr_path)
    print(f"frame: {lr.shape}", flush=True)

    results = {}
    if os.path.exists(args.out):
        results = json.load(open(args.out))

    spec = registry.get_spec(2)
    ref_u8 = None

    def run_arm(key, fn, dr):
        nonlocal ref_u8
        try:
            y = fn()  # compile + warm
            fence(y)
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                fence(fn())
                times.append(time.perf_counter() - t0)
            med = sorted(times)[len(times) // 2] * 1e3
            u8 = img_util.nhwc2uint(np.asarray(y, np.float32), dr)
            if ref_u8 is None:
                ref_u8 = u8
            dmax = int(np.abs(u8.astype(np.int16)
                              - ref_u8.astype(np.int16)).max())
            mse = float(np.mean((u8.astype(np.float64)
                                 - ref_u8.astype(np.float64)) ** 2))
            agree_db = float("inf") if mse == 0 else \
                20 * np.log10(255.0 / np.sqrt(mse))
            results[key] = {"ms_per_image": med, "u8_max_delta_vs_parity": dmax,
                            "u8_agree_db_vs_parity": agree_db}
            print(f"{key:28} {med:9.1f} ms/img  max u8 delta {dmax} "
                  f"agree {agree_db:.1f} dB", flush=True)
        except Exception as e:
            results[key] = {"error": str(e)[:300]}
            print(f"{key:28} FAILED: {str(e)[:200]}", flush=True)
        json.dump(results, open(args.out, "w"), indent=1)

    # parity whole-grid first: the agreement reference
    for mode in ["parity"] + [m for m in args.modes if m != "parity"]:
        config.set_mode(mode)
        with config.numerics_mode(mode):
            apply, params, name, dr, tile = registry.build_model(2)
            x = img_util.uint2nhwc(lr, dr)

            if mode == "parity":
                jitted = jax.jit(lambda p, a: tiling.forward(
                    apply, p, a, tile,
                    max_tiles_per_call=spec.max_tiles_per_call))
                run_arm("parity|wholegrid|2", lambda: jitted(params, x), dr)
                continue

            jitted = jax.jit(lambda p, a: tiling.forward(
                apply, p, a, tile,
                max_tiles_per_call=spec.max_tiles_per_call))
            run_arm(f"{mode}|wholegrid|{spec.max_tiles_per_call}",
                    lambda: jitted(params, x), dr)
            for chunk in args.chunks:
                tiler = tiling.ChunkedTiler(apply, tile, chunk=chunk)

                def call(tiler=tiler):
                    with config.numerics_mode(mode):
                        return tiler(params, x)

                run_arm(f"{mode}|tiler|{chunk}", call, dr)

    print(json.dumps({k: v.get("ms_per_image") for k, v in results.items()},
                     indent=1))


if __name__ == "__main__":
    main()
