#!/usr/bin/env python
"""Speed-of-light roofline for the sustained zoo table.

For each model, compiles the sustained-sweep step (forward + scalar reduce)
at the model's measured best batch and compares the measured sustained
ms/img against hardware lower bounds derived from the compiled executable's
post-optimization cost analysis:

- ``hbm_ms``  = bytes-accessed / HBM bandwidth — the memory-bound floor.
- ``mxu_ms``  = flops / bf16 MXU peak — the compute-bound floor at 1-pass
  bf16 (the ``high`` mode runs 3-pass f32-accurate matmuls, so its true
  compute floor is ~3x this; the 1-pass number is the hard bound).
- ``xla_ms``  = XLA's own ``optimal_seconds`` estimate.

``sol_ratio`` = measured / max(hbm_ms, mxu_ms): 1.0 means the executable
runs at the roofline; values near 1 mean the remaining gap to the Titan-Xp
baseline is physics (bytes in f32), not scheduling.

Usage: python tools/roofline_report.py [--ids 2 9 ...] [--out FILE]
Needs the real chip (compiles via the remote helper; executables from the
sustained sweep are warm in the persistent compile cache).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# TPU v5e single chip (public spec): 197 TFLOP/s bf16, 819 GB/s HBM.
HBM_BW = 819e9
MXU_BF16 = 197e12

DEFAULT_IDS = [2, 9, 20, 27, 28, 30, 33, 4, 23, 12]


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ntire2022_esr_tpu import config
    from ntire2022_esr_tpu.harness import registry
    from ntire2022_esr_tpu.harness.profiling import require_device

    require_device()

    ap = argparse.ArgumentParser()
    ap.add_argument("--ids", nargs="*", type=int, default=DEFAULT_IDS)
    ap.add_argument("--mode", default="high")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--sustained", default=os.path.join(
        REPO, "results", "protocol", "zoo_sustained.json"))
    ap.add_argument("--out", default=os.path.join(
        REPO, "results", "protocol", "roofline_r3.json"))
    args = ap.parse_args(argv)

    sustained = json.load(open(args.sustained))
    by_id = {row["model_id"]: (name, row) for name, row in sustained.items()}

    config.set_mode(args.mode)
    results = {}
    if os.path.exists(args.out):
        results = json.load(open(args.out))

    for mid in args.ids:
        if mid not in by_id:
            print(f"id {mid}: no sustained row, skipping", flush=True)
            continue
        try:
            _one_model(mid, by_id, args, results)
        except Exception as e:
            # the cost-analysis wrapper is a FRESH executable even when the
            # sweep's timing executable is cache-warm; a remote-compile 500
            # on one big model must not kill the 42-model report
            print(f"id {mid} FAILED: {str(e)[:200]}", flush=True)

    _print_table(results)


def _one_model(mid, by_id, args, results):
    import jax
    import jax.numpy as jnp

    from ntire2022_esr_tpu.harness import registry

    if True:
        name, row = by_id[mid]
        batch = int(row["batch"])
        measured = float(row["ms_per_image_sustained"])
        apply, params, _, dr, _ = registry.build_model(mid)

        def _cost(fn, *xs):
            compiled = jax.jit(fn).lower(params, *xs).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            ca = dict(ca) if ca else {}
            return (float(ca.get("bytes accessed", 0.0)),
                    float(ca.get("flops", 0.0)),
                    float(ca.get("optimal_seconds", 0.0)))

        if row.get("method") == "split":
            # split rows run TWO executables (harness/stagesplit.py):
            # body at `batch` + tail over `chunk`-sized slices; the floors
            # are the per-chain sums of both stages' costs
            from ntire2022_esr_tpu.harness import stagesplit

            body, tail = stagesplit.get_split(mid)
            chunk = int(row.get("chunk", stagesplit.SHIPPED[mid][1]))
            n_chunks = batch // chunk
            x = jnp.zeros((batch, args.size, args.size, 3), jnp.float32)
            print(f"compiling {name} split body@{batch} + tail@{chunk}...",
                  flush=True)

            def body_step(p, a, i):
                return body(p, a * (1.0 + 1e-6 * i))

            h0 = jax.eval_shape(body_step, params, x, jnp.float32(0.0))
            h = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), h0)

            def tail_step(p, hh, a, c):
                hs = jax.tree_util.tree_map(
                    lambda v: jax.lax.dynamic_slice_in_dim(v, c * chunk, chunk, 0), hh)
                xs = jax.lax.dynamic_slice_in_dim(a, c * chunk, chunk, 0)
                return jnp.sum(tail(p, hs, xs))

            b_b, f_b, o_b = _cost(body_step, x, jnp.float32(0.0))
            b_t, f_t, o_t = _cost(tail_step, h, x, jnp.int32(0))
            bytes_acc = b_b + n_chunks * b_t
            flops = f_b + n_chunks * f_t
            opt_s = o_b + n_chunks * o_t
        else:
            def step(p, a, i):
                return jnp.sum(apply(p, a * (1.0 + 1e-6 * i)))

            x = jnp.zeros((batch, args.size, args.size, 3), jnp.float32)
            print(f"compiling {name} at batch {batch}...", flush=True)
            bytes_acc, flops, opt_s = _cost(step, x, jnp.float32(0.0))

        hbm_ms = bytes_acc / HBM_BW * 1e3 / batch
        mxu_ms = flops / MXU_BF16 * 1e3 / batch
        xla_ms = opt_s * 1e3 / batch
        sol = max(hbm_ms, mxu_ms)
        rec = {
            "model_id": mid, "batch": batch, "mode": args.mode,
            "measured_ms_per_img": measured,
            "bytes_accessed": bytes_acc, "flops": flops,
            "hbm_ms_per_img": hbm_ms, "mxu_bf16_ms_per_img": mxu_ms,
            "xla_optimal_ms_per_img": xla_ms,
            "bound": "hbm" if hbm_ms >= mxu_ms else "mxu",
            "sol_ratio": measured / sol if sol else float("nan"),
        }
        results[name] = rec
        print(f"{name:16} measured {measured:8.2f}  hbm-floor {hbm_ms:7.2f}  "
              f"mxu-floor {mxu_ms:6.2f}  xla-opt {xla_ms:7.2f}  "
              f"{rec['bound']}-bound  x{rec['sol_ratio']:.2f} of SoL",
              flush=True)
        json.dump(results, open(args.out, "w"), indent=1)


def _print_table(results):
    print("\n| model | measured ms/img | HBM floor | MXU bf16 floor | bound | x of SoL |")
    print("|---|---|---|---|---|---|")
    for name in sorted(results):
        r = results[name]
        print(f"| {name} | {r['measured_ms_per_img']:.2f} @{r['batch']} | "
              f"{r['hbm_ms_per_img']:.2f} | {r['mxu_bf16_ms_per_img']:.2f} | "
              f"{r['bound']} | {r['sol_ratio']:.2f} |")


if __name__ == "__main__":
    main()
