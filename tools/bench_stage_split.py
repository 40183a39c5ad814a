#!/usr/bin/env python
"""Stage-split dispatch A/B (strict-numerics batch-ceiling lever).

Measures the shipped stage-split schedule (harness/stagesplit.py: body at
a LARGE batch + the x4 tail over chunks, two executables, chain-pipelined
dispatch) against the plain whole-forward chain at its own best batch.
See the harness.stagesplit module docstring for the mechanism and the
shipped verdicts.

Exactness gate per mode (asserted before timing): parity is bit-class
exact across the executable seam (tol 1e-4 x data_range); in high/mixed
the seam moves XLA fusion boundaries, so identical math can differ at the
mode's own rounding level — gated at 1e-3 x data_range, tight enough that
mis-wiring (wrong slope, dropped activation, O(0.1-1) errors) cannot pass.
The split tails live in the model modules and carry the models' own
hr_tail_scope sites, so a forced NTIRE_HR_TAIL opt-in measures the SAME
tail numerics in both arms.

Measured arms per model:
  full_msimg  — the plain forward at --full-batch (chain timing; the
                shipped sustained methodology, for same-process
                comparability)
  split_msimg — body at --batch + tail at --chunk, split-chain timing

Usage: python tools/bench_stage_split.py [--models 33,27,28] [--batch 64]
       [--chunk 8] [--full-batch 8] [--mode high] [--reps 8] [--iters 3]
       [--out F.json]
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
    ap.add_argument("--models", default="33,27,28")
    ap.add_argument("--batch", type=int, default=64,
                    help="body batch for the split arm")
    ap.add_argument("--chunk", type=int, default=8,
                    help="tail chunk for the split arm (must divide batch)")
    ap.add_argument("--full-batch", type=int, default=8,
                    help="batch for the plain-forward reference arm")
    ap.add_argument("--skip-full", action="store_true",
                    help="measure only the split arm (reuse a recorded full)")
    ap.add_argument("--mode", default="high")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="/tmp/stage_split.json")
    args = ap.parse_args(argv)
    assert args.batch % args.chunk == 0

    import jax
    import jax.numpy as jnp

    from ntire2022_esr_tpu import config
    from ntire2022_esr_tpu.harness import registry, stagesplit
    from ntire2022_esr_tpu.harness.profiling import chain_timer, require_device

    require_device()

    config.set_mode(args.mode)
    results = {}
    if os.path.exists(args.out):
        results = json.load(open(args.out))

    rng = np.random.RandomState(0)
    for mid in [int(m) for m in args.models.split(",")]:
        apply, params, name, dr, _ = registry.build_model(mid)
        params = jax.device_put(params)
        body, tail = stagesplit.get_split(mid)

        x = jnp.asarray(rng.rand(args.batch, args.size, args.size, 3)
                        .astype(np.float32) * dr)

        # exactness across the executable seam on the first chunk
        small = x[: args.chunk]
        ref = jax.jit(lambda p, a: apply(p, a))(params, small)
        got = stagesplit.split_apply(mid, args.chunk)(params, small)
        err = float(jnp.max(jnp.abs(ref - got)))
        tol = (1e-4 if args.mode == "parity" else 1e-3) * max(dr, 1.0)
        assert err < tol, f"{name}: split mismatch {err} (tol {tol})"

        split_s = stagesplit.split_chain_timer(
            body, tail, params, x, args.chunk, args.reps, args.iters)
        split_ms = split_s * 1e3 / args.reps / args.batch

        if args.skip_full:
            full_ms = results.get(f"stagesplit_{name}", {}).get("full_msimg")
        else:
            xf = jnp.asarray(rng.rand(args.full_batch, args.size, args.size, 3)
                             .astype(np.float32) * dr)
            full_s = chain_timer(apply, params, xf, args.reps, args.iters)
            full_ms = full_s * 1e3 / args.reps / args.full_batch

        row = {"model_id": mid, "mode": args.mode, "size": args.size,
               "reps": args.reps, "body_batch": args.batch,
               "chunk": args.chunk, "full_batch": args.full_batch,
               "split_msimg": split_ms, "full_msimg": full_ms,
               "max_abs_err": err}
        results[f"stagesplit_{name}"] = row
        full_txt = f"{full_ms:.2f}" if full_ms is not None else "n/a"
        print(f"{name}: full {full_txt} @ {args.full_batch} vs split "
              f"{split_ms:.2f} ms/img @ body {args.batch}/chunk {args.chunk} "
              f"(exact to {err:.2e})", flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
