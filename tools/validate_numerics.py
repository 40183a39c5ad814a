#!/usr/bin/env python
"""Per-model numerics-mode validation: PSNR impact of mixed/bf16 compute.

For every zoo model with a golden, compares the parity (f32/HIGHEST) output
against mixed (f32 act, 1-pass MXU) and fast (bf16) outputs in the uint8
scoring domain. Reports the implied PSNR between modes — a proxy for the
DIV2K PSNR shift when choosing a faster mode (>= ~55 dB between-mode PSNR
keeps the benchmark PSNR within ~0.01 dB).

Usage: python tools/validate_numerics.py [id ...]
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    import argparse

    import jax

    from ntire2022_esr_tpu import config
    from ntire2022_esr_tpu.harness import registry
    from ntire2022_esr_tpu.harness.profiling import require_device

    require_device()

    ap = argparse.ArgumentParser()
    ap.add_argument("ids", nargs="*", type=int)
    ap.add_argument("--attn", default="auto",
                    choices=["auto", "off", "probs", "scores", "scores_f16"],
                    help="attention-score storage for the NON-parity modes "
                         "(parity output stays the strict reference): 'auto' "
                         "= shipped per-site AUTO config; 'off' isolates pure "
                         "mode error; probs/scores/scores_f16 force the variant")
    ap.add_argument("--tail", default="auto",
                    choices=["auto", "off", "on", "bf16", "f16"],
                    help="HR-tail storage tier (config.hr_tail) for the "
                         "NON-parity modes: 'auto' = shipped config, "
                         "'off'/'bf16'/'f16' force it ('on' = legacy alias "
                         "for bf16)")
    ap.add_argument("--modes", default="high,mixed,fast",
                    help="comma-separated non-parity modes to column "
                         "(e.g. high,mixed,fast,fast16)")
    args = ap.parse_args(argv)
    ids = args.ids or registry.available_ids()
    gdir = os.path.join(REPO, "tests", "goldens")
    modes = [m.strip() for m in args.modes.split(",") if m.strip()]

    print(f"{'model':22} " + " ".join(f"{m + ' dB':>10}" for m in modes))
    for mid in ids:
        path = os.path.join(gdir, f"model_{mid:02}.npz")
        if not os.path.exists(path):
            continue
        g = np.load(path)
        dr = float(g["data_range"])
        x = (g["input_u8"].astype(np.float32) / (255.0 / dr))[None]
        spec = registry.get_spec(mid)
        params = registry.load_params(spec)

        # snapshot any process-level forcing (NTIRE_ATTN_BF16 /
        # NTIRE_HR_TAIL_BF16 or setters) so it is honored under 'auto'
        # and restored after each mode — resetting to None here would
        # silently drop an env opt-in after the first model
        prev_attn = config.attn_bf16_override()
        prev_tail = config.hr_tail_override()
        tail_force = {"on": "bf16"}.get(args.tail, args.tail)

        outs = {}
        for mode in ["parity"] + modes:
            config.set_mode(mode)
            if mode == "parity":
                # the parity arm is always the strict reference graph,
                # even when a forced env/CLI variant is in effect
                config.set_attn_bf16("off")
                config.set_hr_tail("off")
            else:
                config.set_attn_bf16(
                    prev_attn if args.attn == "auto" else args.attn)
                config.set_hr_tail(
                    prev_tail if tail_force == "auto" else tail_force)
            try:
                f = jax.jit(lambda p, a: spec.apply(p, a))
                y = np.asarray(f(params, x), dtype=np.float32)
            finally:
                config.set_attn_bf16(prev_attn)
                config.set_hr_tail(prev_tail)
            outs[mode] = np.round(np.clip(y, 0, dr) * (255.0 / dr))

        def psnr(a, b):
            mse = np.mean((a - b) ** 2)
            return float("inf") if mse == 0 else 20 * np.log10(255.0 / np.sqrt(mse))

        print(f"{spec.name:22} " + " ".join(
            f"{psnr(outs['parity'], outs[m]):10.2f}" for m in modes), flush=True)


if __name__ == "__main__":
    main()
