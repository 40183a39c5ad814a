#!/usr/bin/env python
"""Run the reference's OWN complexity counters per model (torch CPU).

The published challenge table (BASELINE.md, figs/results.png) carries FLOPs,
#Acts and #Conv values that were self-reported by the teams; the reference
harness also measures them itself with forward hooks
(utils/model_summary.py: get_model_flops :27, get_model_activation :48).
This tool executes those reference counters on a (3, 256, 256) input for
every implemented model and dumps JSON, so docs/COMPLEXITY.md can reconcile
three columns: published table vs reference-hook-counter vs this repo's
StableHLO analysis.

Usage: python tools/reconcile_complexity.py [id ...] > /tmp/ref_counts.json
"""

from __future__ import annotations

import argparse
import json
import sys
import types

from _refenv import REPO, setup_reference


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ids", nargs="*", type=int, default=None)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)

    import torch

    test_demo = setup_reference()
    from utils.model_summary import get_model_activation, get_model_flops

    ids = args.ids
    if not ids:
        sys.path.insert(0, REPO)
        from ntire2022_esr_tpu.harness.registry import available_ids

        ids = available_ids()

    out = {}
    for model_id in ids:
        ns = types.SimpleNamespace(model_id=model_id)
        try:
            model, name, data_range, tile = test_demo.select_model(ns, torch.device("cpu"))
        except FileNotFoundError as e:
            if model_id == 12:
                # team12_hnct.pt absent from the mirror; complexity does not
                # depend on weights, so count on a random init
                from models.team12_hnct.HNCT import HNCT

                model, name = HNCT(), "12_HNCT"
            else:
                print(f"[{model_id}] SKIP ({e})", file=sys.stderr)
                continue
        except Exception as e:
            print(f"[{model_id}] SKIP ({e})", file=sys.stderr)
            continue
        model = model.float().eval()
        with torch.no_grad():
            # the reference protocol (test_demo.py:522-534)
            acts, num_conv = get_model_activation(model, (3, 256, 256))
            flops = get_model_flops(model, (3, 256, 256), False)
        params = sum(p.numel() for p in model.parameters())
        out[str(model_id)] = {
            "name": name,
            "flops_G": flops / 1e9,
            "acts_M": acts / 1e6,
            "num_conv": int(num_conv),
            "params_M": params / 1e6,
        }
        print(f"[{model_id}] {name}: flops {flops/1e9:.2f} G, acts {acts/1e6:.2f} M, "
              f"conv {num_conv}, params {params/1e6:.4f} M", file=sys.stderr)

    text = json.dumps(out, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    else:
        print(text)


if __name__ == "__main__":
    main()
