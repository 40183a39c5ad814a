#!/usr/bin/env python
"""Build the benchmark-gated serving envelope: fastest measured tier per
model whose BENCHMARK-level PSNR shift passes the gate.

The challenge scores fp32 PSNR with a ±0.01 dB reproducibility bar
(reference test_demo.py:439-447; README.md:16). Round 4 established the
honest adjudication for faster numerics tiers: measure the full-protocol
PSNR delta vs the parity arm on surrogate DIV2K-shaped images
(tools/validate_numerics.py --data_dir -> results/protocol/
numerics_delta_r4.json) and admit a tier only when the measured shift is
within the gate (default 0.005 dB, i.e. half the reference's own bar).

This tool joins three measured artifact families:
  - the canonical high-mode sustained table (zoo_sustained.json — high +
    benchmark-gated AUTO storage tiers, the ≤0.005 dB baseline),
  - per-tier sustained sweeps (zoo_sustained_fast_r3/r4.json,
    zoo_sustained_fast16_r4.json, + any --extra files),
  - the benchmark-delta ledger (numerics_delta_r4.json),
and emits results/protocol/zoo_sustained_gated.json: per model the fastest
tier among {high, fast, fast16} that (a) has an on-chip sustained row and
(b) for non-high tiers, a measured |benchmark delta| <= gate with the
shipped AUTO storage config (attn=auto, tail=auto, no w8). Models with no
passing faster tier keep their high row — the envelope never degrades.

Usage: python tools/make_gated_envelope.py [--gate 0.005] [--write]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_PROTO = os.path.join(REPO, "results", "protocol")

TIER_FILES = ["zoo_sustained_fast_r3.json", "zoo_sustained_fast_r4.json",
              "zoo_sustained_fast16_r4.json",
              # round-5 fori-dispatch rows for the tiled models (the only
              # rows a registry-tiled model may admit — see build_envelope)
              "zoo_sustained_fast_fori_r5.json",
              "zoo_sustained_fast_fori_b2_r5.json",
              "zoo_sustained_fast16_fori_r5.json",
              "zoo_sustained_fast16_fori_b2_r5.json",
              # round-5 fasthi tier (bf16 activation storage, f32 weights,
              # HIGH contractions — config.py): chain sweep + NLFFC fori rows
              "zoo_sustained_fasthi_r5.json",
              "zoo_sustained_fasthi16_r5.json",
              "zoo_sustained_fasthi_split_r5.json",
              "zoo_sustained_fasthi_fori_r5.json",
              "zoo_sustained_fasthi_fori_b2_r5.json"]


def _load(proto_dir, name):
    path = name if os.path.isabs(name) else os.path.join(proto_dir, name)
    return json.load(open(path)) if os.path.exists(path) else {}


def gated_deltas(delta_art):
    """name -> mode -> (delta, images, worst-per-image delta | None).

    Per (name, mode) the MOST-IMAGES row wins (the best-powered
    measurement); ties break toward the largest-|delta| (conservative).
    Only rows measured with the shipped AUTO storage config count; forced
    variants (tail=bf16/f16, attn overrides, w8) are tier measurements for
    OTHER ledgers and do not enter the envelope. ``worst`` is None for
    legacy rows that predate per-image tracking.
    """
    out = {}
    for key, row in delta_art.items():
        name = key.split("|")[0]
        if row.get("attn") != "auto" or row.get("tail") != "auto":
            continue
        if row.get("w8"):
            continue
        n = row.get("images", 0)
        for mode, d in row.get("delta_db", {}).items():
            worst = row.get("delta_db_worst", {}).get(mode)
            cur = out.setdefault(name, {})
            old = cur.get(mode)
            if (old is None or n > old[1]
                    or (n == old[1] and abs(d) > abs(old[0]))):
                cur[mode] = (d, n, worst)
    return out


def build_envelope(base, deltas, tier_rows, gate, tiled_names=(),
                   min_images=8, worst_gate=0.01, pin_high=()):
    """Per model: fastest tier whose measured |benchmark delta| <= gate.

    ``base`` rows (high + benchmark-gated AUTO storage) are always
    admissible; a non-high tier needs BOTH an on-chip sustained row and a
    measured delta. The envelope never degrades below the high row.

    ``tiled_names``: models whose registry spec mandates the overlap-tile
    dispatch (``spec.tile is not None`` — e.g. 02_NLFFC, reference
    ``test_demo.py:337``). The sweep's ``method`` field is a TIMING
    methodology, not a dispatch schedule: a ``chain`` row for a tiled
    model was measured on tile-sized images and does NOT license untiled
    full-image serving (unmeasured memory, parity-unvalidated outputs).
    Such models only admit candidate rows whose method is ``fori``, and
    the emitted row is forced to the tiled route either way.

    Admission for a non-high tier requires ALL of:
      - an on-chip sustained row (and, for tiled models, a fori one),
      - a benchmark delta measured on >= ``min_images`` surrogate images
        at true DIV2K shapes (2-image spot checks don't flip tiers),
      - |mean delta| <= ``gate`` AND |worst per-image delta| <=
        ``worst_gate`` (the reference's own ±0.01 dB reproducibility bar,
        test_demo.py:447) — a row that predates per-image tracking
        (worst is None) is NOT admissible.
    """
    env = {}
    for name in sorted(base, key=lambda n: base[n]["model_id"]):
        best = dict(base[name])
        best["tier"] = "high"
        best["tier_delta_db"] = None  # high+AUTO: gate carried by the AUTO ledger
        modes = (() if base[name]["model_id"] in pin_high
                 else ("fast16", "fast", "fasthi", "fasthi16"))
        for mode in modes:
            row = tier_rows.get(name, {}).get(mode)
            d = deltas.get(name, {}).get(mode)
            if row is None or d is None:
                continue
            if name in tiled_names and row.get("method") != "fori":
                continue  # tile-sized timing row, not a deployable schedule
            delta, n_imgs, worst = d
            if n_imgs < min_images:
                continue  # under-powered measurement can't flip a tier
            if abs(delta) > gate:
                continue
            if worst is None or abs(worst) > worst_gate:
                continue
            if row["ms_per_image_sustained"] < best["ms_per_image_sustained"]:
                best = dict(row)
                best["tier"] = mode
                best["tier_delta_db"] = delta
                best["tier_delta_db_worst"] = worst
                best["delta_images"] = n_imgs
        # Normalize `method` to the DISPATCH schedule the serving layer
        # executes (the sweeps use the same field for the TIMING loop —
        # e.g. 12_HNCT's high row was timed fori-looped but serves as a
        # plain batch chain): tiled registry models -> the tiler ('fori'),
        # stage-split rows -> 'split', everything else -> 'chain'.
        if name in tiled_names:
            best["method"] = "fori"  # registry-mandated dispatch
        elif best.get("method") != "split":
            best["method"] = "chain"
        env[name] = best
    return env


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", type=float, default=0.005,
                    help="max |benchmark PSNR delta| (dB) for a non-high "
                         "tier to enter the envelope")
    ap.add_argument("--worst_gate", type=float, default=0.01,
                    help="max |WORST per-image protocol PSNR delta| (dB) — "
                         "the reference's own reproducibility bar")
    ap.add_argument("--min_images", type=int, default=8,
                    help="min surrogate images behind a delta measurement "
                         "for it to flip a tier")
    ap.add_argument("--pin_high", nargs="*", type=int, default=[12],
                    help="model ids pinned to the high tier regardless of "
                         "measured deltas. Default: 12 (HNCT) — its real "
                         "checkpoint is absent upstream, so its benchmark "
                         "deltas are measured on a random-init net and "
                         "cannot support a quality claim")
    ap.add_argument("--proto_dir", default=DEFAULT_PROTO,
                    help="artifact directory (results/protocol)")
    ap.add_argument("--extra", nargs="*", default=[],
                    help="additional sustained artifacts (fastest row per "
                         "model per mode wins across all files)")
    ap.add_argument("--out", default=None,
                    help="output path (default <proto_dir>/zoo_sustained_gated.json)")
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args(argv)
    out_path = args.out or os.path.join(args.proto_dir, "zoo_sustained_gated.json")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from merge_sustained import TITAN_MS

    # registry-mandated tiled dispatch (spec.tile is not None)
    sys.path.insert(0, REPO)
    from ntire2022_esr_tpu.harness import registry
    from ntire2022_esr_tpu.models import zoo  # noqa: F401  (registers specs)
    tiled_names = {s.name for s in registry.all_specs() if s.tile is not None}

    base = _load(args.proto_dir, "zoo_sustained.json")
    deltas = gated_deltas(_load(args.proto_dir, "numerics_delta_r4.json"))

    # per-tier sustained candidates: best (fastest) measured row per model
    # per mode across all sweep artifacts
    tier_rows = {}
    for f in TIER_FILES + list(args.extra):
        for name, row in _load(args.proto_dir, f).items():
            mode = row.get("mode")
            cur = tier_rows.setdefault(name, {}).get(mode)
            if cur is None or row["ms_per_image_sustained"] < cur["ms_per_image_sustained"]:
                tier_rows[name][mode] = row

    env = build_envelope(base, deltas, tier_rows, args.gate, tiled_names,
                         min_images=args.min_images,
                         worst_gate=args.worst_gate,
                         pin_high=set(args.pin_high))

    print("| model | ms/img | tier | batch | delta dB | worst img | n | "
          "Titan ms | speedup |")
    print("|---|---|---|---|---|---|---|---|---|")
    sps = []
    flipped = 0
    for name, r in env.items():
        ms = r["ms_per_image_sustained"]
        ti = TITAN_MS[name]
        sp = ti / ms
        sps.append(sp)
        d = r["tier_delta_db"]
        dcol = "AUTO ledger" if d is None else f"{d:+.4f}"
        w = r.get("tier_delta_db_worst")
        wcol = "—" if w is None else f"{w:+.4f}"
        n = r.get("delta_images", "—")
        flipped += r["tier"] != "high"
        print(f"| {name} | {ms:.2f} | {r['tier']} | {r.get('batch')} | {dcol} "
              f"| {wcol} | {n} | {ti:.1f} | {sp:.1f}x |")
    geo = math.exp(sum(math.log(s) for s in sps) / len(sps))
    print(f"\ngate ±{args.gate} dB: {flipped} models flipped to a faster tier; "
          f"geomean {geo:.1f}x  min {min(sps):.1f}x  max {max(sps):.1f}x  "
          f"(n={len(sps)})")

    if args.write:
        with open(out_path, "w") as fh:
            json.dump(env, fh, indent=1)
            fh.write("\n")
        print(f"wrote {out_path}")
    return env


if __name__ == "__main__":
    main()
