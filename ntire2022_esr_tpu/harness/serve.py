"""Serving CLI: deploy one zoo model at its measured envelope plan.

    python -m ntire2022_esr_tpu.harness.serve --list
    python -m ntire2022_esr_tpu.harness.serve --model_id 4 --images DIR \
        [--save_dir S] [--tier fast16] [--batch 64] [--envelope PATH]
    python -m ntire2022_esr_tpu.harness.serve --model_id 4 --synthetic 256 \
        --hw 256 256

The reference has no serving story — its entry point is the scoring
harness (``test_demo.py:480-577``, one image at a time). This CLI is the
deployment counterpart: it reads the benchmark-gated envelope artifact
(``tools/make_gated_envelope.py`` -> ``harness/envelope.py``), builds an
``SRServer`` pinned to the model's measured-fastest admissible
configuration (numerics tier, device batch, stage-split schedule), streams
frames through the bounded pipeline, and prints one JSON summary line.

Tiled models (envelope method ``fori``, e.g. 02_NLFFC) are served through
``harness.tiling.tiled_apply`` under the plan's tier — same contract,
image-at-a-time dispatch.

Frame sources: ``--images`` (a directory of image files), ``--data_dir``
(DIV2K layout, the valid LR set), or ``--synthetic N --hw H W`` (random
uint8 frames — throughput demo without a dataset).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ntire2022_esr_tpu import config
from ntire2022_esr_tpu.harness import envelope as envelope_mod
from ntire2022_esr_tpu.harness import registry
from ntire2022_esr_tpu.harness.serving import SRServer
from ntire2022_esr_tpu.utils import image as img_util


def list_plans(path: Optional[str] = None) -> str:
    """The envelope as a printable table (one row per model)."""
    plans = envelope_mod.load_envelope(path)
    lines = ["| model | tier | batch | method | ms/img | delta dB |",
             "|---|---|---|---|---|---|"]
    for p in sorted(plans.values(), key=lambda p: p.model_id):
        d = "AUTO ledger" if p.tier_delta_db is None else f"{p.tier_delta_db:+.4f}"
        method = p.method if p.method != "split" else f"split/{p.chunk}"
        lines.append(f"| {p.name} | {p.tier} | {p.batch} | {method} "
                     f"| {p.ms_per_image:.2f} | {d} |")
    return "\n".join(lines)


def _frame_paths(args) -> List[str]:
    if args.images:
        paths = img_util.get_image_paths(args.images)
        if not paths:
            raise FileNotFoundError(f"no image files under {args.images}")
        return paths
    from ntire2022_esr_tpu.harness import data as data_mod

    sel = data_mod.select_dataset(args.data_dir, "valid")
    paths = [l for l, _ in sel if os.path.exists(l)]
    if not paths:
        raise FileNotFoundError(
            f"no valid-split LR images under {args.data_dir} "
            f"(expected e.g. {sel[0][0]})")
    return paths


def _frames(args) -> Tuple[Iterator[np.ndarray], List[Optional[str]], int]:
    """(frame iterator, per-frame source names, count)."""
    if args.synthetic:
        rng = np.random.RandomState(0)
        h, w = args.hw
        frames = [rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
                  for _ in range(args.synthetic)]
        return iter(frames), [None] * len(frames), len(frames)
    paths = _frame_paths(args)
    names = [os.path.splitext(os.path.basename(p))[0] for p in paths]
    return (img_util.imread_uint(p, 3) for p in paths), names, len(paths)


def _serve_tiled(plan, frames, names, save_dir, warmup=True):
    """Image-at-a-time tiled serving for ``fori``-method plans.

    Dispatches through ``tiling.ChunkedTiler``: the expensive model
    executable is jitted once over a fixed ``(chunk, tile, tile, C)``
    batch — image-shape INDEPENDENT, so a stream of differently-sized
    frames does not recompile the body (only the tiny per-shape
    gather/blend helpers).

    Returns ``(served_count, t0)`` where ``t0`` is the throughput-clock
    start — taken after the first frame pre-compiled the tile executable
    when ``warmup`` is on (tile shape is fixed, so one frame warms all).
    """
    from ntire2022_esr_tpu.harness.tiling import ChunkedTiler

    with config.numerics_mode(plan.tier):
        apply, params, name, dr, tile = registry.build_model(plan.model_id)
    spec = registry.get_spec(plan.model_id)
    tiler = ChunkedTiler(apply, tile, chunk=spec.max_tiles_per_call)

    def one(frame):
        with config.numerics_mode(plan.tier):
            x = img_util.uint2nhwc(frame, dr)
            y = tiler(params, x)
            return img_util.nhwc2uint(np.asarray(y, np.float32), dr)

    frames = iter(frames)
    t0 = time.perf_counter()
    n = 0
    for frame, src in zip(frames, names):
        if warmup and n == 0:
            one(frame)  # compile pass; excluded from the throughput clock
            t0 = time.perf_counter()
        sr = one(frame)
        if save_dir:
            img_util.imsave(sr, os.path.join(save_dir, _out_name(src, n)))
        n += 1
    return n, t0


def _out_name(src: Optional[str], idx: int) -> str:
    return f"{src if src else f'frame_{idx:04d}'}_sr.png"


def main(argv=None):
    ap = argparse.ArgumentParser("NTIRE2022-EfficientSR-TPU serving")
    ap.add_argument("--model_id", type=int, default=None)
    ap.add_argument("--list", action="store_true",
                    help="print the envelope table and exit")
    ap.add_argument("--envelope", default=None, metavar="PATH",
                    help="gated-envelope artifact (default: the shipped "
                         "results/protocol/zoo_sustained_gated.json)")
    src = ap.add_mutually_exclusive_group()
    src.add_argument("--images", default=None, metavar="DIR",
                     help="serve every image file under DIR")
    src.add_argument("--data_dir", default=None, metavar="DIR",
                     help="serve the DIV2K valid LR split under DIR")
    src.add_argument("--synthetic", type=int, default=0, metavar="N",
                     help="serve N random uint8 frames (throughput demo)")
    ap.add_argument("--hw", type=int, nargs=2, default=(256, 256),
                    help="LR shape for --synthetic (default 256 256)")
    ap.add_argument("--save_dir", default=None)
    ap.add_argument("--tier", default=None,
                    choices=["parity", "high", "mixed", "fast", "fast16",
                             "fasthi", "fasthi16"],
                    help="override the plan's numerics tier")
    ap.add_argument("--batch", type=int, default=None,
                    help="override the plan's device batch")
    ap.add_argument("--depth", type=int, default=2,
                    help="max in-flight batches (pipeline depth)")
    ap.add_argument("--no_warmup", action="store_true",
                    help="skip pre-compilation (first batch pays it)")
    args = ap.parse_args(argv)

    if args.list:
        print(list_plans(args.envelope))
        return 0
    if args.model_id is None:
        ap.error("--model_id is required (or --list)")
    if not (args.images or args.data_dir or args.synthetic):
        ap.error("one frame source is required: --images / --data_dir / --synthetic")
    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)

    plan = envelope_mod.plan_for(args.model_id, args.envelope)
    if args.tier:
        plan = envelope_mod.ServingPlan(
            model_id=plan.model_id, name=plan.name, tier=args.tier,
            batch=args.batch or plan.batch, method=plan.method,
            chunk=plan.chunk, ms_per_image=plan.ms_per_image,
            tier_delta_db=None)

    frames, names, count = _frames(args)
    t0 = time.perf_counter()
    if plan.method == "fori":
        served, t0 = _serve_tiled(plan, frames, names, args.save_dir)
    else:
        if args.tier:
            # explicit-tier server: same pinning shape as make_server
            srv = envelope_mod._PinnedServer(
                plan.tier, model_id=plan.model_id,
                max_batch=args.batch or plan.batch, depth=args.depth,
                stage_split=plan.stage_split)
            srv.plan = plan
        else:
            srv = envelope_mod.make_server(args.model_id, path=args.envelope,
                                           max_batch=args.batch, depth=args.depth)
        if not args.no_warmup:
            head = next(frames)
            # warm the EFFECTIVE dispatch batch: with --batch N the server
            # dispatches N, not the plan's (possibly much larger) batch
            srv.warmup(head.shape[:2],
                       batch=min(args.batch or srv.plan.batch, count))
            t0 = time.perf_counter()  # throughput excludes compilation

            def _chain(h, rest):
                yield h
                yield from rest

            frames = _chain(head, frames)
        served = 0
        for sr, src in zip(srv.process_stream(frames), names):
            if args.save_dir:
                img_util.imsave(sr, os.path.join(args.save_dir, _out_name(src, served)))
            served += 1
    dt = time.perf_counter() - t0

    print(json.dumps({
        "model": plan.name, "tier": plan.tier, "batch": args.batch or plan.batch,
        "method": plan.method, "images": served, "seconds": round(dt, 4),
        "images_per_sec": round(served / dt, 3),
        "ms_per_image": round(1e3 * dt / served, 4),
        "tier_delta_db": plan.tier_delta_db,
        "saved": bool(args.save_dir),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
