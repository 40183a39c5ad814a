#!/usr/bin/env python
"""Stage-split dispatch probe (strict-numerics batch-ceiling lever).

Hypothesis: the remote compile helper's executable-size ceiling tracks the
PER-EXECUTABLE live buffer bytes (docs/RUNTIME_TPU.md, chunked-batch
probe), and for the sub-8x f32 models those bytes are dominated by the
x4-resolution tail. Splitting one forward into TWO executables —

  body:  LR-domain trunk at a LARGE batch (its live bytes are ~16x
         smaller per image than the tail's, so batch 64-128 compiles
         where the full model 500s at 16)
  tail:  the x4 upsampler over CHUNKS of the body output, dispatched
         back-to-back (HBM-bound, so chunk-level dispatch costs little;
         the device queue pipelines body and tail dispatches alike)

— keeps strict f32 numerics (identical math, no reduced-precision tier)
while letting the compute-heavy body run at a utilization-efficient
batch. Output-exactness is asserted on the first iteration.

Measured arms per model:
  full_msimg  — the plain forward at --batch (chain timing; the shipped
                sustained methodology, for same-process comparability)
  split_msimg — body at --batch + tail at --chunk, same chain timing

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


def _split_33(params):
    """m_RFDN (models/m_rfdn.py): body = fea/B1..B4/c/LR_conv(+fea),
    tail = progressive upsampler + conv_last."""
    import jax.numpy as jnp

    from ntire2022_esr_tpu import ops
    from ntire2022_esr_tpu.models import blocks
    from ntire2022_esr_tpu.models.m_rfdn import _m_rfdb
    from ntire2022_esr_tpu.ops.fused import upconv_nearest2

    def body(p, x):
        fea = ops.conv(p["fea_conv"], x)
        outs, h = [], fea
        for i in range(1, 5):
            h = _m_rfdb(p[f"B{i}"], h)
            outs.append(h)
        h = ops.leaky_relu(ops.conv(blocks.seq(p["c"], 0),
                                    jnp.concatenate(outs, axis=-1), padding=0), 0.05)
        return ops.conv(p["LR_conv"], h) + fea

    def pa(p, v):
        return v * ops.sigmoid(ops.conv(p["conv"], v, padding=0))

    def tail(p, h, x_lr):
        h = upconv_nearest2(p["upconv1"], h)
        h = ops.leaky_relu(pa(p["att1"], h), 0.2)
        h = ops.leaky_relu(ops.conv(p["HRconv1"], h), 0.2)
        h = upconv_nearest2(p["upconv2"], h)
        h = ops.leaky_relu(pa(p["att2"], h), 0.2)
        h = ops.leaky_relu(ops.conv(p["HRconv2"], h), 0.2)
        return ops.conv(p["conv_last"], h)

    return body, tail


def _split_27(params):
    """LWFANet (models/misc_conv.py): body = conv_first/10xLWFA/conv_body/
    conv_L, tail = 2x fused upconv + conv_hr + conv_last."""
    from ntire2022_esr_tpu import ops
    from ntire2022_esr_tpu.models import blocks
    from ntire2022_esr_tpu.models.misc_conv import _lwfa
    from ntire2022_esr_tpu.ops.fused import upconv_nearest2

    def body(p, x):
        feat = ops.conv(p["conv_first"], x)
        h = feat
        for i in range(10):
            h = _lwfa(blocks.seq(p["body"], i), h, 0.2)
        feat = feat + ops.conv(p["conv_body"], h)
        return ops.conv(p["conv_L"], feat, padding=0)

    def tail(p, feat, x_lr):
        feat2 = ops.leaky_relu(upconv_nearest2(p["conv_up1"], feat), 0.2)
        feat2 = ops.leaky_relu(upconv_nearest2(p["conv_up2"], feat2), 0.2)
        feat2 = ops.leaky_relu(ops.conv(p["conv_hr"], feat2), 0.2)
        return ops.conv(p["conv_last"], feat2)

    return body, tail


def _split_28(params):
    """NASNetBN (models/nasnetbn.py): body = conv_first + NAS trunk,
    tail = 2x pixel-shuffle upconv + HRconv/conv_last + bilinear residual
    (needs the LR input slice for the residual)."""
    from ntire2022_esr_tpu import ops
    from ntire2022_esr_tpu.models import blocks
    from ntire2022_esr_tpu.models.nasnetbn import (
        ARCH_LIST, _inverted_residual, _res_bn, _res_leaky_bn)

    slope = 0.1

    def body(p, x):
        h = ops.leaky_relu(ops.conv(p["conv_first"], x), slope)
        for i, idx in enumerate(ARCH_LIST):
            bp = blocks.seq(p["recon_trunk"], i)
            if idx in (0, 1):
                h = _inverted_residual(bp, h)
            elif idx == 2:
                h = _res_bn(bp, h)
            else:
                h = _res_leaky_bn(bp, h)
        return h

    def tail(p, h, x_lr):
        h2 = ops.leaky_relu(ops.pixel_shuffle(ops.conv(p["upconv1"], h), 2), slope)
        h2 = ops.leaky_relu(ops.pixel_shuffle(ops.conv(p["upconv2"], h2), 2), slope)
        h2 = ops.leaky_relu(ops.conv(p["HRconv"], h2), slope)
        out = ops.conv(p["conv_last"], h2)
        return out + ops.interpolate(x_lr, scale_factor=4, mode="bilinear")

    return body, tail


def _split_20(params):
    """MobileSR (models/mobilesr.py): body = head + 5 transformer/resblock
    pairs + fuse (all LR-domain, attention-heavy), tail = 2x pixel-shuffle
    upsample + tail conv + global bilinear residual."""
    from ntire2022_esr_tpu import ops
    from ntire2022_esr_tpu.models import blocks
    from ntire2022_esr_tpu.models.mobilesr import _res_block, _transformer

    import jax.numpy as jnp

    def body(p, x):
        x0 = ops.conv(p["head"], x)
        layers = p["body"]["layers"]
        h = x0
        for i in range(5):
            pp = layers[str(i)]
            h = _res_block(pp["1"], _transformer(pp["0"], h))
        return ops.conv(p["fuse"], jnp.concatenate([x0, h], axis=-1))

    def tail(p, h, x_lr):
        up = p["upsapling"]
        h2 = ops.pixel_shuffle(ops.conv(blocks.seq(up, 0), h, padding=0), 2)
        h2 = ops.pixel_shuffle(ops.conv(blocks.seq(up, 2), h2, padding=0), 2)
        h2 = ops.leaky_relu(h2, 0.2)
        h2 = ops.conv(p["tail"], h2)
        return h2 + ops.interpolate(x_lr, scale_factor=4, mode="bilinear")

    return body, tail


def _split_30(params):
    """SCET (models/scet.py): body = conv3 + 16x SCPA + transformer (LR),
    tail = both pixel-shuffle heads. The tail needs BOTH the transformer
    output and the head-conv output, so body returns their concat."""
    from ntire2022_esr_tpu import ops
    from ntire2022_esr_tpu.models.scet import _scpa, _transformer_block

    import jax.numpy as jnp

    def body(p, x):
        h = ops.conv(p["conv3"], x)
        p1 = p["path1"]
        h1 = h
        for i in range(16):
            h1 = _scpa(p1["0"]["arr"][str(i)], h1)
        h1 = _transformer_block(p1["1"]["arr"]["0"], h1)
        return jnp.concatenate([h1, h], axis=-1)

    def tail(p, hh, x_lr):
        c = hh.shape[-1] // 2
        h1, h = hh[..., :c], hh[..., c:]
        p1 = p["path1"]
        h1 = ops.conv(p1["2"], h1)
        h1 = ops.pixel_shuffle(h1, 4)
        h1 = ops.conv(p1["4"], h1)
        h2 = ops.pixel_shuffle(h, 4)
        h2 = ops.conv(p["path2"]["1"], h2)
        return h1 + h2

    return body, tail


def _split_09(params):
    """IMDTN (models/imdtn.py): body = flip-pad + fea/IMDTB/c/LR_conv(+fea)
    (the transformer-heavy LR trunk), tail = upsampler conv + x4
    pixel-shuffle + crop back to 4x the LR input size."""
    from ntire2022_esr_tpu import ops
    from ntire2022_esr_tpu.models import blocks
    from ntire2022_esr_tpu.models.imdtn import _imdtb

    import jax.numpy as jnp

    def body(p, x):
        n, h_old, w_old, _ = x.shape
        h_pad = (h_old // 6 + 1) * 6 - h_old
        w_pad = (w_old // 6 + 1) * 6 - w_old
        x = jnp.concatenate([x, jnp.flip(x, axis=1)], axis=1)[:, : h_old + h_pad, :, :]
        x = jnp.concatenate([x, jnp.flip(x, axis=2)], axis=2)[:, :, : w_old + w_pad, :]
        fea = ops.conv(p["fea_conv"], x)
        dc = fea.shape[-1] // 4
        outs, h = [], fea
        for i in range(1, 4):
            h = _imdtb(p[f"IMDTB{i}"], h, dc)
            outs.append(h)
        h = ops.leaky_relu(ops.conv(blocks.seq(p["c"], 0),
                                    jnp.concatenate(outs, axis=-1), padding=0), 0.05)
        return ops.conv(p["LR_conv"], h) + fea

    def tail(p, h, x_lr):
        out = ops.pixel_shuffle(ops.conv(blocks.seq(p["upsampler"], 0), h), 4)
        return out[:, : x_lr.shape[1] * 4, : x_lr.shape[2] * 4, :]

    return body, tail


SPLITS = {33: _split_33, 27: _split_27, 28: _split_28,
          20: _split_20, 30: _split_30, 9: _split_09}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="33,27,28")
    ap.add_argument("--batch", type=int, default=64,
                    help="body batch for the split arm")
    ap.add_argument("--chunk", type=int, default=8,
                    help="tail chunk for the split arm (must divide batch)")
    ap.add_argument("--full-batch", type=int, default=8,
                    help="batch for the plain-forward reference arm")
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
    from ntire2022_esr_tpu.harness import registry
    from ntire2022_esr_tpu.harness.profiling import chain_timer, fence, require_device

    require_device()

    config.set_mode(args.mode)
    results = {}
    if os.path.exists(args.out):
        results = json.load(open(args.out))

    rng = np.random.RandomState(0)
    for mid in [int(m) for m in args.models.split(",")]:
        apply, params, name, dr, _ = registry.build_model(mid)
        params = jax.device_put(params)
        body, tail = SPLITS[mid](params)
        n_chunks = args.batch // args.chunk

        # split-arm chain step: one body dispatch + n_chunks tail dispatches
        body_j = jax.jit(lambda p, a, i: body(p, a * (1.0 + 1e-6 * i)))
        def tail_chunk(p, h, x, c):
            hs = jax.lax.dynamic_slice_in_dim(h, c * args.chunk, args.chunk, 0)
            xs = jax.lax.dynamic_slice_in_dim(x, c * args.chunk, args.chunk, 0)
            return jnp.sum(tail(p, hs, xs))
        tail_j = jax.jit(tail_chunk, static_argnums=())

        x = jnp.asarray(rng.rand(args.batch, args.size, args.size, 3)
                        .astype(np.float32) * dr)

        # exactness: split == plain forward on the first chunk
        small = x[: args.chunk]
        ref = jax.jit(lambda p, a: apply(p, a))(params, small)
        h0 = body_j(params, x, jnp.float32(0.0))
        got = tail(params, jax.lax.dynamic_slice_in_dim(h0, 0, args.chunk, 0),
                   jax.lax.dynamic_slice_in_dim(x, 0, args.chunk, 0))
        err = float(jnp.max(jnp.abs(ref - got)))
        # parity mode is bit-class exact; in reduced-precision modes the
        # executable boundary changes XLA fusion, so identical math can
        # differ at the mode's own rounding level (observed 4e-3 on
        # MobileSR's bf16-score attention in `high`) — gate at a level
        # that still catches mis-wiring (which errs at O(0.1-1))
        tol = (1e-4 if args.mode == "parity" else 2e-2) * max(dr, 1.0)
        assert err < tol, f"{name}: split mismatch {err}"

        # warm both executables, then chain-time reps of (body + tails)
        fence(tail_j(params, h0, x, jnp.int32(0)))
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            acc = None
            for r in range(args.reps):
                h = body_j(params, x, jnp.float32(r))
                for c in range(n_chunks):
                    acc = tail_j(params, h, x, jnp.int32(c))
            fence(acc)
            times.append(time.perf_counter() - t0)
        split_ms = sorted(times)[len(times) // 2] * 1e3 / args.reps / args.batch

        # reference arm: plain forward at --full-batch, same chain timing
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
        print(f"{name}: full {full_ms:.2f} @ {args.full_batch} vs split "
              f"{split_ms:.2f} ms/img @ body {args.batch}/chunk {args.chunk} "
              f"(exact to {err:.2e})", flush=True)
        json.dump(results, open(args.out, "w"), indent=1)


if __name__ == "__main__":
    main()
