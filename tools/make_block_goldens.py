#!/usr/bin/env python
"""Generate torch goldens for the shared block library's completion surface.

Builds each reference basicblock.py block the 42-model zoo does NOT execute
(RRDB, RCAB/RCAGroup, NonLocalBlock2D, ConditionalBatchNorm2d, the
mode-string conv factory, up/downsampler variants, CFRB, ResBlock) with a
seeded random init, runs a forward on a seeded input, ports the state_dict
through our porter, and stores (params, input, output) per block under
tests/goldens/blocks.npz. tests/test_blocks_library.py then validates the
JAX implementations torch-free.

Usage: python tools/make_block_goldens.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("NTIRE_REFERENCE", "/root/reference")
OUT = os.path.join(REPO, "tests", "goldens", "blocks.npz")


def main():
    sys.path.insert(0, REPO)
    sys.path.insert(0, REFERENCE)
    import torch

    from models import basicblock as B  # reference, read-only

    from ntire2022_esr_tpu import porter

    torch.manual_seed(0)
    rng = np.random.RandomState(0)

    def x_of(c, h=12, w=10):
        return rng.randn(2, c, h, w).astype(np.float32)

    cases = {}

    def add(name, module, x, extra_inputs=(), conv_transpose_keys=(),
            raw_keys=(), meta=None):
        module = module.float().eval()
        with torch.no_grad():
            y = module(torch.from_numpy(x), *[torch.from_numpy(e) for e in extra_inputs])
        sd = {k: v.detach().numpy() for k, v in module.state_dict().items()}
        flat = porter.port_state_dict(
            sd, conv_transpose_keys=conv_transpose_keys, raw_keys=raw_keys)
        cases[name] = {
            "x": x, "y": y.numpy(),
            "extra": list(extra_inputs),
            "params": dict(flat),
            "meta": meta or {},
        }
        print(f"{name}: x {x.shape} -> y {tuple(y.shape)}")

    # mode-string conv factory: conv+BN+ReLU, conv+IN+LeakyReLU, pool chains
    add("mode_CBR", B.conv(8, 16, mode="CBR"), x_of(8))
    add("mode_CIL", B.conv(8, 16, mode="CIL", negative_slope=0.1), x_of(8))
    add("mode_C2R", B.conv(8, 12, mode="C2R"), x_of(8))
    add("mode_MC", B.conv(8, 8, kernel_size=2, stride=2, mode="M"), x_of(8, 12, 12))
    add("mode_AC", B.conv(8, 8, kernel_size=2, stride=2, mode="A"), x_of(8, 12, 12))

    # ResBlock / ConcatBlock / ShortcutBlock
    add("resblock_CRC", B.ResBlock(8, 8, mode="CRC"), x_of(8))
    add("shortcut", B.ShortcutBlock(B.conv(8, 8, mode="C")), x_of(8))
    add("concat", B.ConcatBlock(B.conv(8, 8, mode="C")), x_of(8))

    # ConditionalBatchNorm2d (give it non-trivial running stats)
    cbn = B.ConditionalBatchNorm2d(8, num_classes=4)
    cbn.bn.running_mean.normal_(0, 0.5)
    cbn.bn.running_var.uniform_(0.5, 2.0)
    y_cls = np.array([1, 3])
    add("cbn", cbn, x_of(8), extra_inputs=(y_cls,), raw_keys=(r"embed",),
        meta={"classes": y_cls})

    # CFRB (in=out=16, d_rate 0.5)
    # ESA inside needs >= ~20px after its stride-2 (maxpool 7s3)
    add("cfrb", B.CFRB(16, 16, d_rate=0.5), x_of(16, 24, 22))

    # RCAB / RCAGroup (small nb)
    add("rcab", B.RCABlock(8, 8, reduction=4), x_of(8))
    add("rcagroup", B.RCAGroup(8, 8, reduction=4, nb=3), x_of(8))

    # RDB_5C / RRDB
    add("rdb5c", B.ResidualDenseBlock_5C(8, gc=4), x_of(8))
    add("rrdb", B.RRDB(8, gc=4), x_of(8))

    # upsamplers
    add("up_pixelshuffle_2R", B.upsample_pixelshuffle(8, 4, mode="2R"), x_of(8))
    add("up_upconv_3R", B.upsample_upconv(8, 4, mode="3R"), x_of(8))
    add("up_convtranspose_2R", B.upsample_convtranspose(8, 4, mode="2R"),
        x_of(8), conv_transpose_keys=(r".*",))

    # downsamplers
    add("down_strideconv_2R", B.downsample_strideconv(8, 8, mode="2R"), x_of(8, 12, 12))
    add("down_maxpool_2R", B.downsample_maxpool(8, 8, mode="2R"), x_of(8, 12, 12))
    add("down_avgpool_2R", B.downsample_avgpool(8, 8, mode="2R"), x_of(8, 12, 12))

    # NonLocalBlock2D, plain and maxpool-downsampled
    add("nonlocal", B.NonLocalBlock2D(8, act_mode="B"), x_of(8, 8, 6))
    add("nonlocal_ds", B.NonLocalBlock2D(8, act_mode="B", downsample=True,
                                         downsample_mode="maxpool"), x_of(8, 8, 6))

    # CLRFDN LinearBlock analytic fold (team29_clrfdn.py:221-244): store the
    # train-form params, the reference's own folded RK/RB (ported to HWIO),
    # and a forward golden — tests/test_porter.py checks porter.reparam
    # reproduces the fold bit-for-bit and the composition property.
    from models.team29_clrfdn import LinearBlock

    for tag, act, idt in (("linear", "linear", False),
                          ("idt", "linear", True),
                          ("prelu", "prelu", False)):
        lb = LinearBlock(6, 6, 12, act_type=act, with_idt=idt).float().eval()
        with torch.no_grad():
            rk, rb = lb.rep_params()
        x = x_of(6)
        with torch.no_grad():
            y = lb(torch.from_numpy(x))
        sd = {k: v.detach().numpy() for k, v in lb.state_dict().items()}
        flat = porter.port_state_dict(sd)
        cases[f"linearblock_{tag}"] = {
            "x": x, "y": y.numpy(), "extra": [],
            "params": dict(flat, **{
                "rep/weight": rk.numpy().transpose(2, 3, 1, 0).copy(),
                "rep/bias": rb.numpy().copy(),
            }),
            "meta": {},
        }
        print(f"linearblock_{tag}: folded RK {tuple(rk.shape)}")

    # flatten to npz: <case>/<field>, params under <case>/p/<key>
    payload = {}
    for name, c in cases.items():
        payload[f"{name}/x"] = c["x"]
        payload[f"{name}/y"] = c["y"]
        for i, e in enumerate(c["extra"]):
            payload[f"{name}/extra{i}"] = e
        for k, v in c["params"].items():
            payload[f"{name}/p/{k}"] = v
    np.savez_compressed(OUT, **payload)
    print(f"wrote {OUT} ({len(cases)} cases)")


if __name__ == "__main__":
    main()
