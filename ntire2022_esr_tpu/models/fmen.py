"""FMEN — team03, runtime rank 2 (reference models/team03_fmen.py:77-134).

Deploy-form (pre-reparameterized) plain net: head conv -> warmup
(conv + HFAB) -> 4x (BasicBlock + HFAB) -> lr_conv + long skip -> tail.
Module-level shared LeakyReLU(0.1) (team03_fmen.py:6-7).
"""

from __future__ import annotations

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks

SLOPE = 0.1


def _basic_block(p, x):
    """RepConv -> LReLU -> RepConv (team03_fmen.py:21-42)."""
    h = ops.conv(p["conv1"]["rep_conv"], x)
    h = ops.leaky_relu(h, SLOPE)
    return ops.conv(p["conv2"]["rep_conv"], h)


def _hfab(p, x, up_blocks: int):
    """squeeze -> act -> BasicBlocks -> act -> excitate -> sigmoid gate."""
    out = ops.leaky_relu(ops.conv(p["squeeze"], x), SLOPE)
    for i in range(up_blocks):
        out = _basic_block(blocks.seq(p["convs"], i), out)
    out = ops.leaky_relu(out, SLOPE)
    out = ops.conv(p["excitate"], out)
    return ops.sigmoid(out) * x


def fmen_apply(params, x, *, down_blocks: int = 4, up_blocks=(2, 1, 1, 1, 1), upscale: int = 4):
    h0 = ops.conv(params["head"], x)
    h = ops.conv(blocks.seq(params["warmup"], 0), h0)
    h = _hfab(blocks.seq(params["warmup"], 1), h, up_blocks[0])
    for i in range(down_blocks):
        h = _basic_block(blocks.seq(params["basic_blocks"], i), h)
        h = _hfab(blocks.seq(params["hfabs"], i), h, up_blocks[i + 1])
    h = ops.conv(params["lr_conv"], h)
    h = h + h0
    return ops.pixel_shuffle(ops.conv(blocks.seq(params["tail"], 0), h), upscale)
