"""IMDN baseline (reference models/imdn_baseline.py:32-65, model ids -1, 26).

Graph: head conv3x3 -> ShortcutBlock(nb x IMDBlock + conv3x3) -> conv(3*16)
+ PixelShuffle(4). Param tree mirrors the torch Sequential naming:
model.0 (head), model.1.sub.{0..nb-1} (IMD blocks), model.1.sub.{nb}
(body tail conv), model.2 (upsample conv), model.3 (paramless shuffle).
"""

from __future__ import annotations

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks


def imdn_apply(params, x, *, nc: int = 64, nb: int = 8, upscale: int = 4,
               negative_slope: float = 0.05):
    p = params["model"]
    d_nc = nc // 4
    head = ops.conv(blocks.seq(p, 0), x)
    h = head
    sub = p["1"]["sub"]
    for i in range(nb):
        h = blocks.imd_block(blocks.seq(sub, i), h, d_nc, negative_slope)
    h = ops.conv(blocks.seq(sub, nb), h)
    h = head + h
    return ops.pixel_shuffle(ops.conv(blocks.seq(p, 2), h), upscale)
