"""MSDN — team44 "VMCL_Taobao" (reference models/team44_msdn.py:157-186).

Multi-scale distillation blocks (grouped + dilated convs, SiLU) gated by a
large-kernel VisionAttention (depthwise k7-d3 + k5 + 1x1 on a max-pooled
map, bilinear re-upsample). Internally scales input by 255 and the output
back by 1/255.
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks


def _cb(p, x, **kw):
    """conv_block(act='silu') = Sequential(conv, SiLU)."""
    return ops.silu(ops.conv(blocks.seq(p, 0), x, **kw))


def _vision_attention(p, x, scale: int):
    c1 = ops.conv(p["head"], x, padding=0)
    c2 = ops.max_pool2d(c1, scale * 2 + 1, scale)
    c2 = ops.gelu(c2)
    f = c2.shape[-1]
    lka = p["LKA"]
    c2 = ops.conv(blocks.seq(lka, 0), c2, dilation=3, groups=f)   # k7 d3 depthwise
    c2 = ops.conv(blocks.seq(lka, 1), c2, groups=f)               # k5 depthwise
    c2 = ops.conv(blocks.seq(lka, 2), c2, padding=0)              # 1x1
    c3 = ops.interpolate(c2, size=(x.shape[1], x.shape[2]), mode="bilinear")
    a = ops.sigmoid(ops.conv(p["tail"], c3 + c1, padding=0))
    return x * a


def _msdb(p, x, scale: int):
    d1 = _cb(p["c1_d"], x, padding=0)
    r1 = _cb(blocks.seq(p["c1_r"], 0), x, padding=0)
    r1 = _cb(blocks.seq(p["c1_r"], 1), r1, groups=2)
    d2 = _cb(p["c2_d"], r1, padding=0)
    r2 = _cb(p["c2_r"], r1)
    r3 = _cb(p["c3"], r2, dilation=2)
    out = jnp.concatenate([d1, d2, r3], axis=-1)
    out = ops.conv(p["c4"], out, padding=0)
    return _vision_attention(p["attention"], out, scale)


def msdn_apply(params, x, *, num_modules: int = 3, upscale: int = 4):
    fea = ops.conv(params["fea_conv"], x * 255.0)
    outs = []
    h = fea
    for i in range(num_modules):
        h = _msdb(params["B"][str(i)], h, scale=num_modules - i + 1)
        outs.append(h)
    hc = _cb(blocks.seq(params["C"], 0), jnp.concatenate(outs, axis=-1), padding=0)
    hc = ops.conv(blocks.seq(params["C"], 1), hc) + fea
    return ops.pixel_shuffle(ops.conv(blocks.seq(params["upsampler"], 0), hc), upscale) / 255.0
