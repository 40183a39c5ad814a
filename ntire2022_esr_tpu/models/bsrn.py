"""BSRN — team18 "XPixel", params/FLOPs-track winner (models/team18_bsrn.py:182-237).

Blueprint-separable convs: every BSConvU is pointwise nn.Linear (natural in
our NHWC layout — the reference permutes NCHW<->NHWC around it) followed by
a depthwise 3x3; GELU activations; learned channel weights ``cw``; input
replicated 4x channel-wise; GELU-free linear distill convs... distills are
GELU'd. ESA uses Linear for 1x1s and GELU in place of ReLU.
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks


def _bsconv(p, x):
    h = ops.linear(p["pw"], x)
    c = h.shape[-1]
    return ops.conv(p["dw"], h, groups=c)


def _esa18(p, x):
    c1_ = ops.linear(p["conv1"], x)
    c1 = ops.conv(p["conv2"], c1_, stride=2, padding=0)
    v_max = ops.max_pool2d(c1, 7, 3)
    v_range = ops.gelu(_bsconv(p["conv_max"], v_max))
    c3 = ops.gelu(_bsconv(p["conv3"], v_range))
    c3 = _bsconv(p["conv3_"], c3)
    c3 = ops.interpolate(c3, size=(x.shape[1], x.shape[2]), mode="bilinear")
    cf = ops.linear(p["conv_f"], c1_)
    c4 = ops.linear(p["conv4"], c3 + cf)
    return x * ops.sigmoid(c4)


def _rfdb18(p, x):
    h = x
    distilled = []
    for i in (1, 2, 3):
        d = ops.gelu(ops.linear(p[f"c{i}_d"], h))
        r = _bsconv(p[f"c{i}_r"], h)
        h = ops.gelu(r + h)
        distilled.append(d)
    r4 = ops.gelu(_bsconv(p["c4"], h))
    out = jnp.concatenate(distilled + [r4], axis=-1)
    out = ops.linear(p["c5"], out)
    out = _esa18(p["esa"], out)
    out = out * p["cw"][0]
    out = ops.linear(p["conv_out"], out)
    return out + x


def bsrn_apply(params, x, *, num_block: int = 5, upscale: int = 4):
    x4 = jnp.concatenate([x, x, x, x], axis=-1)
    fea = _bsconv(params["fea_conv"], x4)
    outs = []
    h = fea
    for i in range(1, num_block + 1):
        h = _rfdb18(params[f"B{i}"], h)
        outs.append(h)
    out_b = ops.gelu(ops.linear(params["c1"], jnp.concatenate(outs, axis=-1)))
    out_lr = _bsconv(params["c2"], out_b) + fea
    tail = params["upsampler"]["upsampleOneStep"]
    return ops.pixel_shuffle(ops.conv(blocks.seq(tail, 0), out_lr), upscale)
