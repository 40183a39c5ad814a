"""RFESR — team36 "imglhl" (reference models/team36_rfesr.py:219-252).

Weight-normed (folded at port time) attention-gated residual units (AAWRU)
with learnable Scale pairs, EFSA attention (dilated convs, hsigmoid gate),
channel-shuffle fusion with a *shared* reduction conv, chain-only tail.
Note the reference defines `c`, `conv3_`, `conv_f` but never uses them in
forward; they exist in the checkpoint and are ignored here identically.
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks


def _hsigmoid(x):
    return ops.relu6(x + 3.0) / 6.0


def _efsa(p, x, slope: float = 0.05):
    c1_ = ops.conv(p["conv1"], x, padding=0)
    c1 = ops.conv(p["conv2"], c1_, stride=2, padding=0)
    v_max = ops.max_pool2d(c1, 7, 3)
    v_range = ops.leaky_relu(ops.conv(blocks.seq(p["conv_max"], 0), v_max), slope)
    c3 = ops.leaky_relu(ops.conv(blocks.seq(p["conv3"], 0), v_max, dilation=2), slope) + v_range
    c3 = ops.interpolate(c3, size=(x.shape[1], x.shape[2]), mode="bilinear")
    c4 = ops.conv(p["conv4"], c3 + c1_, padding=0)
    return x * _hsigmoid(c4)


def _scale(p, x):
    return x * p["scale"]


def _aawru(p, x, slope: float = 0.01):
    body = p["body"]
    h = ops.conv(blocks.seq(body, 0), x)
    h = ops.leaky_relu(h, slope)
    h = ops.conv(blocks.seq(body, 2), h)
    h = _efsa(blocks.seq(body, 3), h)
    return _scale(p["res_scale"], h) + _scale(p["x_scale"], x)


def _lrffb(p, x):
    x0 = _aawru(p["b0"], x)
    x1 = _aawru(p["b1"], x0) + x0
    x2 = _aawru(p["b2"], x1) + x1
    x3 = _aawru(p["b3"], x2)

    def reduce(a, b):
        return ops.conv(p["reduction"], ops.channel_shuffle(jnp.concatenate([a, b], axis=-1), 2), padding=0)

    res1 = reduce(x3, x2)
    res2 = reduce(res1, x1)
    res = reduce(res2, x0)
    return _scale(p["res_scale"], res) + _scale(p["x_scale"], x)


def rfesr_apply(params, x, *, num_modules: int = 4, upscale: int = 4):
    fea = ops.conv(params["fea_conv"], x)
    h = fea
    for i in range(1, num_modules + 1):
        h = _lrffb(params[f"B{i}"], h)
    h = ops.conv(params["LR_conv"], h) + fea
    return ops.pixel_shuffle(ops.conv(blocks.seq(params["upsampler"], 0), h), upscale)
