"""MDAN — team23 "ncepu_explorers" (reference models/team23_mdan/mdan.py:327-383).

Weight-normed (folded at port) multi-dilation blocks: ConvBlock/ConvBlockD
= grouped 1x1 -> depthwise 3x3 (dilated for D) -> pointwise 1x1; MIRB1/2/3
two-branch dense ladders; 3 MMFB groups with weighted multi-exit MDAB
heads summed via Scale(0.3/0.3/0.4); MeanShift(rgb_range=3!) and a global
bicubic x4 residual on the mean-shifted input.
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import ops

SLOPE = 0.2


def _conv_block(p, x, dilation: int = 1, groups: int = 3):
    h = ops.conv(p["group_conv"], x, padding=0, groups=groups)
    c = h.shape[-1]
    h = ops.conv(p["depth_conv"], h, dilation=dilation, groups=c)
    return ops.conv(p["point_conv"], h, padding=0)


def _mirb(p, x, dilation: int):
    def pair(i, h):
        a = ops.leaky_relu(_conv_block(p[f"conv3_{i}"], h), SLOPE)
        b = ops.leaky_relu(_conv_block(p[f"convd_{i}"], h, dilation=dilation), SLOPE)
        return jnp.concatenate([a, b], axis=-1)

    h = pair(1, x)
    h = pair(2, h)
    h = pair(3, h)
    return ops.conv(p["conv_last"], h, padding=0) + x


def _mmfb(p, x):
    h = _mirb(p["bs1"], x, 1)
    h = _mirb(p["bs11"], h, 1)
    h = _mirb(p["bs2"], h, 2)
    h = _mirb(p["bs22"], h, 2)
    h = _mirb(p["bs3"], h, 3)
    h = _mirb(p["bs33"], h, 3)
    return h + x


def _mdab(p, x):
    n, h, w, c = x.shape
    x1 = ops.conv(p["tail1"], x, padding=0)
    x2 = _conv_block(p["tail2"], x)
    xc = jnp.concatenate([x1, x2], axis=-1)
    xr = ops.conv(p["conv"], xc, padding=0)
    xa = _conv_block(p["conv3"], xc)
    a1 = ops.softmax(xa, axis=-1)                       # softmax over channels
    a2 = ops.softmax(xa.reshape(n, h * w, c), axis=1).reshape(n, h, w, c)
    out = xr * a1 + xr * a2
    return ops.conv(p["conv_end"], out, padding=0)


def mdan_apply(params, x, *, upscale: int = 4):
    x = ops.conv(params["sub_mean"], x, padding=0)
    x_id = ops.interpolate(x, scale_factor=upscale, mode="bicubic")
    h = ops.leaky_relu(ops.conv(params["conv_first"], x), SLOPE)

    r0 = _mmfb(params["BS1"], h)
    r1 = _mmfb(params["BS2"], r0)
    r2 = _mmfb(params["BS3"], r1)

    o1 = _mdab(params["upb1"], r0) * params["scale1"]["scale"]
    o2 = _mdab(params["upb2"], r1) * params["scale2"]["scale"]
    o3 = _mdab(params["upb3"], r2) * params["scale3"]["scale"]

    out = ops.conv(params["conv_add"], jnp.concatenate([o1, o2, o3], axis=-1), padding=0)
    out = out + h
    out = ops.conv(params["out1"], out)
    out = ops.pixel_shuffle(out, upscale)
    out = out + x_id
    return ops.conv(params["add_mean"], out, padding=0)
