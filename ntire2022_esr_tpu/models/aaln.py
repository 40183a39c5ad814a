"""AALN — team11 "Drinktea" (reference models/team11_aaln/aaln.py:163-214).

Dual-scale attention blocks (DSAB1 + lightsaatt), NCA contrast channel
attention (biased stdv), MeanShift in/out (frozen weights live in the
checkpoint), global bicubic x4 residual computed on the mean-shifted input.
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks


def _stdv_biased(x):
    # statistics stay f32 in the f16 tier: (x - mean)^2 of dr=255-scale
    # activations overflows float16 elementwise (255^2 ~ f16 max) and the
    # spatial sum overflows outright (ops/nn.py f16 guard rationale)
    acc = jnp.float32 if x.dtype == jnp.float16 else x.dtype
    xa = x.astype(acc)
    mean = jnp.mean(xa, axis=(1, 2), keepdims=True)
    var = jnp.sum((xa - mean) ** 2, axis=(1, 2), keepdims=True) / (x.shape[1] * x.shape[2])
    return jnp.sqrt(var).astype(x.dtype)


def _nca(p, x):
    upper = ops.relu(ops.conv(blocks.seq(p["upper_branch"], 1), ops.global_avg_pool(x), padding=0))
    lower = ops.relu(ops.conv(blocks.seq(p["lower_branch"], 0), _stdv_biased(x), padding=0))
    out = ops.sigmoid(ops.conv(blocks.seq(p["fuse"], 0), upper + lower, padding=0))
    return out * x


def _conv_prelu(p, x):
    return ops.prelu(ops.conv(blocks.seq(p, 0), x), blocks.seq(p, 1)["weight"])


def _dsab1(p, x):
    o3 = _conv_prelu(p["conv_3"], x)
    o5 = _conv_prelu(p["conv_5"], o3)
    out = _nca(p["att"], jnp.concatenate([o3, o5], axis=-1))
    return ops.conv(p["conv_1"], out, padding=0) + x


def _lightsaatt(p, x):
    c = x.shape[-1]
    h = ops.prelu(ops.conv(p["d_conv"], x, groups=c), p["act"]["weight"])
    gate = ops.sigmoid(ops.conv(p["p_conv"], h, groups=c))
    return gate * x


def _att_block(p, x):
    s = _dsab1(p["conv_block0"], x)
    l = _dsab1(p["conv_block1"], s)
    out = ops.conv(p["compress"], jnp.concatenate([s, l], axis=-1), padding=0)
    return _lightsaatt(p["att"], out) + x


def aaln_apply(params, x, *, upscale: int = 4):
    x = ops.conv(params["sub_mean"], x, padding=0)
    inp = params["input"]
    h = ops.prelu(ops.conv(blocks.seq(inp, 0), x), blocks.seq(inp, 1)["weight"])
    h = ops.prelu(ops.conv(blocks.seq(inp, 2), h), blocks.seq(inp, 3)["weight"])

    outs = []
    b = h
    for i in range(1, 5):
        b = _att_block(params[f"B{i}"], b)
        outs.append(b)
    lr = ops.conv(params["tail_conv"], jnp.concatenate(outs, axis=-1), padding=0) + h

    up = params["upsample"]
    o = ops.prelu(ops.conv(blocks.seq(up, 0), lr), blocks.seq(up, 1)["weight"])
    o = ops.conv(blocks.seq(up, 2), o, padding=0)
    o = ops.pixel_shuffle(o, upscale)
    sr = ops.conv(params["add_mean"], o, padding=0)
    return sr + ops.interpolate(x, scale_factor=4, mode="bicubic")
