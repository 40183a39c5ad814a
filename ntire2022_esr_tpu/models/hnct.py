"""HNCT — team12 "mju_mnu" (reference models/team12_hnct/HNCT.py:9-38).

Hybrid CNN+Transformer: 4x STB = Spartial_Attention (7x7 conv on avg/max
maps) -> 2-layer Swin (heads=5, window 8, shifted; reflect-pads to x8,
no pre-norms) -> conv3x3 + ESA; RFDN-style fuse and tail.
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks, swin


def _spartial_attention(p, x):
    layer = p["_Spartial_Attention__layer"]  # python name mangling in the reference
    avg = jnp.mean(x, axis=-1, keepdims=True)
    mx = jnp.max(x, axis=-1, keepdims=True)
    mask = ops.sigmoid(ops.conv(blocks.seq(layer, 0), jnp.concatenate([avg, mx], axis=-1)))
    return x * mask


def _swin_t(p, x, num_heads: int = 5, ws: int = 8, depth: int = 2):
    """SwinT module (SwinT.py:13-80): reflect pad to x8, LayerNorm patch
    embed, two blocks (shift 0 then ws//2), crop back."""
    layer = blocks.seq(p["transformer_body"], 0)
    b, h, w, c = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect") if (pad_h or pad_w) else x
    hp, wp = xp.shape[1], xp.shape[2]
    tokens = xp.reshape(b, hp * wp, c)
    tokens = ops.layer_norm(layer["patch_embed"]["norm"], tokens)
    for i in range(depth):
        shift = 0 if i % 2 == 0 else ws // 2
        tokens = swin.swin_block(layer["blocks"][str(i)], tokens, (hp, wp), num_heads, ws,
                                 shift, site="hnct")
    xp = tokens.reshape(b, hp, wp, c)
    return xp[:, :h, :w, :]


def _stb(p, x):
    h = _spartial_attention(p["sparatt"], x)
    h = _swin_t(p["swinT"], h)
    return blocks.esa(p["esa"], ops.conv(p["c1_r"], h))


def hnct_apply(params, x, *, num_modules: int = 4, upscale: int = 4):
    fea = ops.conv(params["fea_conv"], x)
    outs = []
    h = fea
    for i in range(1, num_modules + 1):
        h = _stb(params[f"B{i}"], h)
        outs.append(h)
    h = ops.leaky_relu(ops.conv(blocks.seq(params["c"], 0), jnp.concatenate(outs, axis=-1), padding=0), 0.05)
    h = ops.conv(params["LR_conv"], h) + fea
    return ops.pixel_shuffle(ops.conv(blocks.seq(params["upsampler"], 0), h), upscale)
