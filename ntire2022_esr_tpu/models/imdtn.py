"""IMDTN — team09 "ZLZ" (reference models/team09_imdtn/architecture.py:19-59).

IMD grouped-conv distillation + vendored SwinIR RSTB transformer (window 6,
2 heads, pre-norm blocks with relative bias + shift masks). The net
flip-pads the input to a multiple of 6 (flip-concat then crop,
architecture.py:39-43) and crops the x4 output back.
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks, swin

SLOPE = 0.05


def _rstb(p, x, num_heads: int = 2, ws: int = 6, depth: int = 2):
    """Residual Swin block on NHWC (network_swinir.py:437-516, no downsample)."""
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    for i in range(depth):
        shift = 0 if i % 2 == 0 else ws // 2
        tokens = swin.swin_block(
            p["residual_group"]["blocks"][str(i)], tokens, (h, w), num_heads, ws, shift,
            pre_norm=True, site="imdtn",
        )
    return tokens.reshape(b, h, w, c) + x


def _imdtb(p, x, dc: int):
    """The reference's LeakyReLU is *inplace* (architecture.py:11), so the
    residual adds out_c2 = c2(r1) + out_c1 see the already-activated out_c1
    — replicate that by adding the post-activation tensors."""
    inp = x
    a1 = ops.leaky_relu(ops.channel_shuffle(ops.conv(p["c1"], x, groups=4) + x, 4), SLOPE)
    d1, r1 = jnp.split(a1, [dc], axis=-1)
    a2 = ops.leaky_relu(ops.channel_shuffle(ops.conv(p["c2"], r1, groups=4) + a1, 4), SLOPE)
    d2, r2 = jnp.split(a2, [dc], axis=-1)
    a3 = ops.leaky_relu(ops.channel_shuffle(ops.conv(p["c3"], r2, groups=4) + a2, 4), SLOPE)
    d3, r3 = jnp.split(a3, [dc], axis=-1)
    c4 = ops.conv(p["c4"], r3)
    out = jnp.concatenate([d1, d2, d3, c4], axis=-1)
    return _rstb(p["transformer"], out) + inp


def imdtn_body(params, x, *, num_modules: int = 3):
    """Flip-pad to a multiple of 6 + fea/IMDTB/c/LR_conv(+fea) — the
    transformer-heavy LR trunk. Body/tail seam = the stage-split dispatch
    boundary (harness/stagesplit.py)."""
    n, h_old, w_old, c = x.shape
    h_pad = (h_old // 6 + 1) * 6 - h_old
    w_pad = (w_old // 6 + 1) * 6 - w_old
    x = jnp.concatenate([x, jnp.flip(x, axis=1)], axis=1)[:, : h_old + h_pad, :, :]
    x = jnp.concatenate([x, jnp.flip(x, axis=2)], axis=2)[:, :, : w_old + w_pad, :]

    fea = ops.conv(params["fea_conv"], x)
    dc = fea.shape[-1] // 4
    outs = []
    h = fea
    for i in range(1, num_modules + 1):
        h = _imdtb(params[f"IMDTB{i}"], h, dc)
        outs.append(h)
    h = ops.leaky_relu(ops.conv(blocks.seq(params["c"], 0), jnp.concatenate(outs, axis=-1), padding=0), SLOPE)
    return ops.conv(params["LR_conv"], h) + fea


def imdtn_tail(params, h, x_lr, *, upscale: int = 4):
    """Upsampler conv + x4 pixel-shuffle + crop back to 4x the (unpadded)
    LR input size — x_lr supplies the crop shape only."""
    out = ops.pixel_shuffle(ops.conv(blocks.seq(params["upsampler"], 0), h), upscale)
    return out[:, : x_lr.shape[1] * 4, : x_lr.shape[2] * 4, :]


def imdtn_apply(params, x, *, num_modules: int = 3, upscale: int = 4):
    h = imdtn_body(params, x, num_modules=num_modules)
    return imdtn_tail(params, h, x, upscale=upscale)
