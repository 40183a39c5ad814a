"""MobileSR — team20 "NJUST_ESR" (reference models/team20_mobilesr.py:153-185).

Alternating windowed-MHSA transformers (window 8, pad-to-multiple) and
inverted-residual conv blocks; two-stage PixelShuffle(2)^2 upsample and a
global bilinear x4 residual.
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import config, ops
from ntire2022_esr_tpu.models import blocks
from ntire2022_esr_tpu.ops import attention as attn_ops


def _self_attn(p, x, num_heads: int):
    b, n, c = x.shape
    qkv = ops.linear(p["qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    # The softmax scale is the REFERENCE head_dim (team20_mobilesr.py:9-33,
    # C=40 / 8 heads = 5), derived from the proj weight's out-features so
    # it survives load-time head padding (porter/pad.pad_attention_heads
    # widens q/k/v with zero dims, which must not change the scale).
    scale = (p["proj_out"]["weight"].shape[1] // num_heads) ** -0.5
    out = attn_ops.multi_head_attention(q, k, v, num_heads, scale=scale,
                                        site="mobilesr")
    return ops.linear(p["proj_out"], out)


def _transformer(p, x, num_heads: int = 8, ws: int = 8):
    c = x.shape[-1]
    x = x + ops.conv(p["pos_embed"], x, groups=c)
    b, h, w, _ = x.shape
    shortcut = x
    hn = ops.layer_norm(p["norm1"], x)
    hp, _, _ = attn_ops.pad_to_multiple(hn, ws)
    hp_h, hp_w = hp.shape[1], hp.shape[2]
    windows = attn_ops.window_partition(hp, ws)
    windows = _self_attn(p["attn"], windows, num_heads)
    hp = attn_ops.window_reverse(windows, ws, hp_h, hp_w)
    x = shortcut + hp[:, :h, :w, :]
    mlp = p["mlp"]["fc"]
    mlp_out = ops.linear(blocks.seq(mlp, 2), ops.gelu(ops.linear(blocks.seq(mlp, 0), ops.layer_norm(p["norm2"], x))))
    return x + mlp_out


def _res_block(p, x, slope: float = 0.2):
    net = p["net"]
    h = ops.leaky_relu(ops.conv(blocks.seq(net, 0), x, padding=0), slope)
    h = ops.leaky_relu(ops.conv(blocks.seq(net, 2), h, groups=h.shape[-1]), slope)
    h = ops.conv(blocks.seq(net, 4), h, padding=0)
    return h + x


def mobilesr_body(params, x, *, n_blocks: int = 5, num_heads: int = 8):
    """head + 5 transformer/resblock pairs + fuse (all LR-domain). Body/tail
    seam = the stage-split dispatch boundary (harness/stagesplit.py)."""
    x0 = ops.conv(params["head"], x)
    layers = params["body"]["layers"]
    pair_params = [layers[str(i)] for i in range(n_blocks)]

    def pair(p, v):
        return _res_block(p["1"], _transformer(p["0"], v, num_heads))

    if config.scan_blocks("mobilesr"):
        h = blocks.scan_chain(pair, pair_params, x0)
    else:
        h = x0
        for p in pair_params:
            h = pair(p, h)
    return ops.conv(params["fuse"], jnp.concatenate([x0, h], axis=-1))


def mobilesr_tail(params, h, x_lr, *, upscale: int = 4):
    """2x pixel-shuffle upsample + tail conv + global bilinear residual
    (needs the LR input for the residual)."""
    up = params["upsapling"]
    # the tail conv stays OUTSIDE the reduced-precision scope (see
    # m_rfdn.py): its input keeps the 2-byte tier, the output pixels keep
    # full precision
    with config.hr_tail_scope("mobilesr"):
        h2 = ops.pixel_shuffle(ops.conv(blocks.seq(up, 0), h, padding=0), 2)
        h2 = ops.pixel_shuffle(ops.conv(blocks.seq(up, 2), h2, padding=0), 2)
        h2 = ops.leaky_relu(h2, 0.2)
    h2 = ops.conv(params["tail"], h2)
    # the global bilinear residual stays f32: it carries the base image
    return h2 + ops.interpolate(x_lr, scale_factor=upscale, mode="bilinear")


def mobilesr_apply(params, x, *, n_blocks: int = 5, num_heads: int = 8, upscale: int = 4):
    h = mobilesr_body(params, x, n_blocks=n_blocks, num_heads=num_heads)
    return mobilesr_tail(params, h, x, upscale=upscale)
