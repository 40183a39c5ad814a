"""PRRN — team16 "GDUT_SR" (reference models/team16_prrn/PRRN.py:93-213).

16 two-branch PRRBs (pixel-attention branch + plain conv branch, SiLU) with
second channel attention, each followed by a concat-with-stem 1x1 re-fusion.
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks


def _pa(p, x):
    return x * ops.sigmoid(ops.conv(p["conv"], x, padding=0))


def _ca_tf(p, x):
    return x * ops.sigmoid(ops.conv(p["conv1"], ops.global_avg_pool(x), padding=0))


def _pa_tf(p, x):
    y1 = ops.sigmoid(ops.conv(p["conv1"], _pa(p["pa"], x) + _ca_tf(p["ca"], x), padding=0))
    y2 = ops.conv(p["conv2"], x)
    return y1 * y2


def _prrb(p, x):
    a = ops.silu(ops.conv(p["conv1_1"], x, padding=0))
    b = ops.silu(ops.conv(p["conv1_2"], x, padding=0))

    attn = ops.sigmoid(_pa_tf(p["pgam_1"], a))
    a_end = ops.silu(ops.conv(p["conv3_2"], attn * ops.conv(p["conv3_1"], a)))
    b_end = ops.silu(ops.conv(p["conv3_3"], b))

    mid = ops.silu(ops.conv(p["conv1_end"], jnp.concatenate([a_end, b_end], axis=-1), padding=0))
    return _ca_tf(p["sca"], mid) + x


def prrn_apply(params, x, *, n_blocks: int = 16, upscale: int = 4):
    stem = ops.conv(params["conv_first"], x)
    h = stem
    for i in range(1, n_blocks + 1):
        fea = _prrb(params[f"scpa_v{i}"], h)
        h = ops.conv(params[f"conv1_mid_{i}"], jnp.concatenate([stem, fea], axis=-1), padding=0)
    h = ops.conv(params["conv3_end"], h) + stem
    return ops.pixel_shuffle(ops.conv(blocks.seq(params["upsampler"], 0), h), upscale)
