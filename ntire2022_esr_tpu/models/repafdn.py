"""RePAFDN — team10 (reference models/team10_repafdn/repafdn.py:14-59).

RFDN variant: 3 slim 2-stage distillation blocks (FDB_S, dc=24) + one
standard FDB (all without SRB residual adds — deploy form), pixel attention
(PA) before the long skip, pixelshuffle tail.
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks


def pa(p, x):
    """Pixel attention: sigmoid(1x1 conv) gate (block.py:151-166)."""
    return x * ops.sigmoid(ops.conv(p["conv"], x, padding=0))


def _fdb(p, x, stages: int, slope: float = 0.05):
    h = x
    distilled = []
    for i in range(1, stages + 1):
        d = ops.leaky_relu(ops.conv(p[f"c{i}_d"], h, padding=0), slope)
        h = ops.leaky_relu(ops.conv(p[f"c{i}_r"], h), slope)
        distilled.append(d)
    r4 = ops.leaky_relu(ops.conv(p["c4"], h), slope)
    out = jnp.concatenate(distilled + [r4], axis=-1)
    return blocks.esa(p["esa"], ops.conv(p["c5"], out, padding=0))


def repafdn_apply(params, x, *, upscale: int = 4):
    fea = ops.conv(params["fea_conv"], x)
    b1 = _fdb(params["B1"], fea, 2)
    b2 = _fdb(params["B2"], b1, 2)
    b3 = _fdb(params["B3"], b2, 2)
    b4 = _fdb(params["B4"], b3, 3)
    h = ops.leaky_relu(
        ops.conv(blocks.seq(params["c"], 0), jnp.concatenate([b1, b2, b3, b4], axis=-1), padding=0),
        0.05,
    )
    h = ops.conv(params["LR_conv"], h)
    h = pa(params["pa"], h)
    h = h + fea
    return ops.pixel_shuffle(ops.conv(blocks.seq(params["upsampler"], 0), h), upscale)
