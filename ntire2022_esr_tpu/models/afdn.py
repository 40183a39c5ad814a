"""AFDN — team15 "NJUST_RESTORATION" (reference models/team15_afdn/AFDN.py:11-56).

RFDB whose ESA is replaced by ATB: features split in half, each half gated
by sigmoid(conv(lrelu(conv(.)))) (down branch applies ATB_22 then ATB_21).
The reference's `.cuda()`-and-dummy-forward warm_model constructor quirk is
a host-side artifact and intentionally not replicated.
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks


def _atb(p, x, slope: float = 0.1):
    half = x.shape[-1] // 2
    up, down = x[..., :half], x[..., half:]
    g_up = ops.sigmoid(ops.conv(p["ATB_12"], ops.leaky_relu(ops.conv(p["ATB_11"], up), slope)))
    g_down = ops.sigmoid(ops.conv(p["ATB_21"], ops.leaky_relu(ops.conv(p["ATB_22"], down), slope)))
    return jnp.concatenate([up * g_up, down * g_down], axis=-1)


def _afdb(p, x, slope: float = 0.05):
    h = x
    distilled = []
    for i in (1, 2, 3):
        d = ops.leaky_relu(ops.conv(p[f"c{i}_d"], h, padding=0), slope)
        h = ops.leaky_relu(ops.conv(p[f"c{i}_r"], h) + h, slope)
        distilled.append(d)
    r4 = ops.leaky_relu(ops.conv(p["c4"], h), slope)
    out = jnp.concatenate(distilled + [r4], axis=-1)
    return _atb(p["ATB"], ops.conv(p["c5"], out, padding=0))


def afdn_apply(params, x, *, num_modules: int = 4, upscale: int = 4):
    fea = ops.conv(params["fea_conv"], x)
    outs = []
    h = fea
    for i in range(1, num_modules + 1):
        h = _afdb(params[f"B{i}"], h)
        outs.append(h)
    h = ops.leaky_relu(ops.conv(blocks.seq(params["c"], 0), jnp.concatenate(outs, axis=-1), padding=0), 0.05)
    h = ops.conv(params["LR_conv"], h) + fea
    return ops.pixel_shuffle(ops.conv(blocks.seq(params["upsampler"], 0), h), upscale)
