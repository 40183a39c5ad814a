"""PLAINRFDN — team05 "NEESR", runtime rank 3 (deploy-form ECB reparam).

Reference: models/team05_efdn/plainsr.py:5-37 + plainblock.py. RFDN-shaped
but chain-only: distillation convs without residual adds, 3x3 convs are
collapsed ECB `Conv3X3` modules (key `.conv3x3`), dc=10, and a distinct ESA
(maxpool k7 s7 p1, two parallel 3x3 branches concat-fused).
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks


def esa_plain(p, x):
    """plainblock.py ESA: pool k7 s7 p1; conv_2/conv_3 parallel + conv_23."""
    c1_ = ops.conv(p["conv1"], x, padding=0)
    v_max = ops.max_pool2d(c1_, 7, 7, padding=1)
    c2 = ops.relu(ops.conv(p["conv_2"], v_max))
    c3 = ops.relu(ops.conv(p["conv_3"], v_max))
    c3 = ops.conv(p["conv_23"], jnp.concatenate([c2, c3], axis=-1))
    c3 = ops.interpolate(c3, size=(x.shape[1], x.shape[2]), mode="bilinear")
    cf = ops.conv(p["conv_f"], c1_, padding=0)
    c4 = ops.conv(p["conv4"], c3 + cf, padding=0)
    return x * ops.sigmoid(c4)


def _rfdb_plain(p, x, slope: float = 0.05):
    d1 = ops.leaky_relu(ops.conv(p["c1_d"], x, padding=0), slope)
    r1 = ops.leaky_relu(ops.conv(p["c1_r"]["conv3x3"], x), slope)
    d2 = ops.leaky_relu(ops.conv(p["c2_d"], r1, padding=0), slope)
    r2 = ops.leaky_relu(ops.conv(p["c2_r"]["conv3x3"], r1), slope)
    d3 = ops.leaky_relu(ops.conv(p["c3_d"], r2, padding=0), slope)
    r3 = ops.leaky_relu(ops.conv(p["c3_r"]["conv3x3"], r2), slope)
    r4 = ops.leaky_relu(ops.conv(p["c4"]["conv3x3"], r3), slope)
    out = jnp.concatenate([d1, d2, d3, r4], axis=-1)
    return esa_plain(p["esa"], ops.conv(p["c5"], out, padding=0))


def plainrfdn_apply(params, x, *, num_modules: int = 4, upscale: int = 4):
    fea = ops.conv(params["fea_conv"], x)
    h = fea
    for i in range(1, num_modules + 1):
        h = _rfdb_plain(params[f"B{i}"], h)
    h = ops.conv(params["LR_conv"], h) + fea
    return ops.pixel_shuffle(ops.conv(blocks.seq(params["upsampler"], 0), h), upscale)
