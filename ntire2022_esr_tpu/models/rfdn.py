"""RFDN baseline, AIM 2020 winner (reference models/rfdn_baseline/RFDN.py:10-44).

The "RFDN skeleton" shared by ~20 zoo entries: fea_conv -> 4x RFDB ->
1x1 concat-fuse -> LR_conv + long skip -> pixelshuffle x4 tail.
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks


def rfdn_apply(params, x, *, num_modules: int = 4, upscale: int = 4):
    fea = ops.conv(params["fea_conv"], x)
    outs = []
    h = fea
    for i in range(1, num_modules + 1):
        h = blocks.rfdb(params[f"B{i}"], h)
        outs.append(h)
    h = ops.leaky_relu(ops.conv(blocks.seq(params["c"], 0), jnp.concatenate(outs, axis=-1), padding=0), 0.05)
    h = ops.conv(params["LR_conv"], h) + fea
    return ops.pixel_shuffle(ops.conv(blocks.seq(params["upsampler"], 0), h), upscale)
