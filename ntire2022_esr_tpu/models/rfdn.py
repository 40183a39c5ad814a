"""RFDN baseline, AIM 2020 winner (reference models/rfdn_baseline/RFDN.py:10-44).

The "RFDN skeleton" shared by ~20 zoo entries: fea_conv -> 4x RFDB ->
1x1 concat-fuse -> LR_conv + long skip -> pixelshuffle x4 tail.
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks


def rfdn_apply(params, x, *, num_modules: int = 4, upscale: int = 4,
               residual: bool = True, esa_fn=None, block_fn=None,
               dilations=(1, 1, 1)):
    """RFDN skeleton. Also covers graph-identical zoo entries:

    - id 6 (team06 v1): exact copy of the baseline graph
    - id 22 (team22 RFDN40): nf=40, train-time-reparameterized weights
      already collapsed in the checkpoint
    - id 8 (team08 SFDN): ``residual=False, esa_fn=blocks.esa_no_f``
    - id 40 (team40 pruned): ``residual=False``
    """
    fea = ops.conv(params["fea_conv"], x)
    outs = []
    h = fea
    for i in range(1, num_modules + 1):
        if block_fn is not None:
            h = block_fn(params[f"B{i}"], h)
        else:
            h = blocks.rfdb(params[f"B{i}"], h, residual=residual, esa_fn=esa_fn,
                            dilations=dilations)
        outs.append(h)
    h = ops.leaky_relu(ops.conv(blocks.seq(params["c"], 0), jnp.concatenate(outs, axis=-1), padding=0), 0.05)
    h = ops.conv(params["LR_conv"], h) + fea
    return ops.pixel_shuffle(ops.conv(blocks.seq(params["upsampler"], 0), h), upscale)
