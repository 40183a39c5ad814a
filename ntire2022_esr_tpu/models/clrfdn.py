"""CLRFDN — team29 "VAP" (reference models/team29_clrfdn.py:434-476).

Contrastive-loss RFDN in deploy form: the checkpoint ships collapsed
Conv3X3 weights (the train-form LinearBlock's rep_params() fold,
team29_clrfdn.py:221-244, already applied), SiLU activations, no residual
adds in the distillation chain, no LR_conv (out_B + fea directly),
PReLU on the fusion conv.
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks


def _rfdb29(p, x):
    h = x
    distilled = []
    for i in (1, 2, 3):
        d = ops.silu(ops.conv(p[f"c{i}_d"], h, padding=0))
        h = ops.silu(ops.conv(p[f"c{i}_r"]["conv3x3"], h))
        distilled.append(d)
    # reference quirk: c4 is a Conv3X3(act='silu') whose output is passed
    # through self.act AGAIN (team29_clrfdn.py:286 'r_c4 = self.act(self.c4(r_c3))')
    r4 = ops.silu(ops.silu(ops.conv(p["c4"]["conv3x3"], h)))
    out = jnp.concatenate(distilled + [r4], axis=-1)
    return blocks.esa(p["esa"], ops.conv(p["c5"], out, padding=0))


def clrfdn_apply(params, x, *, num_modules: int = 4, upscale: int = 4):
    fea = ops.conv(params["fea_conv"]["conv3x3"], x)
    outs = []
    h = fea
    for i in range(1, num_modules + 1):
        h = _rfdb29(params[f"B{i}"], h)
        outs.append(h)
    h = ops.conv(blocks.seq(params["c"], 0), jnp.concatenate(outs, axis=-1), padding=0)
    h = ops.prelu(h, blocks.seq(params["c"], 1)["weight"])
    h = h + fea
    return ops.pixel_shuffle(ops.conv(blocks.seq(params["upsampler"], 0), h), upscale)
