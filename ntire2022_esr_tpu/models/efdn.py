"""EFDN — team01 "NKU-ESR" (reference models/team01_efdn.py:88-121).

Deploy-form edge-enhanced distillation: EDBB blocks collapsed to plain
3x3+PReLU, Cells with 4-branch 1x1 distill-fuse + ESA, cross-cell fusion
convs, clamp(0,1) output.
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks


def _edbb(p, x):
    return ops.prelu(ops.conv(p["rep_conv"], x), p["act"]["weight"])


def _conv1x1_prelu(p, x):
    return ops.prelu(ops.conv(p["conv1x1"], x, padding=0), p["act"]["weight"])


def _cell(p, x):
    out1 = _conv1x1_prelu(p["conv1"], x)
    out2 = _edbb(p["conv2"], out1)
    out3 = _edbb(p["conv3"], out2)
    br = p["branch"]
    cat = jnp.concatenate(
        [
            ops.conv(br["0"], x, padding=0),
            ops.conv(br["1"], out1, padding=0),
            ops.conv(br["2"], out2, padding=0),
            ops.conv(br["3"], out3, padding=0),
        ],
        axis=-1,
    )
    out = ops.conv(p["fuse"], cat, padding=0)
    out = blocks.esa(p["att"], out)
    return out + x


def efdn_apply(params, x, *, upscale: int = 4):
    out0 = ops.conv(params["head"], x)
    cells, fuse = params["cells"], params["local_fuse"]
    out1 = _cell(cells["0"], out0)
    out2 = _cell(cells["1"], out1)
    out2f = ops.conv(fuse["0"], jnp.concatenate([out1, out2], axis=-1), padding=0)
    out3 = _cell(cells["2"], out2f)
    out3f = ops.conv(fuse["1"], jnp.concatenate([out2, out3], axis=-1), padding=0)
    out4 = _cell(cells["3"], out3f)
    out4f = ops.conv(fuse["2"], jnp.concatenate([out2, out4], axis=-1), padding=0)
    out = out4f + out0
    out = ops.pixel_shuffle(ops.conv(blocks.seq(params["tail"], 0), out), upscale)
    return jnp.clip(out, 0.0, 1.0)
