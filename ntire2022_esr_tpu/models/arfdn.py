"""ARFDN — team14 (reference models/team14_arfdn/ARFDN.py:6-37, block.py:195-262).

RFDN skeleton whose blocks use asymmetric (3x1)+(1x3) conv pairs in two
parallel branches with dense distilled-feature reuse; standard ESA (named
``mpa`` in the checkpoint).
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks


def _asym_pair(p, x, a: str, b: str, slope: float = 0.05):
    return ops.conv(p[b], ops.leaky_relu(ops.conv(p[a], x), slope))


def _arfdb(p, x, slope: float = 0.05):
    d1 = ops.leaky_relu(ops.conv(p["c0_d"], x, padding=0), slope)
    l1 = _asym_pair(p, x, "c1_l1", "c1_l2")
    m1 = _asym_pair(p, x, "c1_m1", "c1_m2")
    r1 = ops.leaky_relu(l1 + m1 + d1, slope)

    d2 = ops.leaky_relu(ops.conv(p["c1_d"], r1, padding=0), slope)
    l2 = _asym_pair(p, r1, "c2_l1", "c2_l2")
    m2 = _asym_pair(p, r1, "c2_m1", "c2_m2")
    r2 = ops.leaky_relu(l2 + m2 + r1 + d2 + d1, slope)

    d3 = ops.leaky_relu(ops.conv(p["c2_d"], r2, padding=0), slope)
    l3 = _asym_pair(p, r2, "c3_l1", "c3_l2")
    m3 = _asym_pair(p, r2, "c3_m1", "c3_m2")
    r3 = ops.leaky_relu(l3 + m3 + r2 + d3 + d2 + d1, slope)

    r4 = ops.leaky_relu(ops.conv(p["c4"], r3), slope)
    out = jnp.concatenate([d1, d2, d3, r4], axis=-1)
    return blocks.esa(p["mpa"], ops.conv(p["c5"], out, padding=0))


def arfdn_apply(params, x, *, num_modules: int = 4, upscale: int = 4):
    fea = ops.conv(params["fea_conv"], x)
    outs = []
    h = fea
    for i in range(1, num_modules + 1):
        h = _arfdb(params[f"B{i}"], h)
        outs.append(h)
    # team14's activation() default is neg_slope=0.1 (block.py:67), which the
    # fusion conv_block inherits; the ARFDB act overrides it to 0.05.
    h = ops.leaky_relu(ops.conv(blocks.seq(params["c"], 0), jnp.concatenate(outs, axis=-1), padding=0), 0.1)
    h = ops.conv(params["LR_conv"], h) + fea
    return ops.pixel_shuffle(ops.conv(blocks.seq(params["upsampler"], 0), h), upscale)
