"""FDEN — team17 "NJU_MCG" (reference models/team17_fden/FDEN.py:10-45).

RFDN skeleton (blocks named IMDB1..4) with FDEB blocks: inverted-bottleneck
residual branches (1x1 expand x5 -> LReLU -> 1x1 -> 3x3, + input, no act),
bias-free distill convs, full-width c4, and Laplacian-pyramid spatial
attention (LapSA, block.py:132-185).
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks


def _lap_sa(p, x):
    s = ops.relu(ops.conv(p["squeeze"], x, padding=0))

    def down(pp, h):
        return ops.relu(ops.conv(blocks.seq(pp, 1), ops.max_pool2d(h, 2, 2)))

    d1 = down(p["down1"], s)
    u1 = ops.interpolate(d1, size=(s.shape[1], s.shape[2]), mode="bilinear")
    h1 = s - u1
    d2 = down(p["down2"], d1)
    u2 = ops.interpolate(d2, size=(d1.shape[1], d1.shape[2]), mode="bilinear")
    h2 = ops.interpolate(d1 - u2, size=(x.shape[1], x.shape[2]), mode="bilinear")
    d3 = down(p["down3"], d2)
    u3 = ops.interpolate(d3, size=(d2.shape[1], d2.shape[2]), mode="bilinear")
    h3 = ops.interpolate(d2 - u3, size=(x.shape[1], x.shape[2]), mode="bilinear")

    m = ops.sigmoid(ops.conv(p["excite"], jnp.concatenate([h1, h2, h3], axis=-1), padding=0))
    return ops.conv(p["fuse"], jnp.concatenate([x * m, h1], axis=-1), padding=0)


def _expand_branch(p, x, slope: float = 0.05):
    """Sequential(1x1 expand, LReLU, 1x1, 3x3)."""
    h = ops.leaky_relu(ops.conv(blocks.seq(p, 0), x, padding=0), slope)
    h = ops.conv(blocks.seq(p, 2), h, padding=0)
    return ops.conv(blocks.seq(p, 3), h)


def _fdeb(p, x, slope: float = 0.05):
    d1 = ops.leaky_relu(ops.conv(p["c1_d"], x, padding=0), slope)
    r1 = _expand_branch(p["c1_r"], x) + x
    d2 = ops.leaky_relu(ops.conv(p["c2_d"], r1, padding=0), slope)
    r2 = _expand_branch(p["c2_r"], r1) + r1
    d3 = ops.leaky_relu(ops.conv(p["c3_d"], r2, padding=0), slope)
    r3 = _expand_branch(p["c3_r"], r2) + r2
    r4 = ops.conv(p["c4"], r3)
    out = jnp.concatenate([d1, d2, d3, r4], axis=-1)
    return _lap_sa(p["sa"], ops.conv(p["c5"], out, padding=0))


def fden_apply(params, x, *, num_modules: int = 4, upscale: int = 4):
    fea = ops.conv(params["fea_conv"], x)
    outs = []
    h = fea
    for i in range(1, num_modules + 1):
        h = _fdeb(params[f"IMDB{i}"], h)
        outs.append(h)
    h = ops.leaky_relu(ops.conv(blocks.seq(params["c"], 0), jnp.concatenate(outs, axis=-1), padding=0), 0.05)
    h = ops.conv(params["LR_conv"], h) + fea
    return ops.pixel_shuffle(ops.conv(blocks.seq(params["upsampler"], 0), h), upscale)
