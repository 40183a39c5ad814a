"""RFDN-skeleton zoo variants with custom blocks.

- FasterRFDN (25, models/team25_frfdn/block.py:92-128): progressive
  channel-halving distillation.
- BMDN (37, models/team37_bmdn.py:135-180): back-projection convs feeding
  distilled features into the residual path; ReLU activations.
- RFDNext (38, models/team38_rfdnext/rfdn_block.py:146-186): slim RFDB
  with ConvNeXt-style CX gate (depthwise 7x7 + MLP) instead of ESA.
- team35 RFDN (35, models/team35_rfdn/rmsrb1.py:181-217): factorized
  residual branches (depthwise-residual + 1x1 pairs) and a
  pixel-unshuffle ESA (floor-crops odd sizes like its strided-conv
  reference implementation).
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks
from ntire2022_esr_tpu.models.rfdn import rfdn_apply


# ---------------------------------------------------------------------------
# FasterRFDN (25)
# ---------------------------------------------------------------------------

def _frfdb(p, x, slope: float = 0.05):
    d1 = ops.leaky_relu(ops.conv(p["c1_d"], x, padding=0), slope)
    r1 = ops.leaky_relu(ops.conv(p["c1_r"], x) + x, slope)
    d2 = ops.leaky_relu(ops.conv(p["c2_d"], r1, padding=0), slope)
    r2 = ops.leaky_relu(ops.conv(p["c2_r"], d2) + d2, slope)
    d3 = ops.leaky_relu(ops.conv(p["c3_d"], r2, padding=0), slope)
    r3 = ops.leaky_relu(ops.conv(p["c3_r"], d3) + d3, slope)
    r4 = ops.leaky_relu(ops.conv(p["c4"], r3) + r3, slope)
    out = jnp.concatenate([d1, d2, d3, r4], axis=-1)
    return blocks.esa(p["esa"], ops.conv(p["c5"], out, padding=0))


def frfdn_apply(params, x, **kw):
    return rfdn_apply(params, x, block_fn=_frfdb, **kw)


# ---------------------------------------------------------------------------
# BMDN (37)
# ---------------------------------------------------------------------------

def _bmdb(p, x):
    d1 = ops.relu(ops.conv(p["c1_d"], x, padding=0))
    b1 = ops.conv(p["c1_b"], d1)
    r1 = ops.relu(ops.conv(p["c1_r"], x) + b1)

    d2 = ops.relu(ops.conv(p["c2_d"], r1, padding=0))
    b2 = ops.conv(p["c2_b"], d2)
    r2 = ops.relu(ops.conv(p["c2_r"], r1) + r1 + b2)

    d3 = ops.relu(ops.conv(p["c3_d"], r2, padding=0))
    b3 = ops.conv(p["c3_b"], d3)
    r3 = ops.relu(ops.conv(p["c3_r"], r2) + r2 + b3)

    r4 = ops.relu(ops.conv(p["c4"], r3))
    out = jnp.concatenate([d1, d2, d3, r4], axis=-1)
    return blocks.esa(p["esa"], ops.conv(p["c5"], out, padding=0))


def bmdn_apply(params, x, *, num_modules: int = 4, upscale: int = 4):
    fea = ops.conv(params["fea_conv"], x)
    outs = []
    h = fea
    for i in range(1, num_modules + 1):
        h = _bmdb(params[f"B{i}"], h)
        outs.append(h)
    # fusion conv uses ReLU here (team37_bmdn.py: act_type='relu')
    h = ops.relu(ops.conv(blocks.seq(params["c"], 0), jnp.concatenate(outs, axis=-1), padding=0))
    h = ops.conv(params["LR_conv"], h) + fea
    return ops.pixel_shuffle(ops.conv(blocks.seq(params["upsampler"], 0), h), upscale)


# ---------------------------------------------------------------------------
# RFDNext (38)
# ---------------------------------------------------------------------------

def _cx(p, x, slope: float = 0.05):
    c = x.shape[-1]
    h = ops.conv(blocks.seq(p["conv"], 0), x, groups=c)           # depthwise 7x7
    h = ops.conv(blocks.seq(p["conv"], 1), h, padding=0)
    h = ops.leaky_relu(h, slope)
    h = ops.conv(blocks.seq(p["conv"], 3), h, padding=0)
    return h + x


def _rfdnext_block(p, x, slope: float = 0.05):
    d1 = ops.conv(p["c1_d"], x, padding=0)
    r1 = ops.conv(p["c1_r"], x) + d1
    d2 = ops.conv(p["c2_d"], r1, padding=0)
    r2 = ops.conv(p["c2_r"], r1) + r1
    d3 = ops.conv(p["c3_d"], r2, padding=0)
    r3 = ops.leaky_relu(ops.conv(p["c3_r"], r2) + r2, slope)
    r4 = ops.conv(p["c4"], r3)
    out = ops.leaky_relu(jnp.concatenate([d1, d2, d3, r4], axis=-1), slope)
    out = ops.conv(p["c5"], out, padding=0)
    return _cx(p["esa"], out)


def rfdnext_apply(params, x, **kw):
    return rfdn_apply(params, x, block_fn=_rfdnext_block, **kw)


# ---------------------------------------------------------------------------
# team35 factorized RFDN (35)
# ---------------------------------------------------------------------------

def _esa_unshuffle(p, x):
    c1_ = ops.conv(p["conv1"], x, padding=0)
    h, w = c1_.shape[1], c1_.shape[2]
    c1 = ops.pixel_unshuffle(c1_[:, : h // 2 * 2, : w // 2 * 2, :], 2)
    c1p = ops.relu(ops.max_pool2d(c1, 7, 3))
    c2 = ops.relu(ops.conv(p["con_"], c1p, padding=1))
    c3 = ops.interpolate(c2, size=(x.shape[1], x.shape[2]), mode="bilinear")
    cf = ops.conv(p["conv_f"], c1_, padding=0)
    c4 = ops.conv(p["conv4"], c3 + cf, padding=0)
    return x * ops.sigmoid(c4)


def _conv_two(p, x):
    c = x.shape[-1]
    h = ops.conv(p["0"]["fn"], x, groups=c) + x
    return ops.conv(p["1"], h, padding=0)


def _conv_four(p, x):
    h = ops.relu(_conv_two(p["0"], x))
    return _conv_two(p["2"], h)


def _rfdb35(p, x, slope: float = 0.05):
    h = x
    distilled = []
    for i in (1, 2, 3):
        d = ops.leaky_relu(ops.conv(p[f"c{i}_d"], h, padding=0), slope)
        h = ops.leaky_relu(_conv_four(p[f"c{i}_r"], h) + h, slope)
        distilled.append(d)
    r4 = ops.leaky_relu(ops.conv(p["c4"], h), slope)
    out = jnp.concatenate(distilled + [r4], axis=-1)
    return _esa_unshuffle(p["esa"], ops.conv(p["c5"], out, padding=0))


def rfdn35_apply(params, x, **kw):
    return rfdn_apply(params, x, block_fn=_rfdb35, **kw)
