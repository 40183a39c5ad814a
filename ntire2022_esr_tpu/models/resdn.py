"""ResDN — team43 "cipher" (reference models/team43_resdn.py:115-182).

Expansion/compression 1x1<->3x3 blocks with cross-stage distilled-feature
reuse, a top-down T_tdm/L_tdm fusion pyramid, and MeanShift in/out convs
(whose frozen weights live in the checkpoint, so they are applied as plain
1x1 convs here).
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks


def _prelu_conv(p, x, **kw):
    """Sequential(PReLU, Conv2d)."""
    h = ops.prelu(x, blocks.seq(p, 0)["weight"])
    return ops.conv(blocks.seq(p, 1), h, **kw)


def _resdb(p, x, n_feats: int = 48, n_dist: int = 16):
    inp = x
    res = _prelu_conv(p["expansion1"], x, padding=0)
    res, d11, d12, d13 = jnp.split(res, [n_feats, n_feats + n_dist, n_feats + 2 * n_dist], axis=-1)
    x = x + _prelu_conv(p["compression1"], res)

    res = _prelu_conv(p["expansion2"], jnp.concatenate([x, d11], axis=-1), padding=0)
    res, d21, d22 = jnp.split(res, [n_feats, n_feats + n_dist], axis=-1)
    x = x + _prelu_conv(p["compression2"], res)

    res = _prelu_conv(p["expansion3"], jnp.concatenate([x, d12, d21], axis=-1), padding=0)
    res, d31 = jnp.split(res, [n_feats], axis=-1)
    x = x + _prelu_conv(p["compression3"], res)

    res = _prelu_conv(p["conv_tail"], jnp.concatenate([x, d13, d22, d31], axis=-1), padding=0)
    return blocks.esa(p["attention"], res) + inp


def _relu_conv1x1(p, x):
    return ops.relu(ops.conv(blocks.seq(p, 0), x, padding=0))


def resdn_apply(params, x, *, upscale: int = 4):
    x = ops.conv(params["sub_mean"], x, padding=0)
    x = ops.conv(params["fea_conv"], x)
    r1 = _resdb(params["body_unit1"], x)
    r2 = _resdb(params["body_unit2"], r1)
    r3 = _resdb(params["body_unit3"], r2)
    r4 = _resdb(params["body_unit4"], r3)

    t1 = jnp.concatenate([_relu_conv1x1(params["T_tdm1"], r4), _relu_conv1x1(params["L_tdm1"], r3)], axis=-1)
    t2 = jnp.concatenate([_relu_conv1x1(params["T_tdm2"], t1), _relu_conv1x1(params["L_tdm2"], r2)], axis=-1)
    t3 = jnp.concatenate([_relu_conv1x1(params["T_tdm3"], t2), _relu_conv1x1(params["L_tdm3"], r1)], axis=-1)

    res = t3 + x
    h = ops.conv(blocks.seq(params["tail"], 0), res)
    h = ops.conv(blocks.seq(params["tail"], 1), h)
    out = ops.pixel_shuffle(h, upscale)
    return ops.conv(params["add_mean"], out, padding=0)
