"""RLCSR — team42 "IMGWLH" (reference models/team42_rlcsr.py:320-410).

Six weight-normed RFDBs with inter-block residual chaining, SiLU-in-ESA
with extra residuals, layer attention (degenerate N=1 case -> (1+gamma)x),
BAM channel+spatial gate, channel-shuffle reduction chain, 3-branch
asymmetric convs for stem/tail, and a global bicubic x4 residual.

Quirk preserved: the reference's activation('silu') actually builds
nn.SELU (team42_rlcsr.py:160-172 if/elif chain), so block activations are
SELU while ESA's internal act is true SiLU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks


def _selu(x):
    return jax.nn.selu(x)


def _esa42(p, x):
    c1_ = ops.conv(p["conv1"], x, padding=0)
    c1 = ops.conv(p["conv2"], c1_, stride=2, padding=0)
    v_max = ops.max_pool2d(c1, 7, 3)
    v_range = ops.silu(ops.conv(p["conv_max"], v_max)) + v_max
    c3 = ops.silu(ops.conv(p["conv3"], v_range)) + v_range
    c3 = ops.conv(p["conv3_"], c3) + c3
    c3 = ops.interpolate(c3, size=(x.shape[1], x.shape[2]), mode="bilinear")
    cf = ops.conv(p["conv_f"], c1_, padding=0)
    c4 = ops.conv(p["conv4"], c3 + cf, padding=0)
    return x * ops.sigmoid(c4)


def _rfdb42(p, x):
    h = x
    distilled = []
    for i in (1, 2, 3):
        d = _selu(ops.conv(p[f"c{i}_d"], h, padding=0))
        h = _selu(ops.conv(p[f"c{i}_r"], h) + h)
        distilled.append(d)
    r4 = _selu(ops.conv(p["c4"], h))
    out = jnp.concatenate(distilled + [r4], axis=-1)
    return _esa42(p["esa"], ops.conv(p["c5"], out, padding=0))


def _tri_conv(p, x, prefix: str):
    """conv1_3 + conv1_1 + conv1_2 3-branch (conv_layer1 pattern)."""
    return (
        ops.conv(p[f"{prefix}3"], x)
        + ops.conv(p[f"{prefix}1"], x)
        + ops.conv(p[f"{prefix}2"], x)
    )


def _bam(p, x):
    ca_p = p["ca"]

    def mlp(v):
        return ops.conv(ca_p["fc2"], ops.relu(ops.conv(ca_p["fc1"], v, padding=0)), padding=0)

    ca = ops.sigmoid(mlp(ops.global_avg_pool(x)) + mlp(ops.global_max_pool(x)))
    avg = jnp.mean(x, axis=-1, keepdims=True)
    mx = jnp.max(x, axis=-1, keepdims=True)
    sa = ops.sigmoid(ops.conv(p["sa"]["conv1"], jnp.concatenate([avg, mx], axis=-1)))
    return ca * sa * x


def rlcsr_apply(params, x, *, num_modules: int = 6, upscale: int = 4):
    fea = (
        ops.conv(params["conv1_2"], x)
        + ops.conv(params["conv1_1"], x)
        + ops.conv(params["conv1_3"], x)
    )
    outs = []
    h = fea
    for i in range(1, num_modules + 1):
        b = _rfdb42(params[f"B{i}"], h)
        h = b if i == 1 else b + h
        outs.append(h)

    out_b = _selu(ops.conv(blocks.seq(params["c"], 0), jnp.concatenate(outs, axis=-1), padding=0))
    # LAM with a single layer (N=1): softmax over one element == 1, so the
    # attention output equals the input and out2 = (1 + gamma) * out_b.
    out2 = (1.0 + params["la"]["gamma"]) * out_b
    out2 = (
        ops.conv(params["convl11"], out2)
        + ops.conv(params["convl22"], out2)
        + ops.conv(params["convl33"], out2)
    )

    def reduce(pp, a, b):
        return ops.conv(pp, ops.channel_shuffle(jnp.concatenate([a, b], axis=-1), 2), padding=0)

    res = reduce(params["reduction1"], outs[0], outs[1])
    res = reduce(params["reduction2"], res, outs[2])
    res = reduce(params["reduction3"], res, outs[3])
    res = reduce(params["reduction4"], res, outs[4])
    out_lr = reduce(params["reduction5"], res, outs[5])

    out = _bam(params["BAM"], jnp.concatenate([out2, out_lr], axis=-1))
    res = (
        ops.conv(params["convl1"], out)
        + ops.conv(params["convl2"], out)
        + ops.conv(params["convl3"], out)
    )

    up = _tri_conv(blocks.seq(params["upsampler"], 0), res, "conv1_")
    output = ops.pixel_shuffle(up, upscale)
    return output + ops.interpolate(x, scale_factor=4, mode="bicubic")
