"""NLFFC ("Netw") — team02 "Virtual_Reality" (models/team02_nlffc/NLFFC.py:10-57).

The FFT outlier: bicubic x4 upsample *first*, then 9 FFCU local/global
split units (local branch: conv + softmax global-context attention; global
branch: conv + height-axis spectral transform). The only tiled model in the
zoo (tile 256 / overlap 32, test_demo.py:337).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.ops.spectral import spectral_tx

SLOPE = 0.2


def _global_context(p, x):
    # The torch graph flattens to (n, h*w, c) for its softmaxes
    # (team02_nlffc/basicblock.py:39-71); a joint softmax over the two
    # spatial axes is numerically identical and keeps the 1M-pixel
    # activations in their NHWC layout (no reshape round-trips at the
    # x4-upsampled body resolution).
    b1 = ops.relu(ops.conv(p["conv1"], x, padding=0))
    b1 = jax.nn.softmax(b1, axis=(1, 2))
    b2 = x * b1
    b2 = ops.leaky_relu(ops.conv(p["conv2"], b2, padding=0), SLOPE)
    b2 = ops.leaky_relu(ops.conv(p["conv3"], b2), SLOPE)
    b2 = ops.conv(p["conv4"], b2)
    b2 = jax.nn.softmax(b2, axis=(1, 2))
    return b2 * x


def _ffcu(p, x):
    from ntire2022_esr_tpu import config

    c = x.shape[-1]
    loc = c - c // 2
    xl, xg = x[..., :loc], x[..., loc:]
    if config.fuse_parallel_branches("nlffc"):
        # the local/global 3x3 branch pair as ONE block-diagonal conv over
        # the unsplit input: half the dispatches, 2x the output lanes at
        # the model's lane-starved 16-channel width; exact up to f32
        # reassociation (off-block weights are zero)
        w1 = ops.nn.dequant_weight(p["conv1"])
        w2 = ops.nn.dequant_weight(p["conv2"])
        w = ops.block_diag_weights([w1, w2])
        b = ops.concat_biases([(p["conv1"].get("bias"), loc),
                               (p["conv2"].get("bias"), c - loc)], w.dtype)
        both = ops.leaky_relu(ops.conv2d(x, w, b), SLOPE)
        c00, c10 = both[..., :loc], both[..., loc:]
    else:
        c00 = ops.leaky_relu(ops.conv(p["conv1"], xl), SLOPE)
        c10 = ops.leaky_relu(ops.conv(p["conv2"], xg), SLOPE)
    c01 = ops.conv(p["conv0"], _global_context(p["GlobContext"], xl), padding=0)
    c11 = spectral_tx(p["SpT"], xg)
    return jnp.concatenate([c00 + c10, c01 + c11], axis=-1)


def nlffc_apply(params, x, *, upscale: int = 4):
    x = ops.interpolate(x, scale_factor=upscale, mode="bicubic")
    h = ops.conv(params["c0"], x, padding=0)
    h1 = ops.conv(params["c1"], _ffcu(params["b1"], h), padding=0)
    h2 = ops.conv(params["c2"], _ffcu(params["b2"], h1), padding=0)
    h3 = ops.conv(params["c3"], _ffcu(params["b3"], h2), padding=0)
    h4 = ops.conv(params["c4"], _ffcu(params["b4"], h3), padding=0) + h2
    h5 = ops.conv(params["c5"], _ffcu(params["b5"], h4), padding=0)
    h6 = ops.conv(params["c6"], _ffcu(params["b6"], h5), padding=0)
    h7 = ops.conv(params["c7"], _ffcu(params["b7"], h6), padding=0)
    h8 = ops.conv(params["c8"], _ffcu(params["b8"], h7), padding=0) + h4
    return ops.relu(ops.conv(params["c9"], _ffcu(params["b9"], h8), padding=0))
