"""RLFN_cut — team04, NTIRE 2022 runtime-track winner.

Reference: models/team04_rlfn.py:91-155. Four RLFBs (3x conv3x3+LReLU(0.05)
chain + residual + 1x1 + trimmed ESA), RFDN-style skeleton. The flagship
model of this framework's runtime benchmark.
"""

from __future__ import annotations

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.models import blocks


def esa_rlfn(p, x):
    """Trimmed ESA (team04_rlfn.py:62-89): conv_max/conv3_ removed."""
    c1_ = ops.conv(p["conv1"], x, padding=0)
    c1 = ops.conv(p["conv2"], c1_, stride=2, padding=0)
    v_max = ops.max_pool2d(c1, 7, 3)
    c3 = ops.conv(p["conv3"], v_max)
    c3 = ops.interpolate(c3, size=(x.shape[1], x.shape[2]), mode="bilinear")
    cf = ops.conv(p["conv_f"], c1_, padding=0)
    c4 = ops.conv(p["conv4"], c3 + cf, padding=0)
    return x * ops.sigmoid(c4)


def rlfb(p, x, slope: float = 0.05, use_fused: bool = False):
    if use_fused:
        from ntire2022_esr_tpu.ops.pallas import fused_conv3x3_chain

        out = fused_conv3x3_chain(
            x,
            [ops.nn.dequant_weight(p[f"c{i}_r"]) for i in (1, 2, 3)],
            [p[f"c{i}_r"].get("bias") for i in (1, 2, 3)],
            slope=slope, residual=True,
        )
    else:
        out = ops.leaky_relu(ops.conv(p["c1_r"], x), slope)
        out = ops.leaky_relu(ops.conv(p["c2_r"], out), slope)
        out = ops.leaky_relu(ops.conv(p["c3_r"], out), slope)
        out = out + x
    return esa_rlfn(p["esa"], ops.conv(p["c5"], out, padding=0))


def rlfn_apply(params, x, *, num_modules: int = 4, upscale: int = 4,
               use_fused: bool = False):
    """``use_fused=True`` routes each RLFB's 3-conv body through the Pallas
    fused chain kernel (ops/pallas/conv_chain.py) — one HBM round-trip per
    block instead of three. Experimental: Mosaic compiles are slow through
    the remote-compile tunnel, so the default stays on the XLA path."""
    fea = ops.conv(params["fea_conv"], x)
    h = fea
    for i in range(1, num_modules + 1):
        h = rlfb(params[f"B{i}"], h, use_fused=use_fused)
    h = ops.conv(params["LR_conv"], h) + fea
    return ops.pixel_shuffle(ops.conv(blocks.seq(params["upsampler"], 0), h), upscale)
