"""NASNetBN — team28 "neptune" (reference models/team28_nasnetbn.py:118-170).

NAS-searched SRResNet: per-layer block chosen by arch_list from
{InvertedResidualBN e3/e6, ResidualBlockBN, ResidualBlockLeakyBN}
(inference-mode BatchNorm), 2x PixelShuffle(2) upsample, global bilinear
x4 residual. Registry arch (test_demo.py:222-223):
[3,1,2,3,3,0,1,2,0,0,0,0,2,3,3,1].
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import config, ops
from ntire2022_esr_tpu.models import blocks

ARCH_LIST = (3, 1, 2, 3, 3, 0, 1, 2, 0, 0, 0, 0, 2, 3, 3, 1)


def _inverted_residual(p, x):
    """pw-BN-ReLU6 -> dw-BN-ReLU6 -> pw-BN, + x (expand_ratio != 1 layout)."""
    c = p["conv"]
    h = ops.conv(blocks.seq(c, 0), x, padding=0)
    h = ops.relu6(ops.batch_norm(blocks.seq(c, 1), h))
    hid = h.shape[-1]
    h = ops.conv(blocks.seq(c, 3), h, groups=hid)
    h = ops.relu6(ops.batch_norm(blocks.seq(c, 4), h))
    h = ops.conv(blocks.seq(c, 6), h, padding=0)
    h = ops.batch_norm(blocks.seq(c, 7), h)
    return x + h


def _res_bn(p, x):
    out = ops.relu(ops.batch_norm(p["bn1"], ops.conv(p["conv1"], x)))
    out = ops.batch_norm(p["bn2"], ops.conv(p["conv2"], out))
    return x + out


def _res_leaky_bn(p, x):
    out = ops.leaky_relu(ops.batch_norm(p["bn1"], ops.conv(p["conv1"], x)), 0.2)
    out = ops.batch_norm(p["bn2"], ops.conv(p["conv2"], out))
    return x + out


def nasnetbn_body(params, x, *, arch_list=ARCH_LIST, slope: float = 0.1):
    """conv_first + NAS trunk (LR domain). Body/tail seam = the stage-split
    dispatch boundary (harness/stagesplit.py)."""
    fea = ops.leaky_relu(ops.conv(params["conv_first"], x), slope)
    h = fea
    for i, idx in enumerate(arch_list):
        p = blocks.seq(params["recon_trunk"], i)
        if idx in (0, 1):
            h = _inverted_residual(p, h)
        elif idx == 2:
            h = _res_bn(p, h)
        else:
            h = _res_leaky_bn(p, h)
    return h


def nasnetbn_tail(params, h, x_lr, *, upscale: int = 4, slope: float = 0.1):
    """2x pixel-shuffle upconv + HRconv/conv_last + global bilinear residual
    (needs the LR input for the residual)."""
    # conv_last stays OUTSIDE the reduced-precision scope (see m_rfdn.py):
    # its input keeps the 2-byte tier, the output pixels keep full precision
    with config.hr_tail_scope("nasnetbn"):
        h2 = ops.leaky_relu(ops.pixel_shuffle(ops.conv(params["upconv1"], h), 2), slope)
        h2 = ops.leaky_relu(ops.pixel_shuffle(ops.conv(params["upconv2"], h2), 2), slope)
        h2 = ops.leaky_relu(ops.conv(params["HRconv"], h2), slope)
    out = ops.conv(params["conv_last"], h2)
    # the global bilinear residual stays f32: it carries the base image
    return out + ops.interpolate(x_lr, scale_factor=upscale, mode="bilinear")


def nasnetbn_apply(params, x, *, arch_list=ARCH_LIST, upscale: int = 4, slope: float = 0.1):
    h = nasnetbn_body(params, x, arch_list=arch_list, slope=slope)
    return nasnetbn_tail(params, h, x, upscale=upscale, slope=slope)
