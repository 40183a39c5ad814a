"""m_RFDN — team33 "Multicog" (reference models/team33_m_rfdn/m_RFDN.py:7-54).

RFDN body with Multiception convs (parallel depthwise k in {1,3,5} -> BN ->
pointwise -> BN) and a progressive upsampler: 2x (nearest x2 -> conv ->
pixel attention -> conv), LeakyReLU(0.2).
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import config, ops
from ntire2022_esr_tpu.models import blocks


def _multiception(p, x, n_kernels: int):
    c = x.shape[-1]
    seps = [ops.conv(p["seps"][str(i)], x, groups=c) for i in range(n_kernels)]
    out = jnp.concatenate(seps, axis=-1)
    out = ops.batch_norm(p["bn1"], out)
    out = ops.conv(p["pointwise"], out, padding=0)
    return ops.batch_norm(p["bn2"], out)


def _m_rfdb(p, x, slope: float = 0.05):
    h = x
    distilled = []
    for i in (1, 2, 3):
        d = ops.leaky_relu(_multiception(p[f"c{i}_d"], h, 1), slope)
        r = _multiception(p[f"c{i}_r"], h, 3)
        h = ops.leaky_relu(r + h, slope)
        distilled.append(d)
    r4 = ops.leaky_relu(_multiception(p["c4"], h, 3), slope)
    out = jnp.concatenate(distilled + [r4], axis=-1)
    return blocks.esa(p["esa"], ops.conv(p["c5"], out, padding=0))


def m_rfdn_body(params, x, *, num_modules: int = 4):
    """LR-domain trunk: fea/B1..B4/c/LR_conv(+fea). The body/tail seam is
    the stage-split dispatch boundary (harness/stagesplit.py)."""
    fea = ops.conv(params["fea_conv"], x)
    body_params = [params[f"B{i}"] for i in range(1, num_modules + 1)]
    if config.scan_blocks("m_rfdn"):
        h, outs = blocks.scan_chain(_m_rfdb, body_params, fea, collect=True)
    else:
        outs = []
        h = fea
        for p in body_params:
            h = _m_rfdb(p, h)
            outs.append(h)
    h = ops.leaky_relu(ops.conv(blocks.seq(params["c"], 0), jnp.concatenate(outs, axis=-1), padding=0), 0.05)
    return ops.conv(params["LR_conv"], h) + fea


def m_rfdn_tail(params, h, x_lr):
    """Progressive x4 upsampler + conv_last (x_lr unused — uniform tail
    signature for the stage-split runner)."""
    del x_lr

    def pa(p, v):
        return v * ops.sigmoid(ops.conv(p["conv"], v, padding=0))

    from ntire2022_esr_tpu.ops.fused import upconv_nearest2

    def up(h):
        h = upconv_nearest2(params["upconv1"], h)
        h = ops.leaky_relu(pa(params["att1"], h), 0.2)
        h = ops.leaky_relu(ops.conv(params["HRconv1"], h), 0.2)
        h = upconv_nearest2(params["upconv2"], h)
        h = ops.leaky_relu(pa(params["att2"], h), 0.2)
        return ops.leaky_relu(ops.conv(params["HRconv2"], h), 0.2)

    # conv_last stays OUTSIDE the reduced-precision scope: its input (the
    # dominant HR buffer) keeps the 2-byte tier, but the image it produces
    # is computed and stored at the active mode's precision — one fewer
    # rounding on the output pixels for ~1/17 of the tail's bytes.
    with config.hr_tail_scope("m_rfdn"):
        h = up(h)
    return ops.conv(params["conv_last"], h)


def m_rfdn_apply(params, x, *, num_modules: int = 4):
    return m_rfdn_tail(params, m_rfdn_body(params, x, num_modules=num_modules), x)
