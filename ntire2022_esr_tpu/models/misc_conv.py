"""Conv-only zoo entries: SR_model (31), ESAN (34), IMDN_plus (39).

- SR_model (team31_sr_model.py:77-101): 4 BuildingBlocks, each 3x
  (conv3x3+res -> LReLU -> ESA) with dense concat -> 1x1 -> ESA.
  Convs live under a ``conv_layer`` wrapper module (key suffix ``.conv``).
- ESAN (team34_esan.py:78-124, level=1): conv(3->48)+PixelShuffle(4) base
  path plus one trunk of 16 ResidualBlock_ESA (custom ESA: three chained
  3x3s, c1_ skip, no conv_f/conv_max).
- IMDN_plus (team39_imdn_plus.py:50-105): IMDB with 6-way progressive
  1/6-rate split + SiLU, ShortcutBlock FEM wrapper.
"""

from __future__ import annotations

import jax.numpy as jnp

from ntire2022_esr_tpu import config, ops
from ntire2022_esr_tpu.models import blocks


# ---------------------------------------------------------------------------
# SR_model (31)
# ---------------------------------------------------------------------------

def _esa31(p, x):
    c1_ = ops.conv(p["conv1"], x, padding=0)
    c1 = ops.conv(p["conv2"], c1_, stride=2, padding=0)
    v_max = ops.max_pool2d(c1, 7, 3)
    v_range = ops.relu(ops.conv(p["conv_max"], v_max))
    c3 = ops.relu(ops.conv(p["conv3"], v_range))
    c3 = ops.conv(p["conv3_"], c3)
    c3 = ops.interpolate(c3, size=(x.shape[1], x.shape[2]), mode="bilinear")
    cf = ops.conv(p["conv_f"], c1_, padding=0)
    c4 = ops.conv(p["conv4"], c3 + cf, padding=0)
    return x * ops.sigmoid(c4)


def _building_block(p, x, n_convs: int = 3, slope: float = 0.05):
    cat_list = [x]
    h = x
    for i in range(n_convs):
        hc = ops.conv(p["convs"][str(i)]["conv"], h) + h
        h = _esa31(p["esa"][str(i)], ops.leaky_relu(hc, slope))
        cat_list.append(h)
    out = ops.conv(p["conv_last"]["conv"], jnp.concatenate(cat_list, axis=-1), padding=0)
    return _esa31(p["esa_last"], out)


def sr_model_apply(params, x, *, n_modules: int = 4, upscale: int = 4, slope: float = 0.05):
    fea = ops.conv(params["fea_conv"]["conv"], x)
    outs = []
    h = fea
    for i in range(n_modules):
        h = _building_block(params["mods"][str(i)], h)
        outs.append(h)
    h = ops.leaky_relu(ops.conv(params["c"]["conv"], jnp.concatenate(outs, axis=-1), padding=0), slope)
    h = ops.conv(params["LR_conv"]["conv"], h) + fea
    return ops.pixel_shuffle(ops.conv(blocks.seq(params["upsampler"], 0)["conv"], h), upscale)


# ---------------------------------------------------------------------------
# ESAN (34)
# ---------------------------------------------------------------------------

def _esa34(p, x):
    c1_ = ops.conv(p["conv1"], x, padding=0)
    c1 = ops.conv(p["conv2"], c1_, stride=2, padding=0)
    c1 = ops.max_pool2d(c1, 7, 3)
    c3 = ops.relu(ops.conv(p["conv3_1"], c1))
    c3 = ops.relu(ops.conv(p["conv3_2"], c3))
    c3 = ops.conv(p["conv3_3"], c3)
    c3 = ops.interpolate(c3, size=(x.shape[1], x.shape[2]), mode="bilinear")
    c4 = ops.conv(p["conv4"], c3 + c1_, padding=0)
    return x * ops.sigmoid(c4)


def _res_esa(p, x):
    out = ops.relu(ops.conv(p["conv1"], x))
    out = ops.conv(p["conv2"], out)
    return x + _esa34(p["ESA"], out)


def esan_apply(params, x, *, level: int = 1, trunk_len: int = 16, upscale: int = 4):
    result = ops.pixel_shuffle(ops.conv(params["upconv0"], x), upscale)
    for i in range(level):
        fea = ops.conv(params["conv_first"][str(i)], x)
        h = fea
        for j in range(trunk_len):
            h = _res_esa(params["recon_trunk"][str(i)][str(j)], h)
        result = result + ops.pixel_shuffle(ops.conv(params["upconv"][str(i)], h), upscale)
    return result


# ---------------------------------------------------------------------------
# IMDN_plus (39)
# ---------------------------------------------------------------------------

def _imdb_plus(p, x, d: int):
    h = ops.silu(ops.conv(p["c1"], x))
    distilled = []
    for i in range(2, 7):
        di, h = h[..., :d], h[..., d:]
        distilled.append(di)
        h = ops.silu(ops.conv(p[f"c{i}"], h))
    out = jnp.concatenate(distilled + [h], axis=-1)
    return ops.conv(p["c7"], out, padding=0) + x


def imdn_plus_apply(params, x, *, nf: int = 36, nb: int = 8, upscale: int = 4):
    d = nf // 6
    fem = params["FEM"]
    head = ops.conv(blocks.seq(fem, 0), x)
    h = head
    sub = fem["1"]["sub"]
    for i in range(nb):
        h = _imdb_plus(blocks.seq(sub, i), h, d)
    h = ops.conv(blocks.seq(sub, nb), h)
    h = head + h
    return ops.pixel_shuffle(ops.conv(blocks.seq(params["RM"], 0), h), upscale)


# ---------------------------------------------------------------------------
# MDGN (24) — team24_mdgn.py:5-53
# ---------------------------------------------------------------------------

def _mdsa(p, x):
    def conv_prelu(pp, h, padding=None):
        return ops.prelu(ops.conv(blocks.seq(pp, 0), h, **({"padding": padding} if padding is not None else {})),
                         blocks.seq(pp, 1)["weight"])

    f1 = conv_prelu(p["f1"], x)
    f2 = conv_prelu(p["f2"], f1)
    f3 = conv_prelu(p["f3"], f2)
    f = conv_prelu(p["conv_fuse"], jnp.concatenate([f1, f2, f3], axis=-1), padding=0)
    s = ops.sigmoid(ops.conv(blocks.seq(p["sa"], 0), x, padding=0))
    return f * s


def mdgn_apply(params, x, *, num_modules: int = 4, upscale: int = 4):
    fea = ops.conv(params["fea_conv"], x)
    h = fea
    for i in range(num_modules):
        h = _mdsa(blocks.seq(params["B"], i), h)
    h = ops.conv(params["LR_conv"], h) + fea
    return ops.pixel_shuffle(ops.conv(blocks.seq(params["upsampler"], 0), h), upscale)


# ---------------------------------------------------------------------------
# LWFANet (27) — team27_lwfanet.py:39-122
# ---------------------------------------------------------------------------

def _lwfa(p, x, slope: float = 0.2):
    def chain(names, h):
        for i, n in enumerate(names):
            h = ops.leaky_relu(ops.conv(p[n], h, padding=0 if n.endswith("_1") else None), slope)
        return h

    if config.fuse_parallel_branches("lwfanet"):
        # the four branch heads are 1x1 convs that all read x: one merged
        # 96-lane conv (output-exact, zero extra MACs, x read once)
        from ntire2022_esr_tpu.ops.fused import parallel_conv_same

        heads = parallel_conv_same(
            [p["conv1_1"], p["conv2_1"], p["conv3_1"], p["conv4_1"]], x,
            padding=0)
        h1, h2, h3, h4 = (ops.leaky_relu(h, slope) for h in heads)
        b1 = chain(["conv1_2"], h1)
        b2 = chain(["conv2_2", "conv2_3"], h2)
        b3 = chain(["conv3_2", "conv3_3", "conv3_4"], h3)
        b4 = chain(["conv4_2", "conv4_3", "conv4_4", "conv4_5"], h4)
    else:
        b1 = chain(["conv1_1", "conv1_2"], x)
        b2 = chain(["conv2_1", "conv2_2", "conv2_3"], x)
        b3 = chain(["conv3_1", "conv3_2", "conv3_3", "conv3_4"], x)
        b4 = chain(["conv4_1", "conv4_2", "conv4_3", "conv4_4", "conv4_5"], x)
    out = jnp.concatenate([b1, b2, b3, b4], axis=-1)

    # CBAM-style channel attention (avg+max pooled MLP, bias-free)
    ca_p = p["ca"]
    def mlp(v):
        return ops.conv(ca_p["fc2"], ops.relu(ops.conv(ca_p["fc1"], v, padding=0)), padding=0)
    ca = ops.sigmoid(mlp(ops.global_avg_pool(out)) + mlp(ops.global_max_pool(out)))

    sa1 = ops.sigmoid(ops.conv(p["sa1"]["sa_conv"], out, padding=0))
    sa2 = ops.sigmoid(ops.conv(p["sa2"]["sa_conv"], x, padding=0))
    return ca * out + sa1 * out + sa2 * x


def lwfanet_body(params, x, *, num_block: int = 10, slope: float = 0.2):
    """conv_first + 10x LWFA + conv_body/conv_L (LR domain). Body/tail seam
    = the stage-split dispatch boundary (harness/stagesplit.py)."""
    feat = ops.conv(params["conv_first"], x)
    body_params = [blocks.seq(params["body"], i) for i in range(num_block)]
    if config.scan_blocks("lwfanet"):
        h = blocks.scan_chain(lambda p, v: _lwfa(p, v, slope), body_params, feat)
    else:
        h = feat
        for p in body_params:
            h = _lwfa(p, h, slope)
    feat = feat + ops.conv(params["conv_body"], h)
    return ops.conv(params["conv_L"], feat, padding=0)


def lwfanet_tail(params, feat, x_lr, *, slope: float = 0.2):
    """2x fused nearest-up+conv + conv_hr + conv_last (x_lr unused —
    uniform tail signature for the stage-split runner)."""
    del x_lr
    from ntire2022_esr_tpu.ops.fused import upconv_nearest2

    # conv_last stays OUTSIDE the reduced-precision scope (see m_rfdn.py):
    # its input keeps the 2-byte tier, the output pixels keep full precision
    with config.hr_tail_scope("lwfanet"):
        feat2 = ops.leaky_relu(upconv_nearest2(params["conv_up1"], feat), slope)
        feat2 = ops.leaky_relu(upconv_nearest2(params["conv_up2"], feat2), slope)
        feat2 = ops.leaky_relu(ops.conv(params["conv_hr"], feat2), slope)
    return ops.conv(params["conv_last"], feat2)


def lwfanet_apply(params, x, *, num_block: int = 10, slope: float = 0.2):
    feat = lwfanet_body(params, x, num_block=num_block, slope=slope)
    return lwfanet_tail(params, feat, x, slope=slope)
