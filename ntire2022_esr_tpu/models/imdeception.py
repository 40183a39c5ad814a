"""IMDeception — team19 "Aselsan Research" (models/team19_imdeception.py:123-178).

Grouped-conv information distillation (GConv2d = per-group conv list) with
pixel-unshuffle block self-attention: features are 4x-space-to-depth'd,
8x8-blocked, and each 64-token block runs a softmax attention (one MXU
batch matmul per block batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ntire2022_esr_tpu import config, ops

SLOPE = 0.05


def _gconv(p, x, groups: int = 4):
    chunks = jnp.split(x, groups, axis=-1)
    outs = [ops.conv(p["conv2d_block"][str(i)], c) for i, c in enumerate(chunks)]
    return jnp.concatenate(outs, axis=-1)


def _gblock(p, x):
    h = ops.relu(_gconv(p["conv0"], x))
    return ops.conv(p["conv1"], h, padding=0)


def _block_self_attention(p, x, local: int = 4, area: int = 32):
    bs = area // local  # global block size over the local-unshuffled grid
    m = bs * bs
    t = ops.conv(p["conv_phi_theta_g"], x, padding=0)
    n, h8, w8, _ = t.shape
    # reference pads to the next multiple of bs^2 even when already divisible
    h8div = (h8 // m + 1) * m
    w8div = (w8 // m + 1) * m
    t = jnp.pad(t, ((0, 0), (0, h8div - h8), (0, w8div - w8), (0, 0)))
    t = ops.pixel_unshuffle(t, local)
    hh, ww, c3 = t.shape[1], t.shape[2], t.shape[3]
    g = ops.pixel_unshuffle(t, bs)  # (n, hh/bs, ww/bs, c3*m)
    nb = n * (hh // bs) * (ww // bs)
    blk = g.reshape(nb, c3, bs, bs).transpose(0, 2, 3, 1).reshape(nb, m, c3)
    oc = c3 // 3
    q, k, v = blk[..., :oc], blk[..., oc:2 * oc], blk[..., 2 * oc:]
    nm = config.numerics()
    sa = jax.nn.softmax(
        jnp.einsum("bic,bjc->bij", q, k, precision=nm.matmul_precision), axis=-1)
    o = jnp.einsum("bij,bjc->bic", sa, v, precision=nm.matmul_precision)
    o = o.reshape(nb, bs, bs, oc).transpose(0, 3, 1, 2)
    o = o.reshape(n, hh // bs, ww // bs, oc * m)
    o = ops.pixel_shuffle(o, bs)
    o = ops.pixel_shuffle(o, local)
    o = o[:, :h8, :w8, :]
    return ops.conv(p["conv_out"], o, padding=0) + x


def _gidb(p, x, shal: int, deep: int):
    shals = []
    h = x
    for name in ("conv0", "conv1", "conv2"):
        out = ops.leaky_relu(_gblock(p[name], h), SLOPE)
        shals.append(out[..., :shal])
        h = out[..., shal:]
    shals.append(ops.leaky_relu(_gblock(p["conv3_shal"], h), SLOPE))
    cat = jnp.concatenate(shals + [x], axis=-1)
    return ops.conv(p["conv_fuse0"], cat, padding=0)


def imdeception_apply(params, x, *, core: int = 16, upscale: int = 4):
    h = ops.conv(params["feat_conv0"], x)
    x1_, h1 = jnp.split(_gidb(params["block1"], h, core, 3 * core), [core], axis=-1)
    x2_, h2 = jnp.split(_gidb(params["block2"], h1, core, 3 * core), [core], axis=-1)
    h2 = _block_self_attention(params["self_attention1"], h2)
    x3_, h3 = jnp.split(_gidb(params["block3"], h2, core, 3 * core), [core], axis=-1)
    x4_, h4 = jnp.split(_gidb(params["block4"], h3, core, 3 * core), [core], axis=-1)
    h4 = _block_self_attention(params["self_attention2"], h4)
    x5_, h5 = jnp.split(_gidb(params["block5"], h4, core, 3 * core), [core], axis=-1)
    x6_ = _gidb(params["block6_shal"], h5, core, 2 * core)

    cat = jnp.concatenate([x1_, x2_, x3_, x4_, x5_, x6_], axis=-1)
    hc = ops.leaky_relu(ops.conv(params["conv_fuse0"], cat, padding=0), SLOPE)
    hc = ops.leaky_relu(ops.conv(params["conv_fuse1"], hc), SLOPE)
    hc = hc + h
    y = ops.conv(params["conv_out"], hc)
    return ops.pixel_shuffle(y, upscale)
