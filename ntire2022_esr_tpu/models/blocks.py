"""Shared block library for the SR model zoo.

One functional library replaces the reference zoo's 10+ copy-pasted
``basicblock.py`` variants. Each block is a pure function
``block(p, x, ...) -> y`` where ``p`` is the param subtree produced by the
porter, named exactly like the torch submodule it mirrors, so per-model
files reduce to thin graph definitions.

Reference citations: /root/reference/models/basicblock.py (IMDBlock
:230-265, ESA :271-295), /root/reference/models/rfdn_baseline/block.py
(ESA :103-129, RFDB :132-166, pixelshuffle_block :168-172).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ntire2022_esr_tpu import config, ops

Params = Dict


def seq(p: Params, i: int) -> Params:
    """Index into an nn.Sequential param subtree (keys are '0', '1', ...)."""
    return p[str(i)]


def conv_lrelu(p: Params, x, slope: float = 0.05, **kw):
    return ops.leaky_relu(ops.conv(p, x, **kw), slope)


def scan_chain(block_fn, params_list, x, collect: bool = False):
    """Run repeated blocks as ``lax.scan`` over stacked params.

    Consecutive blocks whose param trees have identical structure and leaf
    shapes are stacked and scanned (the block body is traced and compiled
    once per run instead of once per block); odd-one-out blocks (e.g.
    MobileSR's wider first/last MLPs) run unrolled in place. Numerically
    the same graph per step as the unrolled Python loop.

    ``collect=True`` additionally returns the list of per-block outputs
    (for bodies whose outputs are concat-fused, e.g. m_RFDN's 4 m_RFDBs).
    """
    def sig(p):
        leaves, treedef = jax.tree_util.tree_flatten(p)
        return treedef, tuple(leaf.shape for leaf in leaves)

    runs = []  # [(sig, [params, ...]), ...] — consecutive same-shape blocks
    for p in params_list:
        s = sig(p)
        if runs and runs[-1][0] == s:
            runs[-1][1].append(p)
        else:
            runs.append((s, [p]))

    outs = []
    h = x
    for _, run in runs:
        if len(run) == 1:
            h = block_fn(run[0], h)
            if collect:
                outs.append(h)
        else:
            stacked = jax.tree.map(lambda *leaves: jnp.stack(leaves), *run)

            def body(carry, p):
                y = block_fn(p, carry)
                return y, (y if collect else None)

            h, ys = jax.lax.scan(body, h, stacked)
            if collect:
                outs.extend(ys[i] for i in range(len(run)))
    if collect:
        return h, outs
    return h


# ---------------------------------------------------------------------------
# IMD block (basicblock.py:230-265)
# ---------------------------------------------------------------------------

def imd_block(p: Params, x, d_nc: int, slope: float = 0.05):
    """x + conv1x1(cat(d1,d2,d3,conv4(r3))); conv1-3 are 'CL' sequentials."""
    c1 = conv_lrelu(seq(p["conv1"], 0), x, slope)
    d1, r1 = c1[..., :d_nc], c1[..., d_nc:]
    c2 = conv_lrelu(seq(p["conv2"], 0), r1, slope)
    d2, r2 = c2[..., :d_nc], c2[..., d_nc:]
    c3 = conv_lrelu(seq(p["conv3"], 0), r2, slope)
    d3, r3 = c3[..., :d_nc], c3[..., d_nc:]
    d4 = ops.conv(p["conv4"], r3)
    res = ops.conv(p["conv1x1"], jnp.concatenate([d1, d2, d3, d4], axis=-1), padding=0)
    return x + res


# ---------------------------------------------------------------------------
# ESA variants
# ---------------------------------------------------------------------------

def esa(p: Params, x):
    """RFDN-style ESA (rfdn_baseline/block.py:103-129).

    conv1 1x1 -> [strided conv2 + maxpool7s3 + conv_max/conv3/conv3_ +
    bilinear back] + conv_f skip -> conv4 1x1 -> sigmoid gate.
    """
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


def esa_no_f(p: Params, x):
    """team08 SFDN ESA: no conv_f skip — c4 = conv4(c3 + c1_) directly."""
    c1_ = ops.conv(p["conv1"], x, padding=0)
    c1 = ops.conv(p["conv2"], c1_, stride=2, padding=0)
    v_max = ops.max_pool2d(c1, 7, 3)
    v_range = ops.relu(ops.conv(p["conv_max"], v_max))
    c3 = ops.relu(ops.conv(p["conv3"], v_range))
    c3 = ops.conv(p["conv3_"], c3)
    c3 = ops.interpolate(c3, size=(x.shape[1], x.shape[2]), mode="bilinear")
    c4 = ops.conv(p["conv4"], c3 + c1_, padding=0)
    return x * ops.sigmoid(c4)


def esa_basic(p: Params, x):
    """basicblock.py ESA (:271-295): conv21 skip, relu on conv3/conv4."""
    x1 = ops.conv(p["conv1"], x, padding=0)
    x2 = ops.max_pool2d(ops.conv(p["conv2"], x1, stride=2, padding=0), 7, 3)
    x2 = ops.relu(ops.conv(p["conv3"], x2))
    x2 = ops.relu(ops.conv(p["conv4"], x2))
    x2 = ops.interpolate(ops.conv(p["conv5"], x2), size=(x.shape[1], x.shape[2]), mode="bilinear")
    x2 = ops.conv(p["conv6"], x2 + ops.conv(p["conv21"], x1, padding=0), padding=0)
    return x * ops.sigmoid(x2)


# ---------------------------------------------------------------------------
# RFD block (rfdn_baseline/block.py:132-166)
# ---------------------------------------------------------------------------

def rfdb(p: Params, x, slope: float = 0.05, residual: bool = True, esa_fn=None,
         dilations=(1, 1, 1)):
    """RFD block; ``residual=False`` gives the pruned variant (models 8, 40)
    where the 3x3 branch drops its +x adds (team40_rfdn_pruned.py:148-163);
    ``dilations=(1,2,5)`` gives the dilated variant (model 13)."""
    if esa_fn is None:
        esa_fn = esa
    h = x
    distilled = []
    for i in (1, 2, 3):
        d_p, r_p = p[f"c{i}_d"], p[f"c{i}_r"]
        if (config.fuse_parallel_branches("rfdb") and d_p["weight"].shape[:2] == (1, 1)
                and r_p["weight"].shape[:2] == (3, 3)):
            # one conv for the sibling 1x1-distill + 3x3-residual pair
            # (ops/fused.parallel_conv_pair): half the dispatches, d+r
            # output lanes; exact up to f32 reassociation
            from ntire2022_esr_tpu.ops.fused import parallel_conv_pair

            d, r = parallel_conv_pair(d_p, r_p, h, dilation=dilations[i - 1])
            d = ops.leaky_relu(d, slope)
        else:
            d = ops.leaky_relu(ops.conv(d_p, h, padding=0), slope)
            r = ops.conv(r_p, h, dilation=dilations[i - 1])
        h = ops.leaky_relu(r + h if residual else r, slope)
        distilled.append(d)
    r4 = ops.leaky_relu(ops.conv(p["c4"], h), slope)
    out = jnp.concatenate(distilled + [r4], axis=-1)
    return esa_fn(p["esa"], ops.conv(p["c5"], out, padding=0))


# ---------------------------------------------------------------------------
# Upsampler tails
# ---------------------------------------------------------------------------

def pixelshuffle_tail(p: Params, x, r: int = 4):
    """conv(nf -> out*r^2) + PixelShuffle(r) (rfdn pixelshuffle_block)."""
    return ops.pixel_shuffle(ops.conv(p, x), r)


# ---------------------------------------------------------------------------
# Channel attention (basicblock.py CALayer :333-351)
# ---------------------------------------------------------------------------

def ca_layer(p: Params, x):
    y = ops.global_avg_pool(x)
    y = ops.relu(ops.conv(seq(p["conv_fc"], 0) if "conv_fc" in p else seq(p, 0), y, padding=0))
    y = ops.sigmoid(ops.conv(seq(p["conv_fc"], 2) if "conv_fc" in p else seq(p, 2), y, padding=0))
    return x * y


# contrast-aware channel attention (IMDN CCALayer style)
def cca_layer(p: Params, x):
    y = ops.global_std_pool(x) + ops.global_avg_pool(x)
    y = ops.relu(ops.conv(p["conv_du"]["0"], y, padding=0))
    y = ops.sigmoid(ops.conv(p["conv_du"]["2"], y, padding=0))
    return x * y
