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


# ---------------------------------------------------------------------------
# Library completion: the rest of the reference basicblock.py surface.
# No zoo model executes these (the 42-model protocol never calls them), but
# they are components the reference ships and a user porting a KAIR-style
# net expects to find. Golden-tested vs torch in tests/test_blocks_library.py.
# ---------------------------------------------------------------------------

# mode-string graph factory (basicblock.py:61-98). Torch builds an
# nn.Sequential whose indices count EVERY module (parameter-free ones
# included); KAIR's `sequential` unwraps a single module, so a 1-char mode
# reads ``p`` directly. Parameterized chars: C/T/B/I.
_MODE_BN_EPS = 1e-4  # basicblock conv factory: BatchNorm2d(momentum=0.9, eps=1e-4)


def mode_conv(p: Params, x, mode: str, *, negative_slope: float = 0.2,
              stride: int = 1, padding: int = 1,
              pool_kernel: int = 3, pool_stride: int = None):
    """Functional analogue of the reference conv factory: apply the layers
    a mode string like 'CBR' describes. C=conv, T=conv-transpose, B=BN,
    I=IN, R/r=ReLU, L/l=LeakyReLU, 2/3/4=PixelShuffle, U/u/v=nearest
    up x2/x3/x4, M=maxpool, A=avgpool. ``stride``/``padding`` apply to
    C/T; pools use ``pool_kernel``/``pool_stride``."""
    single = len(mode) == 1

    def sub(i):
        return p if single else seq(p, i)

    for i, t in enumerate(mode):
        if t == "C":
            x = ops.conv(sub(i), x, stride=stride, padding=padding)
        elif t == "T":
            q = sub(i)
            x = ops.conv_transpose2d(x, ops.nn.dequant_weight(q), q.get("bias"),
                                     stride=stride, padding=padding)
        elif t == "B":
            x = ops.batch_norm(sub(i), x, eps=_MODE_BN_EPS)
        elif t == "I":
            x = ops.instance_norm(sub(i), x)
        elif t in ("R", "r"):
            x = ops.relu(x)
        elif t in ("L", "l"):
            x = ops.leaky_relu(x, negative_slope)
        elif t in ("2", "3", "4"):
            x = ops.pixel_shuffle(x, int(t))
        elif t in ("U", "u", "v"):
            x = ops.interpolate(x, scale_factor={"U": 2, "u": 3, "v": 4}[t],
                                mode="nearest")
        elif t == "M":
            x = ops.max_pool2d(x, pool_kernel, pool_stride or pool_kernel)
        elif t == "A":
            x = ops.avg_pool2d(x, pool_kernel, pool_stride or pool_kernel)
        else:
            raise NotImplementedError(f"undefined mode char: {t!r}")
    return x


def concat_block(fn, p: Params, x):
    """ConcatBlock (basicblock.py:175-186): cat([x, fn(p, x)], channels)."""
    return jnp.concatenate([x, fn(p, x)], axis=-1)


def shortcut_block(fn, p: Params, x):
    """ShortcutBlock (basicblock.py:189-205): x + fn(p, x)."""
    return x + fn(p, x)


def res_block(p: Params, x, mode: str = "CRC", negative_slope: float = 0.2):
    """ResBlock (basicblock.py:211-227): x + mode_conv(x); a leading R/L is
    lowercased by the torch ctor (same op functionally)."""
    return x + mode_conv(p["res"], x, mode, negative_slope=negative_slope)


def conditional_batch_norm(p: Params, x, y):
    """ConditionalBatchNorm2d (basicblock.py:156-172): affine-free BN whose
    per-sample gamma/beta come from an embedding lookup on class ids ``y``."""
    out = ops.batch_norm(p["bn"], x)  # running stats, no affine, eps 1e-5
    emb = p["embed"]["weight"][y]     # (N, 2C)
    c = x.shape[-1]
    gamma, beta = emb[:, :c], emb[:, c:]
    return gamma[:, None, None, :] * out + beta[:, None, None, :]


def cfrb(p: Params, x, negative_slope: float = 0.05):
    """CFRB (basicblock.py:298-327): RFDB-like distillation where the
    residual convs keep FULL width (r_nc == in_channels) and the final
    distill conv4_d is 3x3; gated by the basicblock ESA."""
    def c(name, v, padding=1):
        return mode_conv(p[name], v, "C", padding=padding)

    d1 = c("conv1_d", x, padding=0)
    x = ops.leaky_relu(c("conv1_r", x) + x, negative_slope)
    d2 = c("conv2_d", x, padding=0)
    x = ops.leaky_relu(c("conv2_r", x) + x, negative_slope)
    d3 = c("conv3_d", x, padding=0)
    x = ops.leaky_relu(c("conv3_r", x) + x, negative_slope)
    x = c("conv4_d", x)
    x = ops.leaky_relu(jnp.concatenate([d1, d2, d3, x], axis=-1), negative_slope)
    return esa_basic(p["esa"], c("conv1x1", x, padding=0))


def rcab(p: Params, x, mode: str = "CRC", reduction_unused: int = 16,
         negative_slope: float = 0.2):
    """RCABlock (basicblock.py:354-371): (mode_conv -> CALayer) + x."""
    res = mode_conv(p["res"], x, mode, negative_slope=negative_slope)
    return ca_layer(p["ca"], res) + x


def rca_group(p: Params, x, nb: int = 12, mode: str = "CRC",
              negative_slope: float = 0.2):
    """RCAGroup (basicblock.py:377-390): nb RCABlocks + conv, + x."""
    h = x
    for i in range(nb):
        h = rcab(seq(p["rg"], i), h, mode, negative_slope=negative_slope)
    h = ops.conv(seq(p["rg"], nb), h)
    return h + x


def residual_dense_block_5c(p: Params, x, mode: str = "CR",
                            negative_slope: float = 0.2):
    """ResidualDenseBlock_5C (basicblock.py:393-413): 4 growth convs on the
    dense concat + a fuse conv, scaled residual 0.2."""
    act = mode[1:] if len(mode) > 1 else ""

    def cv(name, v, m):
        return mode_conv(p[name], v, m, negative_slope=negative_slope)

    x1 = cv("conv1", x, "C" + act)
    x2 = cv("conv2", jnp.concatenate([x, x1], axis=-1), "C" + act)
    x3 = cv("conv3", jnp.concatenate([x, x1, x2], axis=-1), "C" + act)
    x4 = cv("conv4", jnp.concatenate([x, x1, x2, x3], axis=-1), "C" + act)
    x5 = cv("conv5", jnp.concatenate([x, x1, x2, x3, x4], axis=-1), "C")
    return x5 * 0.2 + x


def rrdb(p: Params, x, mode: str = "CR", negative_slope: float = 0.2):
    """RRDB (basicblock.py:418-428): 3 chained RDB_5C, scaled residual."""
    out = residual_dense_block_5c(p["RDB1"], x, mode, negative_slope)
    out = residual_dense_block_5c(p["RDB2"], out, mode, negative_slope)
    out = residual_dense_block_5c(p["RDB3"], out, mode, negative_slope)
    return out * 0.2 + x


# Upsampler/downsampler factory surface (basicblock.py:446-527). Each is a
# thin mode_conv composition whose param naming mirrors the torch
# Sequential flattening (KAIR `sequential` unwraps singles).

def upsample_pixelshuffle(p: Params, x, mode: str = "2R",
                          negative_slope: float = 0.2):
    """conv(out*r^2) + PixelShuffle(r) (+BN/act) (basicblock.py:446-450)."""
    return mode_conv(p, x, "C" + mode, negative_slope=negative_slope)


def upsample_upconv(p: Params, x, mode: str = "2R",
                    negative_slope: float = 0.2):
    """nearest-up + conv (+BN/act) (basicblock.py:456-466)."""
    up = {"2": "U", "3": "u", "4": "v"}[mode[0]]
    return mode_conv(p, x, up + "C" + mode[1:], negative_slope=negative_slope)


def upsample_convtranspose(p: Params, x, mode: str = "2R",
                           negative_slope: float = 0.2):
    """ConvTranspose(k=s=r) (+BN/act) (basicblock.py:472-477)."""
    r = int(mode[0])
    return mode_conv(p, x, "T" + mode[1:], stride=r, padding=0,
                     negative_slope=negative_slope)


def downsample_strideconv(p: Params, x, mode: str = "2R",
                          negative_slope: float = 0.2):
    """conv(k=s=r) (+BN/act) (basicblock.py:495-501)."""
    r = int(mode[0])
    return mode_conv(p, x, "C" + mode[1:], stride=r, padding=0,
                     negative_slope=negative_slope)


def downsample_maxpool(p: Params, x, mode: str = "2R", padding: int = 0,
                       negative_slope: float = 0.2):
    """maxpool(r) + conv (+BN/act) (basicblock.py:507-514). The flattened
    Sequential puts the (paramless) pool at index 0, so the conv chain
    starts at '1'."""
    r = int(mode[0])
    x = ops.max_pool2d(x, r, r)
    rest = "C" + mode[1:]
    if len(rest) == 1:
        sub = p["1"]
    else:
        sub = {str(i): p[str(i + 1)] for i in range(len(rest)) if str(i + 1) in p}
    return mode_conv(sub, x, rest, padding=padding,
                     negative_slope=negative_slope)


def downsample_avgpool(p: Params, x, mode: str = "2R", padding: int = 1,
                       negative_slope: float = 0.2):
    """avgpool(r) + conv (+BN/act) (basicblock.py:520-527)."""
    r = int(mode[0])
    x = ops.avg_pool2d(x, r, r)
    rest = "C" + mode[1:]
    if len(rest) == 1:
        sub = p["1"]
    else:
        sub = {str(i): p[str(i + 1)] for i in range(len(rest)) if str(i + 1) in p}
    return mode_conv(sub, x, rest, padding=padding,
                     negative_slope=negative_slope)


def non_local_block_2d(p: Params, x, act_mode: str = "B",
                       downsample: bool = False):
    """NonLocalBlock2D, embedded-gaussian (basicblock.py:543-591):
    x + W(softmax(theta(x) @ phi(x)^T / impl: no scale) @ g(x)).
    ``downsample=True`` corresponds to the maxpool-2 phi/g variant."""
    n, h, w, c = x.shape
    theta = ops.conv(p["theta"], x, padding=0).reshape(n, h * w, -1)
    if downsample:
        def pooled(q):
            v = ops.max_pool2d(x, 2, 2)
            return ops.conv(p[q]["1"], v, padding=0)
        phi = pooled("phi").reshape(n, (h // 2) * (w // 2), -1)
        g = pooled("g").reshape(n, (h // 2) * (w // 2), -1)
    else:
        phi = ops.conv(p["phi"], x, padding=0).reshape(n, h * w, -1)
        g = ops.conv(p["g"], x, padding=0).reshape(n, h * w, -1)
    prec = config.numerics().matmul_precision
    f = jnp.einsum("nqc,nkc->nqk", theta, phi, precision=prec)
    y = jnp.einsum("nqk,nkc->nqc", ops.softmax(f, axis=-1), g, precision=prec)
    y = y.reshape(n, h, w, -1)
    return mode_conv(p["W"], y, "C" + act_mode, padding=0) + x
