"""Core NHWC neural-net primitives for the SR model zoo.

Layout conventions (TPU-first):
- Activations: NHWC (channels-last feeds the MXU's lane dimension).
- Conv weights: HWIO ``(kh, kw, in_ch/groups, out_ch)``. The checkpoint
  porter transposes PyTorch OIHW weights once at load.
- Linear weights: ``(in, out)`` (PyTorch stores ``(out, in)``).

Semantics match the PyTorch ops used by the reference model zoo
(/root/reference/models/*) so ported weights reproduce outputs bit-closely:
explicit symmetric zero padding (never XLA 'SAME'), LeakyReLU slopes as
given, PReLU per-channel broadcast on the last axis, exact GELU, torch
pixel-(un)shuffle channel ordering.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ntire2022_esr_tpu import config

Params = dict
IntOr2 = Union[int, Tuple[int, int]]


def _pair(v: IntOr2) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


# ---------------------------------------------------------------------------
# Convolution
# ---------------------------------------------------------------------------

def block_diag_weights(blocks):
    """Assemble per-branch HWIO conv weights into ONE dense block-diagonal
    weight: branch ``i`` reads its own slice of input channels and writes
    its own slice of output channels; off-block weights are zero, so the
    merged conv is exact. The single shared implementation behind the
    grouped-conv densify (in-graph flag and load-time porter transform)
    and the sibling branch-pair fusions. Accepts np arrays (host/porter
    path) or jnp/traced arrays (in-graph path)."""
    kh, kw = int(blocks[0].shape[0]), int(blocks[0].shape[1])
    cin = sum(int(w.shape[2]) for w in blocks)
    cout = sum(int(w.shape[3]) for w in blocks)
    host = all(isinstance(w, np.ndarray) for w in blocks)
    dense = (np if host else jnp).zeros((kh, kw, cin, cout), blocks[0].dtype)
    ci = co = 0
    for w in blocks:
        ni, no = ci + int(w.shape[2]), co + int(w.shape[3])
        if host:
            dense[:, :, ci:ni, co:no] = w
        else:
            dense = dense.at[:, :, ci:ni, co:no].set(w)
        ci, co = ni, no
    return dense


def concat_biases(pairs, dtype):
    """Concatenate per-branch conv biases for a merged conv, zero-filling
    branches without one. ``pairs``: [(bias_or_None, out_width), ...];
    returns None when no branch has a bias."""
    if all(b is None for b, _ in pairs):
        return None
    return jnp.concatenate([b if b is not None else jnp.zeros((n,), dtype)
                            for b, n in pairs])


def _block_diag_dense(w: jax.Array, groups: int) -> jax.Array:
    """Expand grouped-conv HWIO weights (kh, kw, cin/g, cout) to the exact
    dense block-diagonal form (kh, kw, cin, cout); group ``gi`` contributes
    only to output channels [gi*cout/g, (gi+1)*cout/g)."""
    cout_g = int(w.shape[3]) // groups
    return block_diag_weights(
        [w[:, :, :, gi * cout_g:(gi + 1) * cout_g] for gi in range(groups)])


# f16 overflow guard. float16's finite range (+-65504) is narrower than
# several dr=255 models' pre-activation values (FMEN/AALN observed ~1e5):
# an unguarded cast produces inf and the first inf-inf downstream turns the
# whole image NaN. In f16 tiers every lossy boundary saturates instead —
# the cast into f16 clips in f32 first, and the (f16-typed) matmul/conv
# output clips inf back to the max finite value. Zero-cost in every other
# mode (the guards compile away), and a no-op wherever values stay in
# range, so guarded f16 == unguarded f16 on the 40/42 models that never
# overflowed.
_F16_MAX = 65504.0


def cast_compute(a: jax.Array, dtype) -> jax.Array:
    """Cast to the compute dtype, saturating (not inf-ing) into float16."""
    if dtype == jnp.float16 and a.dtype != jnp.float16:
        a = jnp.clip(a, -_F16_MAX, _F16_MAX)
    return a.astype(dtype)


def saturate_f16(out: jax.Array) -> jax.Array:
    """Clamp f16 accumulator overflow (inf) to the max finite f16."""
    if out.dtype == jnp.float16:
        return jnp.clip(out, -_F16_MAX, _F16_MAX)
    return out


def store_out(out: jax.Array, nm) -> jax.Array:
    """Contraction epilogue: clamp f16 overflow, then round into the
    storage dtype when the mode separates storage from compute (fasthi/
    fasthi16: f32 contraction, 2-byte inter-layer tensors — the cast
    fuses into the producing kernel so HBM sees 2-byte activations). An
    f16 storage dtype saturates on the way in (cast_compute) like every
    other f16 boundary. A no-op in every mode with storage_dtype=None."""
    out = saturate_f16(out)
    sd = nm.storage_dtype
    if sd is not None and out.dtype != sd:
        out = cast_compute(out, sd)
    return out


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride: IntOr2 = 1,
    padding: Optional[IntOr2] = None,
    dilation: IntOr2 = 1,
    groups: int = 1,
) -> jax.Array:
    """2-D convolution, NHWC x HWIO -> NHWC.

    ``padding=None`` means the torch-conventional ``dilation * (k // 2)``
    per spatial dim (i.e. 'same' for odd kernels at stride 1). Pass an int
    or pair for explicit symmetric zero padding (e.g. 0 for VALID convs in
    ESA blocks, reference models/rfdn_baseline/block.py:112).
    """
    kh, kw = int(w.shape[0]), int(w.shape[1])
    s = _pair(stride)
    d = _pair(dilation)
    if padding is None:
        padding = (d[0] * (kh // 2), d[1] * (kw // 2))
    ph, pw = _pair(padding)
    if groups > 1 and int(w.shape[2]) == int(x.shape[-1]):
        # weights were densified at load (porter/pad.densify_grouped_weights
        # — block-diagonal, exact): a grouped weight always has
        # cin/g < cin, so a full-cin weight IS the dense form
        groups = 1
    elif groups > 1 and int(w.shape[2]) > 1 and config.densify_grouped():
        # layout experiment (config.densify_grouped): densify per call —
        # exact, trades g x MACs for full MXU contraction tiles
        w = _block_diag_dense(w, groups)
        groups = 1
    nm = config.numerics()
    out = lax.conv_general_dilated(
        cast_compute(x, nm.compute_dtype),
        cast_compute(w, nm.compute_dtype),
        window_strides=s,
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=d,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=nm.conv_precision,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return store_out(out, nm)


def dequant_weight(p: Params) -> jax.Array:
    """w8 tier (porter/quant.py): int8 weight x per-output-channel scale,
    dequantized in the active compute dtype (the multiply fuses into the
    conv prologue; storage stays 1 byte/tap in HBM). A no-op passthrough
    for float weights — EVERY direct ``p["weight"]`` compute site must go
    through this so the tier composes with the fusion paths."""
    w = p["weight"]
    if w.dtype == jnp.int8:
        dt = config.numerics().compute_dtype
        return w.astype(dt) * p["weight_scale"].astype(dt)
    return w


_dequant = dequant_weight


def conv(p: Params, x: jax.Array, **kw) -> jax.Array:
    """Apply a conv layer from a param dict ``{'weight': HWIO, 'bias'?}``
    (int8 weights with 'weight_scale' dequantize on the fly)."""
    return conv2d(x, _dequant(p), p.get("bias"), **kw)


def conv_transpose2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride: IntOr2 = 2,
    padding: IntOr2 = 0,
    output_padding: IntOr2 = 0,
    groups: int = 1,
) -> jax.Array:
    """torch.nn.ConvTranspose2d semantics via input-dilated convolution.

    Weights are expected pre-converted by the porter to HWIO with spatially
    flipped taps: torch stores transpose-conv weights as (I, O/g, kh, kw);
    the porter emits ``w[kh,kw,I/g? ...]`` -- concretely
    ``flip(permute(w,(2,3,0,1)))`` giving (kh, kw, I, O/g) -> reshaped so a
    regular HWIO conv with lhs_dilation reproduces the op.
    """
    if groups != 1:
        # The porter's transpose rule emits (kh, kw, I, O) taps; grouped
        # transpose convs additionally need per-group channel reordering
        # that is not implemented — fail loudly rather than compute wrong
        # results (no zoo model uses one).
        raise NotImplementedError("conv_transpose2d supports groups=1 only")
    kh, kw = int(w.shape[0]), int(w.shape[1])
    s = _pair(stride)
    ph, pw = _pair(padding)
    oph, opw = _pair(output_padding)
    nm = config.numerics()
    out = lax.conv_general_dilated(
        cast_compute(x, nm.compute_dtype),
        cast_compute(w, nm.compute_dtype),
        window_strides=(1, 1),
        padding=((kh - 1 - ph, kh - 1 - ph + oph), (kw - 1 - pw, kw - 1 - pw + opw)),
        lhs_dilation=s,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=nm.conv_precision,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return store_out(out, nm)


def linear(p: Params, x: jax.Array) -> jax.Array:
    """Dense layer on the last axis; weight stored (in, out); int8 weights
    with 'weight_scale' dequantize on the fly (w8 tier)."""
    nm = config.numerics()
    out = jnp.dot(
        cast_compute(x, nm.compute_dtype),
        cast_compute(_dequant(p), nm.compute_dtype),
        precision=nm.matmul_precision,
    )
    if "bias" in p and p["bias"] is not None:
        out = out + p["bias"].astype(out.dtype)
    return store_out(out, nm)


# ---------------------------------------------------------------------------
# Activations (VPU element-wise)
# ---------------------------------------------------------------------------

def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0)


def leaky_relu(x: jax.Array, negative_slope: float = 0.01) -> jax.Array:
    return jnp.where(x >= 0, x, x * negative_slope)


def prelu(x: jax.Array, w: jax.Array) -> jax.Array:
    """torch PReLU: slope per channel (last axis here) or a single scalar."""
    return jnp.where(x >= 0, x, x * w.astype(x.dtype))


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU = torch.nn.GELU() default."""
    return jax.nn.gelu(x, approximate=False)


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def sigmoid(x: jax.Array) -> jax.Array:
    return jax.nn.sigmoid(x)


def relu6(x: jax.Array) -> jax.Array:
    return jnp.clip(x, 0, 6)


def softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    return jax.nn.softmax(x, axis=axis)


# ---------------------------------------------------------------------------
# Pooling
# ---------------------------------------------------------------------------

def max_pool2d(x: jax.Array, kernel: IntOr2, stride: IntOr2, padding: IntOr2 = 0) -> jax.Array:
    """torch F.max_pool2d (floor mode) on NHWC."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x, neg, lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )


def avg_pool2d(x: jax.Array, kernel: IntOr2, stride: Optional[IntOr2] = None,
               padding: IntOr2 = 0, count_include_pad: bool = True) -> jax.Array:
    """torch F.avg_pool2d on NHWC.

    ``count_include_pad=True`` (the torch default) divides every window by
    kh*kw, counting zero padding as real samples; ``False`` divides by the
    number of valid (in-bounds) pixels per window.
    """
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride if stride is not None else kernel)
    ph, pw = _pair(padding)
    # f16 guard: window sums overflow float16's +-65504 at dr=255 activation
    # scales; accumulate in f32 and cast back (free in every other dtype)
    in_dtype = x.dtype
    if in_dtype == jnp.float16:
        x = x.astype(jnp.float32)
    summed = lax.reduce_window(
        x, jnp.array(0, x.dtype), lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )
    if count_include_pad or (ph == 0 and pw == 0):
        return (summed / (kh * kw)).astype(in_dtype)
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
    cnt = lax.reduce_window(
        ones, jnp.array(0, x.dtype), lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )
    return (summed / cnt).astype(in_dtype)


def _acc_dtype(x: jax.Array):
    """f32 accumulation for f16 inputs (sums overflow f16's finite range)."""
    return jnp.float32 if x.dtype == jnp.float16 else x.dtype


def global_avg_pool(x: jax.Array, keepdims: bool = True) -> jax.Array:
    """AdaptiveAvgPool2d(1) on NHWC."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims,
                    dtype=_acc_dtype(x)).astype(x.dtype)


def global_max_pool(x: jax.Array, keepdims: bool = True) -> jax.Array:
    return jnp.max(x, axis=(1, 2), keepdims=keepdims)


def global_std_pool(x: jax.Array, keepdims: bool = True) -> jax.Array:
    """torch.std over spatial dims (unbiased, as torch defaults)."""
    n = x.shape[1] * x.shape[2]
    acc = _acc_dtype(x)
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=acc)
    var = jnp.sum((x.astype(acc) - mean) ** 2, axis=(1, 2),
                  keepdims=keepdims, dtype=acc) / max(n - 1, 1)
    return jnp.sqrt(var).astype(x.dtype)


# ---------------------------------------------------------------------------
# Normalisation
# ---------------------------------------------------------------------------

def batch_norm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Inference-mode BatchNorm2d using running stats; channels last."""
    mean = p["running_mean"].astype(x.dtype)
    var = p["running_var"].astype(x.dtype)
    inv = lax.rsqrt(var + eps)
    out = (x - mean) * inv
    if "weight" in p:
        out = out * p["weight"].astype(x.dtype)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def instance_norm(p: Optional[Params], x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm2d (per-sample, per-channel over H, W; torch eval
    semantics with track_running_stats=False: normalize by the instance
    statistics). ``p`` carries the optional affine weight/bias."""
    acc = _acc_dtype(x)
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=acc).astype(x.dtype)
    var = jnp.var(x.astype(acc), axis=(1, 2), keepdims=True).astype(x.dtype)
    out = (x - mean) * lax.rsqrt(var + eps)
    if p and "weight" in p:
        out = out * p["weight"].astype(x.dtype)
    if p and "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def layer_norm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis (transformer blocks)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    out = (x - mean) * lax.rsqrt(var + eps)
    if "weight" in p:
        out = out * p["weight"].astype(x.dtype)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


# ---------------------------------------------------------------------------
# Pixel shuffle family (torch channel ordering)
# ---------------------------------------------------------------------------

def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """Depth-to-space with torch's NCHW channel-major (C, r, r) ordering.

    out[n, h*r+i, w*r+j, c] == in[n, h, w, c*r*r + i*r + j]
    (reference tail: models/rfdn_baseline/block.py pixelshuffle_block).
    """
    n, h, w, c = x.shape
    cout = c // (r * r)
    x = x.reshape(n, h, w, cout, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, rh, w, rw, c
    return x.reshape(n, h * r, w * r, cout)


def pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    """Space-to-depth, exact inverse of :func:`pixel_shuffle`."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h', w', c, rh, rw
    return x.reshape(n, h // r, w // r, c * r * r)


def channel_shuffle(x: jax.Array, groups: int) -> jax.Array:
    """torch channel_shuffle on the last axis."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = x.swapaxes(3, 4)
    return x.reshape(n, h, w, c)


# ---------------------------------------------------------------------------
# Padding helpers
# ---------------------------------------------------------------------------

def zero_pad2d(x: jax.Array, pad: Sequence[int]) -> jax.Array:
    """torch F.pad NCHW order (left, right, top, bottom) applied to NHWC."""
    l, r, t, b = pad
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


def reflect_pad2d(x: jax.Array, pad: Sequence[int]) -> jax.Array:
    l, r, t, b = pad
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="reflect")


def replicate_pad2d(x: jax.Array, pad: Sequence[int]) -> jax.Array:
    l, r, t, b = pad
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge")


# ---------------------------------------------------------------------------
# MeanShift (fixed 1x1 conv used by EDSR-style nets: models 11, 23, 43)
# ---------------------------------------------------------------------------

def mean_shift(x: jax.Array, rgb_range: float, sign: int = -1,
               rgb_mean=(0.4488, 0.4371, 0.4040), rgb_std=(1.0, 1.0, 1.0)) -> jax.Array:
    std = jnp.asarray(rgb_std, x.dtype)
    mean = jnp.asarray(rgb_mean, x.dtype)
    return x / std + sign * rgb_range * mean / std
