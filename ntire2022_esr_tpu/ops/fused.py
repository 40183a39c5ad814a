"""Fused upsample+conv lowerings (TPU layout/memory optimization).

``conv3x3(nearest_x2(x))`` — the progressive-upsampler idiom of m_RFDN
(team33_m_rfdn/m_RFDN.py:22-51), LWFANet (team27_lwfanet.py:92-122) — is
the single hottest pattern in those models (>50% of MACs, run at the
upsampled resolution). This module lowers it EXACTLY as a low-resolution
conv + pixel_shuffle:

    y[2i+a, 2j+b, o] = sum_{dy,dx} W[dy,dx,:,o] * x[floor((2i+a+dy)/2),
                                                    floor((2j+b+dx)/2), :]

Each output parity (a, b) reads a fixed set of LR taps, with coincident
taps' weights SUMMED; stacking the 4 parities as output channels gives one
3x3 conv at LR with 4*cout channels, followed by depth-to-space. Wins:

- the (2H, 2W, C) nearest-upsampled intermediate never exists in HBM
  (batch 8 LWFANet: ~3.2 GB of activation traffic removed);
- conv input reads are 1/4 the bytes;
- the MXU lane dimension sees 4*cout channels (e.g. 96 -> 384) instead of
  a fraction of one 128-lane tile.

Exact up to f32 reassociation (two coincident taps' weights are added
once, ahead of the conv). Boundary semantics match: HR zero padding rows
map one-to-one onto LR zero padding rows. Opt-in via
config.set_fuse_upsample_conv / NTIRE_FUSE_UPSAMPLE_CONV=1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ntire2022_esr_tpu import config
from ntire2022_esr_tpu.ops import nn as _nn

# A[a, r, dy]: weight of original tap offset dy (in {-1,0,1} -> index 0..2)
# on LR tap offset r (same indexing) for output parity a.
#   a=0: floor((2i+dy)/2)   = i-1 (dy=-1), i (dy=0), i (dy=1)
#   a=1: floor((2i+1+dy)/2) = i   (dy=-1), i (dy=0), i+1 (dy=1)
_A = np.array(
    [[[1, 0, 0], [0, 1, 1], [0, 0, 0]],
     [[0, 0, 0], [1, 1, 0], [0, 0, 1]]], dtype=np.float32)


def nearest2_conv_weights(w: jax.Array, b=None):
    """(3,3,cin,cout) HR conv taps -> (3,3,cin,4*cout) LR taps (+ bias),
    channel order (o, a, b) matching ops.pixel_shuffle(..., 2)."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3), "nearest2_conv supports 3x3 kernels"
    a_m = jnp.asarray(_A)
    # w4[r, s, c, o, a, b] = sum_{d,e} A[a,r,d] A[b,s,e] w[d,e,c,o]
    w4 = jnp.einsum("ard,bse,deco->rscoab", a_m, a_m, w)
    w4 = w4.reshape(3, 3, cin, cout * 4)
    b4 = None if b is None else jnp.repeat(b, 4)
    return w4, b4


def nearest2_conv(p, x: jax.Array) -> jax.Array:
    """Exact ``conv(p, nearest_x2(x), padding=1)`` without materializing
    the upsampled intermediate."""
    w4, b4 = nearest2_conv_weights(_nn.dequant_weight(p), p.get("bias"))
    out = _nn.conv2d(x, w4, b4, padding=1)
    return _nn.pixel_shuffle(out, 2)


def parallel_conv_pair(p_1x1, p_kxk, x: jax.Array, dilation: int = 1):
    """One conv for two sibling convs reading the SAME input: a 1x1
    (pad 0) and a kxk (same-pad), their outputs kept separate.

    The RFDN distillation idiom — ``c{i}_d`` (1x1 distill) and ``c{i}_r``
    (3x3 residual) both read ``h`` (models/rfdn_baseline/block.py:132-166)
    — issues two lane-starved convs per stage. Embedding the 1x1 at the
    center tap of a kxk zero kernel and concatenating output channels
    yields ONE conv with d+r output lanes and half the dispatches; the
    center tap of a dilated kernel is still offset 0, so any dilation
    composes. Exact up to f32 reassociation (zero taps contribute zeros;
    XLA reduction blocking may reorder real terms).

    Returns ``(out_1x1, out_kxk)``.
    """
    w1 = _nn.dequant_weight(p_1x1)  # (1, 1, cin, d)
    wk = _nn.dequant_weight(p_kxk)  # (kh, kw, cin, r)
    kh, kw = int(wk.shape[0]), int(wk.shape[1])
    d = int(w1.shape[-1])
    w1e = jnp.zeros(wk.shape[:3] + (d,), w1.dtype)
    w1e = w1e.at[kh // 2, kw // 2].set(w1[0, 0])
    w = jnp.concatenate([w1e, wk], axis=-1)
    b = _nn.concat_biases([(p_1x1.get("bias"), d),
                           (p_kxk.get("bias"), int(wk.shape[-1]))], w.dtype)
    out = _nn.conv2d(x, w, b, dilation=dilation)
    return out[..., :d], out[..., d:]


def parallel_conv_same(ps, x: jax.Array, **kw):
    """One conv for N sibling convs with IDENTICAL kernel geometry reading
    the SAME input; outputs returned as per-branch slices.

    Unlike :func:`parallel_conv_pair` no kernel zero-padding is needed, so
    the merged conv does EXACTLY the same MACs — it just packs the output
    lanes (e.g. LWFANet's four 24-lane branch heads -> one 96-lane conv,
    team27_lwfanet.py:39-50) and reads the shared input from HBM once
    instead of N times. Exact up to f32 reassociation is not even needed:
    per output channel the reduction is the branch's own, so the fusion is
    output-exact. ``kw`` forwards to conv2d (padding/stride/dilation must
    be shared by the siblings)."""
    widths = [int(p["weight"].shape[-1]) for p in ps]
    w = jnp.concatenate([_nn.dequant_weight(p) for p in ps], axis=-1)
    b = _nn.concat_biases([(p.get("bias"), n) for p, n in zip(ps, widths)],
                          w.dtype)
    out = _nn.conv2d(x, w, b, **kw)
    outs, c = [], 0
    for n in widths:
        outs.append(out[..., c:c + n])
        c += n
    return outs


def upconv_nearest2(p, x: jax.Array) -> jax.Array:
    """The models' upsampler step: fused lowering when enabled
    (config.fuse_upsample_conv), reference-shaped graph otherwise."""
    if config.fuse_upsample_conv() and p["weight"].shape[:2] == (3, 3):
        return nearest2_conv(p, x)
    from ntire2022_esr_tpu.ops.resize import interpolate

    up = interpolate(x, scale_factor=2, mode="nearest")
    return _nn.conv2d(up, _nn.dequant_weight(p), p.get("bias"))
