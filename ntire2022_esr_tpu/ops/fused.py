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
    w4, b4 = nearest2_conv_weights(p["weight"], p.get("bias"))
    out = _nn.conv2d(x, w4, b4, padding=1)
    return _nn.pixel_shuffle(out, 2)


def upconv_nearest2(p, x: jax.Array) -> jax.Array:
    """The models' upsampler step: fused lowering when enabled
    (config.fuse_upsample_conv), reference-shaped graph otherwise."""
    if config.fuse_upsample_conv() and p["weight"].shape[:2] == (3, 3):
        return nearest2_conv(p, x)
    from ntire2022_esr_tpu.ops.resize import interpolate

    up = interpolate(x, scale_factor=2, mode="nearest")
    return _nn.conv2d(up, p["weight"], p.get("bias"))
