"""Reusable Swin transformer layer for the hybrid zoo models (9, 12).

Mirrors the vendored Swin in the reference (team12_hnct/SwinT.py:82-260,
team09_imdtn/network_swinir.py): window attention with relative position
bias, cyclic shift + static shift masks, token MLPs. All windows across the
image form one MXU batch; masks/bias indices are host-side static tables.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ntire2022_esr_tpu import ops
from ntire2022_esr_tpu.ops import attention as attn_ops


def window_attention(p, x, num_heads: int, ws: int, mask: Optional[np.ndarray] = None,
                     scale: Optional[float] = None, site: str = "swin"):
    """x: (B_, N, C) window tokens; p has qkv/proj linears + rel-bias table."""
    b_, n, c = x.shape
    qkv = ops.linear(p["qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    idx = attn_ops.relative_position_index(ws).reshape(-1)
    table = p["relative_position_bias_table"]
    rel_bias = table[idx].reshape(n, n, num_heads).transpose(2, 0, 1)
    mask_j = jnp.asarray(mask) if mask is not None else None
    out = attn_ops.multi_head_attention(
        q, k, v, num_heads, scale=scale, rel_bias=jnp.asarray(rel_bias), mask=mask_j,
        site=site)
    return ops.linear(p["proj"], out)


def swin_block(p, tokens, size, num_heads: int, ws: int, shift: int, mlp_act=ops.gelu,
               pre_norm: bool = False, site: str = "swin"):
    """One (S)W-MSA block on (B, H*W, C) tokens.

    ``pre_norm=False`` matches HNCT's variant whose norm1/norm2 are
    commented out (SwinT.py:104-110); SwinIR (model 9) uses pre_norm=True.
    """
    h, w = size
    b, l, c = tokens.shape
    shortcut = tokens
    x = ops.layer_norm(p["norm1"], tokens) if pre_norm else tokens
    x = x.reshape(b, h, w, c)
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    windows = attn_ops.window_partition(x, ws)
    mask = attn_ops.swin_shift_mask(h, w, ws, shift) if shift > 0 else None
    windows = window_attention(p["attn"], windows, num_heads, ws, mask, site=site)
    x = attn_ops.window_reverse(windows, ws, h, w)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = shortcut + x.reshape(b, l, c)

    mlp_in = ops.layer_norm(p["norm2"], x) if pre_norm else x
    mlp = p["mlp"]
    x = x + ops.linear(mlp["fc2"], mlp_act(ops.linear(mlp["fc1"], mlp_in)))
    return x
