"""Attention primitives for the transformer-hybrid zoo models.

Window attention maps naturally onto the TPU: windows become the batch
dimension of one large MXU batch-matmul (all windows computed at once, no
host loops). Shapes are static per input size, so everything jits cleanly.

Used by: MobileSR (20, plain windows), HNCT (12) / IMDTN (9) (Swin windows
with relative position bias + shift masks), SCET (30, MDTA channel
attention).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ntire2022_esr_tpu import config, ops


def multi_head_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int,
    scale: Optional[float] = None,
    rel_bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    site: str = "mha",
) -> jax.Array:
    """Batched MHA over (B, N, C) tokens.

    ``rel_bias``: (heads, N, N) added to logits. ``mask``: (nW, N, N) added
    per window group (B must be a multiple of nW; Swin shift mask layout).
    ``site``: model key for the per-site config.attn_bf16 AUTO gate.
    """
    nm = config.numerics()
    b, n, c = q.shape
    d = c // num_heads
    if scale is None:
        scale = d ** -0.5

    def split(t):
        return t.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    attn = jnp.einsum("bhnd,bhmd->bhnm", qh, kh, precision=nm.matmul_precision) * scale
    if rel_bias is not None:
        attn = attn + rel_bias[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(b // nw, nw, num_heads, n, n) + mask[None, :, None]
        attn = attn.reshape(b, num_heads, n, n)
    # The (B, heads, N, N) logits/probs are materialized through the
    # matmul->softmax->matmul boundary — the dominant HBM traffic of the
    # window-attention models. config.attn_bf16 stores them in bf16 (the
    # converts fuse into the dot epilogue / softmax fusion); softmax still
    # reduces in f32. Only meaningful on f32 activations: in `fast` mode
    # everything is already bf16 and the pre-knob pure-bf16 graph (the one
    # the published fast-envelope numbers were measured on) is kept as-is.
    ab = config.attn_bf16(site)
    store = jnp.float16 if ab == "scores_f16" else jnp.bfloat16
    if ab in ("scores", "scores_f16") and attn.dtype == jnp.float32:
        # the f32 upcast fuses into the softmax, so the tensor that lives
        # in HBM between the dot and the softmax is the 2-byte one
        attn = attn.astype(store).astype(jnp.float32)
    probs = jax.nn.softmax(attn, axis=-1)
    if ab in ("probs", "scores", "scores_f16") and probs.dtype == jnp.float32:
        # 2-byte probs x 2-byte v with f32 accumulation. bf16 rides the
        # MXU natively; f16 is upcast by XLA (3 more mantissa bits for the
        # same HBM bytes). HIGHEST/HIGH multi-pass is meaningless here.
        probs = probs.astype(store)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, vh.astype(store),
                         precision=jax.lax.Precision.DEFAULT,
                         preferred_element_type=jnp.float32)
    else:
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, vh,
                         precision=nm.matmul_precision)
    return out.transpose(0, 2, 1, 3).reshape(b, n, c)


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, ws*ws, C); H, W must be multiples of ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * (h // ws) * (w // ws), ws * ws, c)


def window_reverse(windows: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def pad_to_multiple(x: jax.Array, m: int) -> Tuple[jax.Array, int, int]:
    """Zero-pad bottom/right so H, W are multiples of m (torch F.pad order)."""
    b, h, w, c = x.shape
    pad_b = (m - h % m) % m
    pad_r = (m - w % m) % m
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    return x, pad_b, pad_r


def swin_shift_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Swin SW-MSA attention mask, (nW, ws*ws, ws*ws) with 0 / -100 entries.

    Host-side numpy (static per shape) — mirrors the reference mask build
    (team12_hnct/SwinT.py calculate_mask).
    """
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    m = img_mask.reshape(1, h // ws, ws, w // ws, ws, 1).transpose(0, 1, 3, 2, 4, 5)
    m = m.reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def relative_position_index(ws: int) -> np.ndarray:
    """Swin relative position index table, (ws*ws, ws*ws) ints (host-side)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def mdta_channel_attention(p, x, num_heads: int, temperature: jax.Array) -> jax.Array:
    """Restormer MDTA (SCET/team30_scet.py:101-132): attention over the
    channel dimension with L2-normalised q/k and a learned temperature.

    ``p`` holds qkv (1x1 conv), qkv_dwconv (depthwise 3x3), project_out.
    """
    nm = config.numerics()
    n, h, w, c = x.shape
    qkv = ops.conv(p["qkv"], x, padding=0)
    qkv = ops.conv(p["qkv_dwconv"], qkv, groups=qkv.shape[-1])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    d = c // num_heads

    def split(t):  # (n, h, w, c) -> (n, heads, d, h*w)  [channel-token layout]
        return t.reshape(n, h * w, num_heads, d).transpose(0, 2, 3, 1)

    qh, kh, vh = split(q), split(k), split(v)
    qh = qh / jnp.maximum(jnp.linalg.norm(qh, axis=-1, keepdims=True), 1e-12)
    kh = kh / jnp.maximum(jnp.linalg.norm(kh, axis=-1, keepdims=True), 1e-12)
    attn = jnp.einsum("nhdp,nhep->nhde", qh, kh, precision=nm.matmul_precision)
    attn = attn * temperature.reshape(num_heads, 1, 1)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("nhde,nhep->nhdp", attn, vh, precision=nm.matmul_precision)
    out = out.transpose(0, 3, 1, 2).reshape(n, h, w, c)
    return ops.conv(p["project_out"], out, padding=0)
