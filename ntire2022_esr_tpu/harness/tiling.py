"""Overlap-tiled inference (reference test_demo.py:364-391 semantics).

For models whose whole-image footprint exceeds memory (reference model 2,
NLFFC, tile=256/overlap=32), the image is swept with overlapping tiles and
outputs are blended by accumulate / divide-by-coverage.

TPU-native design: the tile grid is *batched* — all tiles are gathered into
one (T, tile, tile, C) batch and run through the model in a single jitted
call (one big MXU-friendly batch instead of the reference's sequential
Python loop), then scatter-added into the output canvas. Tile positions are
static for a given image shape, so everything stays inside one jit trace.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _tile_starts(size: int, tile: int, stride: int):
    starts = list(range(0, size - tile, stride)) + [size - tile]
    return starts


def tiled_apply(
    apply: Callable,
    params,
    x: jax.Array,
    tile: int,
    tile_overlap: int = 32,
    scale: int = 4,
    batch_tiles: bool = True,
    max_tiles_per_call: int = 16,
) -> jax.Array:
    """Run ``apply`` over overlapping tiles and blend (equal-weight overlap).

    Matches the reference's E/W accumulate exactly: each output pixel is the
    mean of every tile forward that covered it.

    ``max_tiles_per_call`` caps the tile batch per model call: tiling exists
    because the whole-image footprint blows memory, so a 2K-class image
    (hundreds of tiles) must not be re-materialised as one giant batch.
    Chunks blend into the canvas before the next chunk runs, so live memory
    is one chunk of x4 outputs plus the canvas.
    """
    n, h, w, c = x.shape
    if n != 1:
        raise ValueError(f"tiled_apply expects a single image (N==1); got N={n}")
    tile = min(tile, h, w)
    stride = tile - tile_overlap
    h_idx = _tile_starts(h, tile, stride)
    w_idx = _tile_starts(w, tile, stride)
    coords = [(hi, wi) for hi in h_idx for wi in w_idx]

    e = None
    cov = None

    def _blend(e, cov, outs, chunk):
        for t, (hi, wi) in enumerate(chunk):
            e = jax.lax.dynamic_update_slice(
                e,
                jax.lax.dynamic_slice(
                    e, (0, hi * scale, wi * scale, 0), (1, tile * scale, tile * scale, e.shape[3])
                ) + outs[t][None],
                (0, hi * scale, wi * scale, 0),
            )
            cov = jax.lax.dynamic_update_slice(
                cov,
                jax.lax.dynamic_slice(
                    cov, (0, hi * scale, wi * scale, 0), (1, tile * scale, tile * scale, 1)
                ) + 1.0,
                (0, hi * scale, wi * scale, 0),
            )
        return e, cov

    chunk_size = max(1, max_tiles_per_call) if batch_tiles else 1
    for start in range(0, len(coords), chunk_size):
        chunk = coords[start:start + chunk_size]
        if batch_tiles:
            patches = jnp.stack([x[0, hi:hi + tile, wi:wi + tile, :] for hi, wi in chunk], axis=0)
            outs = apply(params, patches)  # (T, tile*s, tile*s, C)
        else:
            (hi, wi) = chunk[0]
            outs = apply(params, x[:, hi:hi + tile, wi:wi + tile, :])
        if e is None:
            e = jnp.zeros((1, h * scale, w * scale, outs.shape[-1]), outs.dtype)
            cov = jnp.zeros((1, h * scale, w * scale, 1), outs.dtype)
        e, cov = _blend(e, cov, outs, chunk)
    return e / cov


def forward(
    apply: Callable,
    params,
    x: jax.Array,
    tile: Optional[int] = None,
    tile_overlap: int = 32,
    scale: int = 4,
    max_tiles_per_call: int = 16,
) -> jax.Array:
    """Whole-image or tiled forward — the reference `forward` contract."""
    if tile is None:
        return apply(params, x)
    return tiled_apply(apply, params, x, tile, tile_overlap, scale,
                       max_tiles_per_call=max_tiles_per_call)
