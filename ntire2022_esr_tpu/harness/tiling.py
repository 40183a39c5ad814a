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


class ChunkedTiler:
    """Dispatch-chunked overlap-tile runner (serving-oriented).

    ``tiled_apply`` is built to be traced as ONE jit graph per image shape
    (the protocol path, ``runner.run``): every chunk's model forward is
    inlined into a single executable, so big grids multiply executable size
    — that is what caps NLFFC at 2 tiles/call (reference tile semantics:
    ``test_demo.py:364-391``). This class is the opposite decomposition,
    designed for serving arbitrary shapes:

    - ONE jitted model executable over a fixed ``(chunk, tile, tile, C)``
      batch — *image-shape independent*, so a stream of differently-sized
      frames compiles the expensive body exactly once;
    - a tiny jitted gather (dynamic-slice vmap over traced tile offsets)
      and a tiny jitted blend (fori over dynamic-update-slice adds) per
      image shape — cheap compiles;
    - ragged final chunks are padded to the chunk size with repeated
      coords and MASKED in the blend (weight 0 adds nothing to either the
      accumulator or the coverage), so the equal-weight E/W mean is exact.

    Per chunk this costs one extra host->device dispatch instead of an
    inlined call — negligible against a 100+ms tile forward — and the
    executable-size ceiling now binds on ONE model instance instead of
    ceil(T/chunk) of them.
    """

    def __init__(self, apply: Callable, tile: int, tile_overlap: int = 32,
                 scale: int = 4, chunk: int = 2):
        self.tile = tile
        self.overlap = tile_overlap
        self.scale = scale
        self.chunk = max(1, chunk)
        self._run_chunk = jax.jit(lambda p, patches: apply(p, patches))

        tile_ = tile
        sc = scale

        @jax.jit
        def _gather(x, his, wis):
            def one(hi, wi):
                return jax.lax.dynamic_slice(
                    x, (0, hi, wi, 0), (1, tile_, tile_, x.shape[3]))[0]
            return jax.vmap(one)(his, wis)

        @jax.jit
        def _blend(e, cov, outs, his, wis, wts):
            ts = tile_ * sc

            def body(i, ec):
                e, cov = ec
                oh = his[i] * sc
                ow = wis[i] * sc
                patch = jax.lax.dynamic_slice(
                    e, (0, oh, ow, 0), (1, ts, ts, e.shape[3]))
                e = jax.lax.dynamic_update_slice(
                    e, patch + wts[i] * outs[i][None], (0, oh, ow, 0))
                cpatch = jax.lax.dynamic_slice(
                    cov, (0, oh, ow, 0), (1, ts, ts, 1))
                cov = jax.lax.dynamic_update_slice(
                    cov, cpatch + wts[i], (0, oh, ow, 0))
                return e, cov

            return jax.lax.fori_loop(0, outs.shape[0], body, (e, cov))

        self._gather = _gather
        self._blend = _blend

    def __call__(self, params, x: jax.Array) -> jax.Array:
        import numpy as np

        n, h, w, c = x.shape
        if n != 1:
            raise ValueError(f"ChunkedTiler expects a single image; got N={n}")
        tile = self.tile
        if tile > min(h, w):
            # degenerate small frame: single whole-image call (matches
            # tiled_apply's tile=min(tile,h,w) clamp via one unclamped tile)
            return tiled_apply(lambda p, b: self._run_chunk(p, b), params, x,
                               tile, self.overlap, self.scale,
                               max_tiles_per_call=self.chunk)
        stride = tile - self.overlap
        coords = [(hi, wi) for hi in _tile_starts(h, tile, stride)
                  for wi in _tile_starts(w, tile, stride)]
        sc = self.scale
        e = jnp.zeros((1, h * sc, w * sc, c), x.dtype)
        cov = jnp.zeros((1, h * sc, w * sc, 1), x.dtype)
        for start in range(0, len(coords), self.chunk):
            batch = coords[start:start + self.chunk]
            wts = [1.0] * len(batch)
            while len(batch) < self.chunk:   # ragged tail: pad + mask
                batch.append(batch[-1])
                wts.append(0.0)
            his = jnp.asarray(np.array([b[0] for b in batch], np.int32))
            wis = jnp.asarray(np.array([b[1] for b in batch], np.int32))
            wvec = jnp.asarray(np.array(wts, np.float32))
            patches = self._gather(x, his, wis)
            outs = self._run_chunk(params, patches)
            e, cov = self._blend(e, cov, outs, his, wis, wvec)
        return e / cov
