"""Sharded batch evaluation: pjit data parallelism over images/tiles.

Design (SURVEY §2.3 TPU-native equivalent): the DIV2K set — or the tile
grid of one large image — is a batch of independent forwards. We shard the
batch axis across the mesh's ``data`` axis with NamedSharding, replicate
params, and let XLA partition the whole program; per-image metric scalars
are the only cross-device values (one tiny all_gather at the end, riding
ICI). No NCCL-style code: collectives are inserted by the compiler from
sharding annotations.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_batch_apply(apply: Callable, mesh: Mesh, axis: str = "data") -> Callable:
    """Jit ``apply(params, batch)`` with the batch sharded over ``axis``.

    Params are replicated; activations inherit the batch sharding, so the
    forward is embarrassingly parallel over ICI.
    """
    batch_sharding = NamedSharding(mesh, P(axis, None, None, None))
    replicated = NamedSharding(mesh, P())

    return jax.jit(
        apply,
        in_shardings=(replicated, batch_sharding),
        out_shardings=batch_sharding,
    )


def sharded_eval_step(apply: Callable, mesh: Mesh, data_range: float = 1.0,
                      axis: str = "data") -> Callable:
    """Full sharded eval step: forward + per-image MSE vs HR references.

    Returns jitted ``step(params, lr_batch, hr_batch) -> (sr, per_image_mse)``
    where ``per_image_mse`` is fully replicated (the compiler inserts the
    all_gather). MSE is computed in the [0,255] uint8 domain the challenge
    scores in (clamp + round + border crop 4, test_demo.py:447).
    """
    batch_sharding = NamedSharding(mesh, P(axis, None, None, None))
    replicated = NamedSharding(mesh, P())

    def step(params, lr, hr):
        sr = apply(params, lr)
        sr255 = jnp.round(jnp.clip(sr, 0, data_range) * (255.0 / data_range))
        b = 4
        diff = (sr255 - hr)[:, b:-b, b:-b, :].astype(jnp.float32)
        mse = jnp.mean(diff * diff, axis=(1, 2, 3))
        return sr, mse

    return jax.jit(
        step,
        in_shardings=(replicated, batch_sharding, batch_sharding),
        out_shardings=(batch_sharding, replicated),
    )


def psnr_from_mse(mse: jax.Array) -> jax.Array:
    return 20.0 * jnp.log10(255.0) - 10.0 * jnp.log10(mse)


def sharded_tiled_apply(apply: Callable, mesh: Mesh, params, x: jax.Array,
                        tile: int, tile_overlap: int = 32, scale: int = 4,
                        axis: str = "data") -> jax.Array:
    """Image-plane parallelism: shard one image's overlap-tile grid over ICI.

    The spatial analogue of context parallelism (SURVEY §5): tiles are read
    with overlap from the (replicated) input, so the forward needs no halo
    exchange; the accumulate/divide blend is device-local after a gathered
    tile batch. The tile count is padded to a multiple of the mesh size
    with zero tiles (masked out of the blend by the coverage counter).
    """
    from ntire2022_esr_tpu.harness import tiling

    n, h, w, c = x.shape
    tile = min(tile, h, w)
    stride = tile - tile_overlap
    h_idx = tiling._tile_starts(h, tile, stride)
    w_idx = tiling._tile_starts(w, tile, stride)
    t = len(h_idx) * len(w_idx)
    nd = mesh.devices.size
    t_pad = (-t) % nd

    batch_sharding = NamedSharding(mesh, P(axis, None, None, None))
    replicated = NamedSharding(mesh, P())

    def run(params, patches):
        return apply(params, patches)

    jitted = jax.jit(run, in_shardings=(replicated, batch_sharding),
                     out_shardings=batch_sharding)

    patches = jnp.stack(
        [x[0, hi:hi + tile, wi:wi + tile, :] for hi in h_idx for wi in w_idx]
        + [jnp.zeros((tile, tile, c), x.dtype)] * t_pad,
        axis=0,
    )
    outs = jitted(params, patches)

    e = jnp.zeros((n, h * scale, w * scale, c), outs.dtype)
    cov = jnp.zeros((1, h * scale, w * scale, 1), outs.dtype)
    k = 0
    for hi in h_idx:
        for wi in w_idx:
            sl = (slice(None), slice(hi * scale, (hi + tile) * scale),
                  slice(wi * scale, (wi + tile) * scale), slice(None))
            e = e.at[sl].add(outs[k][None])
            cov = cov.at[(slice(None),) + sl[1:3] + (slice(None),)].add(1.0)
            k += 1
    return e / cov
