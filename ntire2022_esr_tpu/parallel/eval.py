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

import functools
from typing import Callable, Tuple

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
