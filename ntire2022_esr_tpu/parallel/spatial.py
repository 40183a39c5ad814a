"""Spatial (image-plane) sharding with halo exchange.

For whole-image inference on large inputs (2K/4K), the H axis is sharded
across the mesh and each device runs the model on its slab extended by an
``overlap`` halo of rows fetched from its neighbours with ``ppermute``
(one bidirectional ICI hop), then crops the halo from the x4 output.

Correctness semantics match overlap-tiled inference (harness/tiling.py,
reference test_demo.py:364-391): exact wherever ``overlap`` covers the
receptive field; the global top/bottom edges see the model's own zero
padding, exactly like the unsharded forward. Models with global spatial
operators (softmax over H*W, FFT over H) are not slab-decomposable — use
the tile runner's batched grid for those.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


class SpatialShardUnavailable(ValueError):
    """The input cannot be H-sharded over this mesh (image too small for
    the window scheme). A ValueError subclass so callers that want a
    single-device fallback can catch *exactly* this condition without
    swallowing genuine errors raised inside the sharded forward."""


def make_spatial_apply(
    apply: Callable,
    mesh: Mesh,
    overlap: int = 32,
    scale: int = 4,
    axis: str = "data",
    batch_axis: "str | None" = None,
) -> Callable:
    """Build a reusable H-sharded forward: ``fn(params, x) -> y``.

    The shard_map is constructed once, so repeated calls share jax.jit's
    shape-keyed compile cache (one compile per distinct image shape).
    x: (N, H, W, C); returns the full (N, H*scale, W*scale, C') output.

    ``batch_axis`` composes batch parallelism with the H-slab sharding on
    a 2-D mesh (mesh.data_space_mesh): the batch is sharded over
    ``batch_axis`` while each batch group H-shards over ``axis`` — e.g. 8
    chips as 4x2 so big-tail models need not choose between ``--batched``
    and ``--spatial``. The batch must divide by mesh.shape[batch_axis];
    the halo ppermute rides only the ``axis`` (space) dimension, so the
    collective pattern is identical to the 1-D case within each group.

    Two schemes, picked per input shape:

    - **halo** (H divisible by the mesh): input H-sharded, each device
      extends its slab with ``overlap`` neighbour rows via ``ppermute``
      (one bidirectional ICI hop) and crops them from the x4 output.
    - **windowed** (any H, e.g. DIV2K's odd heights): input replicated
      (LR inputs are small; the x4 activations stay sharded), each device
      slices its own ``ceil(H/n)+2*overlap``-row window — clamped to the
      image like the reference's last tile (test_demo.py:375-377), so
      boundary windows end at the true edge and the model's own zero
      padding applies there — and contributes ``ceil(H/n)`` output rows.

    Both are exact wherever ``overlap`` covers the receptive field,
    identical to overlap-tiled inference (harness/tiling.py).
    """
    n_dev = mesh.shape[axis]
    n_batch = mesh.shape[batch_axis] if batch_axis else 1
    bspec = batch_axis if batch_axis else None

    def slab_fn(p, xs):
        # xs: (N, H/n_dev, W, C) local slab
        idx = jax.lax.axis_index(axis)
        up = jax.lax.ppermute(xs[:, -overlap:], axis, [(i, (i + 1) % n_dev) for i in range(n_dev)])
        down = jax.lax.ppermute(xs[:, :overlap], axis, [(i, (i - 1) % n_dev) for i in range(n_dev)])
        dead = jnp.zeros_like(up)
        # Boundary slabs must END at the true image edge so the model's own
        # zero padding applies there (an extension of zero *inputs* is not
        # equivalent: biased convs make nonzero activations in the halo).
        # The dead block sits a full `overlap` of true rows away from the
        # slab, so it cannot contaminate the kept region.
        ext_mid = jnp.concatenate([up, xs, down], axis=1)
        ext_first = jnp.concatenate([xs, down, dead], axis=1)
        ext_last = jnp.concatenate([dead, up, xs], axis=1)
        ext = jnp.where(idx == 0, ext_first, jnp.where(idx == n_dev - 1, ext_last, ext_mid))
        out = apply(p, ext)
        slab_out = xs.shape[1] * scale
        start = jnp.where(idx == 0, 0, jnp.where(idx == n_dev - 1, 2 * overlap * scale,
                                                 overlap * scale))
        return jax.lax.dynamic_slice_in_dim(out, start, slab_out, axis=1)

    sharded = shard_map(
        slab_fn, mesh=mesh,
        in_specs=(P(), P(bspec, axis, None, None)),
        out_specs=P(bspec, axis, None, None),
        check_rep=False,
    )
    jitted = jax.jit(sharded)
    plain = jax.jit(apply)

    @functools.lru_cache(maxsize=None)
    def _windowed(h: int):
        # Per-device window geometry (host-side constants per image height):
        # device i owns output rows [a[i], a[i]+s) and reads window rows
        # [starts[i], starts[i]+wh), both clamped into the image exactly as
        # the reference aligns its last tile to the image edge.
        s = -(-h // n_dev)
        wh = s + 2 * overlap
        a = np.clip(np.arange(n_dev) * s, 0, h - s)
        starts = np.clip(a - overlap, 0, h - wh)
        offs = a - starts

        def slab_fn(p, xr):
            i = jax.lax.axis_index(axis)
            start = jnp.asarray(starts)[i]
            win = jax.lax.dynamic_slice_in_dim(xr, start, wh, axis=1)
            out = apply(p, win)
            off = jnp.asarray(offs)[i] * scale
            return jax.lax.dynamic_slice_in_dim(out, off, s * scale, axis=1)

        win_sharded = shard_map(
            slab_fn, mesh=mesh,
            in_specs=(P(), P(bspec)),
            out_specs=P(bspec, axis, None, None),
            check_rep=False,
        )

        def win_fn(params, xr):
            y = win_sharded(params, xr)  # (N, n_dev*s*scale, W', C')
            yb = y.reshape((y.shape[0], n_dev, s * scale) + y.shape[2:])
            out = jnp.zeros((y.shape[0], h * scale) + y.shape[2:], y.dtype)
            # a[] is nondecreasing with full coverage; overlapping rows are
            # written twice with identical values (exactness contract).
            for i in range(n_dev):
                out = jax.lax.dynamic_update_slice_in_dim(
                    out, yb[:, i], int(a[i]) * scale, axis=1)
            return out

        return jax.jit(win_fn)

    def fn(params, x):
        n, h, w, c = x.shape
        if batch_axis and n % n_batch:
            raise ValueError(
                f"batch {n} must divide by the {batch_axis!r} mesh axis "
                f"({n_batch}); pad the batch (harness/serving.py does)")
        if n_dev == 1 and n_batch == 1:
            return plain(params, x)
        if h % n_dev == 0 and overlap <= h // n_dev:
            xs = jax.device_put(x, NamedSharding(mesh, P(bspec, axis, None, None)))
            return jitted(params, xs)
        s = -(-h // n_dev)
        if s + 2 * overlap > h:
            raise SpatialShardUnavailable(
                f"H={h} too small to shard over {n_dev} devices with overlap "
                f"{overlap} (window {s + 2 * overlap} rows exceeds the image)")
        xr = jax.device_put(x, NamedSharding(mesh, P(bspec)))
        return _windowed(h)(params, xr)

    return fn


def spatial_shard_apply(
    apply: Callable,
    mesh: Mesh,
    params,
    x: jax.Array,
    overlap: int = 32,
    scale: int = 4,
    axis: str = "data",
) -> jax.Array:
    """One-shot convenience wrapper over :func:`make_spatial_apply`."""
    return make_spatial_apply(apply, mesh, overlap, scale, axis)(params, x)
