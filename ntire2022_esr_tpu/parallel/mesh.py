"""Device mesh construction for sharded evaluation.

The reference is strictly single-GPU (SURVEY §2.3: CUDA_VISIBLE_DEVICES=0,
batch 1). The TPU-native scaling story is data parallelism over the image
batch (and the tile grid) across a 1-D ICI mesh: images are independent, so
the forward needs no collectives; per-image metrics ride a single psum /
all_gather at the end. This module provides the mesh; shardings live in
parallel/eval.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape: "Optional[int | Sequence[int]]" = None,
              axis_names: Optional[Sequence[str]] = None) -> Mesh:
    """Mesh over the first devices: 1-D (``shape`` an int or None = all
    devices, axis "data") or N-D (``shape`` a tuple, e.g. ``(4, 2)`` with
    axes ``("data", "space")`` — batch-parallel groups of H-slab shards,
    both riding ICI)."""
    devices = jax.devices()
    if shape is None or isinstance(shape, int):
        n = len(devices) if shape is None else int(shape)
        if n > len(devices):
            raise ValueError(f"requested {n} devices, have {len(devices)}")
        return Mesh(np.asarray(devices[:n]).reshape(n),
                    tuple(axis_names or ("data",)))
    shape = tuple(int(s) for s in shape)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"requested {shape} = {n} devices, have {len(devices)}")
    if axis_names is None:
        axis_names = ("data", "space")[: len(shape)]
    if len(axis_names) != len(shape):
        raise ValueError(f"{len(shape)}-D mesh needs {len(shape)} axis names, "
                         f"got {tuple(axis_names)}")
    return Mesh(np.asarray(devices[:n]).reshape(shape), tuple(axis_names))


def data_mesh(n_devices: Optional[int] = None) -> Mesh:
    return make_mesh(n_devices, ("data",))


def data_space_mesh(data: int, space: int) -> Mesh:
    """2-D (data, space) mesh: ``data`` batch-parallel groups x ``space``
    H-slab shards (parallel/spatial.py composes over both axes)."""
    return make_mesh((data, space), ("data", "space"))
