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


def make_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices).reshape(len(devices)), axis_names)


def data_mesh(n_devices: Optional[int] = None) -> Mesh:
    return make_mesh(n_devices, ("data",))
