"""x8 self-ensemble inference (geometric test-time augmentation).

Runs the model on all 8 dihedral transforms of the input and averages the
inverse-transformed outputs — the standard SR trick for ~0.1 dB extra PSNR.
Everything happens on device inside one jit: flips/rot90s are free layout
ops on TPU, and the 8 variants can optionally be folded into the batch.
(The reference ships the augmentation utilities, utils_image.py:280-359,
but its harness never exposes ensembling; this is a framework addition.)
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def _fwd(x, mode: int):
    # matches utils.image.augment_img on NHWC batches (H=axis 1, W=axis 2)
    if mode == 0:
        return x
    if mode == 1:
        return jnp.flip(jnp.rot90(x, 1, (1, 2)), 1)
    if mode == 2:
        return jnp.flip(x, 1)
    if mode == 3:
        return jnp.rot90(x, 3, (1, 2))
    if mode == 4:
        return jnp.flip(jnp.rot90(x, 2, (1, 2)), 1)
    if mode == 5:
        return jnp.rot90(x, 1, (1, 2))
    if mode == 6:
        return jnp.rot90(x, 2, (1, 2))
    return jnp.flip(jnp.rot90(x, 3, (1, 2)), 1)


_INVERSE = {0: 0, 1: 1, 2: 2, 3: 5, 4: 4, 5: 3, 6: 6, 7: 7}


def self_ensemble_x8(apply: Callable) -> Callable:
    """Wrap ``apply(params, x)`` into its x8 dihedral self-ensemble."""

    def ensembled(params, x):
        acc = None
        for mode in range(8):
            y = apply(params, _fwd(x, mode))
            y = _fwd(y, _INVERSE[mode])
            acc = y if acc is None else acc + y
        return acc / 8.0

    return ensembled
