"""Separable image resizing as dense matmuls (MXU-friendly).

All interpolation modes used by the reference zoo are expressed as a pair of
precomputed row/column weight matrices applied with einsum — XLA maps these
straight onto the MXU, and exactness is controlled by how the matrices are
built on the host:

- ``interpolate(..., mode='bilinear'|'bicubic'|'nearest')`` reproduces
  ``torch.nn.functional.interpolate`` with ``align_corners=False`` (bicubic
  a = -0.75, border-replicated taps) — used by ESA blocks (bilinear
  upsample), global bicubic residuals (reference models 2, 11, 23) and
  nearest x2 upsamplers (model 33).
- ``imresize_matlab`` reproduces the MATLAB-style antialiased cubic resize
  of the reference's utils/utils_image.py:631-774 (a = -0.5, antialias on
  downscale, symmetric boundary).

Weight matrices are cached per (in_size, out_size, mode); under jit they
become compile-time constants.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ntire2022_esr_tpu import config

IntOr2 = Union[int, Tuple[int, int]]


def _cubic_torch(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    w = np.where(
        ax <= 1,
        (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0),
    )
    return w


def _cubic_matlab(x: np.ndarray) -> np.ndarray:
    return _cubic_torch(x, a=-0.5)


@functools.lru_cache(maxsize=512)
def _torch_resize_matrix(in_size: int, out_size: int, mode: str) -> np.ndarray:
    """(out_size, in_size) weight matrix matching torch interpolate."""
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if mode == "nearest":
        src = np.floor(dst * scale).astype(np.int64)
        src = np.clip(src, 0, in_size - 1)
        m[np.arange(out_size), src] = 1.0
        return m.astype(np.float32)
    src = (dst + 0.5) * scale - 0.5
    if mode == "bilinear":
        x0 = np.floor(src).astype(np.int64)
        lam = src - x0
        for tap, w in ((x0, 1.0 - lam), (x0 + 1, lam)):
            idx = np.clip(tap, 0, in_size - 1)
            np.add.at(m, (np.arange(out_size), idx), w)
        return m.astype(np.float32)
    if mode == "bicubic":
        x0 = np.floor(src).astype(np.int64)
        t = src - x0
        # torch cubic weights on the 4 taps around src (a = -0.75)
        for k in range(-1, 3):
            w = _cubic_torch(t - k)
            idx = np.clip(x0 + k, 0, in_size - 1)
            np.add.at(m, (np.arange(out_size), idx), w)
        return m.astype(np.float32)
    raise ValueError(f"unknown mode {mode!r}")


@functools.lru_cache(maxsize=512)
def _matlab_resize_matrix(in_size: int, out_size: int, scale: Optional[float] = None,
                          antialias: bool = True) -> np.ndarray:
    """MATLAB imresize weights (reference utils_image.calculate_weights_indices).

    ``scale`` is the *requested* scale factor — MATLAB maps coordinates with
    it, not with out_size/in_size (they differ when ceil() rounds the output
    size, e.g. 37 * 0.25 -> 10).
    """
    if scale is None:
        scale = out_size / in_size
    kernel_width = 4.0
    if scale < 1 and antialias:
        kernel_width = kernel_width / scale
    x = np.arange(1, out_size + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = int(np.ceil(kernel_width)) + 2
    indices = left[:, None] + np.arange(p)[None, :]  # 1-based
    dist = u[:, None] - indices
    if scale < 1 and antialias:
        weights = scale * _cubic_matlab(dist * scale)
    else:
        weights = _cubic_matlab(dist)
    weights = weights / np.sum(weights, axis=1, keepdims=True)
    # symmetric boundary: reflect out-of-range indices
    aux = np.concatenate([np.arange(in_size), np.arange(in_size - 1, -1, -1)])
    idx = aux[np.mod(indices.astype(np.int64) - 1, 2 * in_size)]
    m = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(m, (np.repeat(np.arange(out_size), p), idx.ravel()), weights.ravel())
    return m.astype(np.float32)


def _apply_separable(x: jax.Array, mh: np.ndarray, mw: np.ndarray) -> jax.Array:
    nm = config.numerics()
    wh = jnp.asarray(mh, x.dtype)
    ww = jnp.asarray(mw, x.dtype)
    y = jnp.einsum("oh,nhwc->nowc", wh, x, precision=nm.matmul_precision)
    y = jnp.einsum("pw,nowc->nopc", ww, y, precision=nm.matmul_precision)
    return y


def interpolate(
    x: jax.Array,
    size: Optional[IntOr2] = None,
    scale_factor: Optional[float] = None,
    mode: str = "bilinear",
) -> jax.Array:
    """torch.nn.functional.interpolate (align_corners=False) on NHWC input."""
    n, h, w, c = x.shape
    if size is None:
        size = (int(h * scale_factor), int(w * scale_factor))
    elif isinstance(size, int):
        size = (size, size)
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    if mode == "nearest" and oh % h == 0 and ow % w == 0:
        # integer nearest upsample == repeat (cheaper than matmul)
        x = jnp.repeat(x, oh // h, axis=1)
        return jnp.repeat(x, ow // w, axis=2)
    return _apply_separable(x, _torch_resize_matrix(h, oh, mode), _torch_resize_matrix(w, ow, mode))


def imresize_matlab(x: jax.Array, scale: float) -> jax.Array:
    """MATLAB-style antialiased bicubic resize on NHWC (or HWC) input."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    oh, ow = int(np.ceil(h * scale)), int(np.ceil(w * scale))
    y = _apply_separable(x, _matlab_resize_matrix(h, oh, scale), _matlab_resize_matrix(w, ow, scale))
    return y[0] if squeeze else y


def imresize_matlab_np(img: np.ndarray, scale: float) -> np.ndarray:
    """Host-side numpy MATLAB bicubic resize (HWC or HW, float in [0,1])."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w, c = img.shape
    oh, ow = int(np.ceil(h * scale)), int(np.ceil(w * scale))
    mh = _matlab_resize_matrix(h, oh, scale).astype(np.float64)
    mw = _matlab_resize_matrix(w, ow, scale).astype(np.float64)
    out = np.einsum("oh,hwc->owc", mh, img.astype(np.float64))
    out = np.einsum("pw,owc->opc", mw, out)
    out = out.astype(np.float32)
    return out[:, :, 0] if squeeze else out
