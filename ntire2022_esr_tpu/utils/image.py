"""Host-side image I/O and uint <-> float conversions (NHWC).

Behavioural mirror of the reference's utils/utils_image.py conversion
pipeline (imread_uint :122, uint2tensor4 :190, tensor2uint :204, modcrop
:442), re-targeted at NHWC numpy arrays feeding JAX instead of NCHW torch
tensors.
"""

from __future__ import annotations

import os
import cv2
import numpy as np


def mkdir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def imread_uint(path: str, n_channels: int = 3) -> np.ndarray:
    """Read an image as HxWx3 RGB uint8 (or HxWx1 grayscale)."""
    if n_channels == 1:
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        return np.expand_dims(img, axis=2)
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 2:
        return cv2.cvtColor(img, cv2.COLOR_GRAY2RGB)
    return cv2.cvtColor(img[:, :, :3], cv2.COLOR_BGR2RGB)


def imsave(img: np.ndarray, path: str) -> None:
    """Save an RGB (or grayscale) uint8 image."""
    img = np.squeeze(img)
    if img.ndim == 3:
        img = img[:, :, [2, 1, 0]]
    cv2.imwrite(path, img)


def uint2nhwc(img: np.ndarray, data_range: float = 1.0) -> np.ndarray:
    """uint8 HWC -> float32 NHWC scaled to [0, data_range].

    Mirrors uint2tensor4 (utils_image.py:190-193): value = u8 / (255/DR).
    """
    if img.ndim == 2:
        img = np.expand_dims(img, axis=2)
    return (img.astype(np.float32) / (255.0 / data_range))[None]


def nhwc2uint(arr: np.ndarray, data_range: float = 1.0) -> np.ndarray:
    """float NHWC (or HWC) model output -> uint8 HWC.

    Mirrors tensor2uint (utils_image.py:204-208): clamp to [0, DR],
    rescale to [0,255], numpy .round() (banker's rounding, exactly as the
    reference — it rounds the *numpy* array, not the torch tensor).
    """
    arr = np.squeeze(np.asarray(arr, dtype=np.float32))
    arr = np.clip(arr, 0, data_range) * (255.0 / data_range)
    return np.round(arr).astype(np.uint8)


def modcrop(img: np.ndarray, scale: int) -> np.ndarray:
    """Crop H, W down to multiples of ``scale`` (utils_image.py:442-455)."""
    h, w = img.shape[:2]
    return img[: h - h % scale, : w - w % scale, ...]


def shave(img: np.ndarray, border: int = 0) -> np.ndarray:
    h, w = img.shape[:2]
    return img[border : h - border, border : w - border]


def read_img(path: str) -> np.ndarray:
    """HWC BGR float32 in [0,1] (reference read_img, utils_image.py:105-117)."""
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    img = img.astype(np.float32) / 255.0
    if img.ndim == 2:
        img = np.expand_dims(img, axis=2)
    if img.shape[2] > 3:
        img = img[:, :, :3]
    return img


def uint2single(img: np.ndarray) -> np.ndarray:
    return np.float32(img / 255.0)


def single2uint(img: np.ndarray) -> np.ndarray:
    return np.uint8((img.clip(0, 1) * 255.0).round())


# ---------------------------------------------------------------------------
# Colour-space conversions (utils_image.py:374-439, ITU-R BT.601 matrices)
# ---------------------------------------------------------------------------

_YCBCR_M = np.array(
    [[65.481, -37.797, 112.0], [128.553, -74.203, -93.786], [24.966, 112.0, -18.214]]
)


def rgb2ycbcr(img: np.ndarray, only_y: bool = True) -> np.ndarray:
    in_type = img.dtype
    img = img.astype(np.float64)
    if in_type != np.uint8:
        img *= 255.0
    if only_y:
        out = np.dot(img, [65.481, 128.553, 24.966]) / 255.0 + 16.0
    else:
        out = img @ (_YCBCR_M / 255.0) + [16, 128, 128]
    if in_type == np.uint8:
        return out.round().astype(np.uint8)
    return (out / 255.0).astype(np.float32)


def bgr2ycbcr(img: np.ndarray, only_y: bool = True) -> np.ndarray:
    return rgb2ycbcr(img[..., ::-1] if img.ndim == 3 else img, only_y)


def ycbcr2rgb(img: np.ndarray) -> np.ndarray:
    in_type = img.dtype
    img = img.astype(np.float64)
    if in_type != np.uint8:
        img *= 255.0
    m = np.array(
        [[0.00456621, 0.00456621, 0.00456621],
         [0.0, -0.00153632, 0.00791071],
         [0.00625893, -0.00318811, 0.0]]
    ) * 255.0
    out = img @ m + [-222.921, 135.576, -276.836]
    if in_type == np.uint8:
        return out.round().clip(0, 255).astype(np.uint8)
    return (out / 255.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Dihedral augmentations (utils_image.py:280-359) — the 8 flip/rot modes used
# for self-ensemble / training-time augmentation.
# ---------------------------------------------------------------------------

def augment_img(img: np.ndarray, mode: int = 0) -> np.ndarray:
    """Apply one of the 8 dihedral transforms (numpy HWC or HW)."""
    if mode == 0:
        return img
    if mode == 1:
        return np.flipud(np.rot90(img))
    if mode == 2:
        return np.flipud(img)
    if mode == 3:
        return np.rot90(img, k=3)
    if mode == 4:
        return np.flipud(np.rot90(img, k=2))
    if mode == 5:
        return np.rot90(img)
    if mode == 6:
        return np.rot90(img, k=2)
    if mode == 7:
        return np.flipud(np.rot90(img, k=3))
    raise ValueError(f"mode must be in 0..7, got {mode}")


def inverse_augment_img(img: np.ndarray, mode: int = 0) -> np.ndarray:
    """Undo :func:`augment_img` (for x8 self-ensemble inference)."""
    inverse = {0: 0, 1: 1, 2: 2, 3: 5, 4: 4, 5: 3, 6: 6, 7: 7}
    return augment_img(img, inverse[mode])


def augment_imgs(img_list, hflip: bool = True, rot: bool = True, rng=None):
    """Random joint flip/rotate of an image list (training augmentation)."""
    import random as _random

    r = rng if rng is not None else _random
    do_h = hflip and r.random() < 0.5
    do_v = rot and r.random() < 0.5
    do_r = rot and r.random() < 0.5

    def _aug(img):
        if do_h:
            img = img[:, ::-1, :]
        if do_v:
            img = img[::-1, :, :]
        if do_r:
            img = img.transpose(1, 0, 2)
        return img

    return [_aug(img) for img in img_list]
