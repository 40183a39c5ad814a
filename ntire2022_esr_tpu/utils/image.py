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


IMG_EXTENSIONS = [".jpg", ".JPG", ".jpeg", ".JPEG", ".png", ".PNG", ".ppm",
                  ".PPM", ".bmp", ".BMP", ".tif"]


def imshow(x, title=None, cbar=False, figsize=None) -> None:
    """Reference imshow (utils_image.py:30-38). matplotlib is imported
    lazily — headless/serving environments never pay for it."""
    import matplotlib.pyplot as plt

    plt.figure(figsize=figsize)
    plt.imshow(np.squeeze(x), interpolation="nearest", cmap="gray")
    if title:
        plt.title(title)
    if cbar:
        plt.colorbar()
    plt.show()


def is_image_file(filename: str) -> bool:
    """Reference is_image_file (utils_image.py:22-23)."""
    return any(filename.endswith(ext) for ext in IMG_EXTENSIONS)


def get_timestamp() -> str:
    """Reference get_timestamp (utils_image.py:26-27)."""
    import datetime

    return datetime.datetime.now().strftime("%y%m%d-%H%M%S")


def get_image_paths(dataroot):
    """Sorted recursive image listing (utils_image.py:47-63)."""
    if dataroot is None:
        return None
    paths = []
    assert os.path.isdir(dataroot), f"{dataroot} is not a valid directory"
    for dirpath, _, fnames in sorted(os.walk(dataroot)):
        for fname in sorted(fnames):
            if is_image_file(fname):
                paths.append(os.path.join(dirpath, fname))
    assert paths, f"{dataroot} has no valid image file"
    return paths


def mkdir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def mkdirs(paths) -> None:
    """Reference mkdirs (utils_image.py:78-83)."""
    if isinstance(paths, str):
        mkdir(paths)
    else:
        for path in paths:
            mkdir(path)


def mkdir_and_rename(path: str) -> None:
    """Archive an existing dir under a timestamped name, then create fresh
    (utils_image.py:86-91)."""
    if os.path.exists(path):
        new_name = path + "_archived_" + get_timestamp()
        print(f"Path already exists. Rename it to [{new_name}]")
        os.rename(path, new_name)
    os.makedirs(path)


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


def uint2single1(img: np.ndarray) -> np.ndarray:
    """Reference uint2single1 (utils_image.py:163-165): squeeze + scale."""
    return np.float32(np.squeeze(img) / 255.0)


def single2uint(img: np.ndarray) -> np.ndarray:
    return np.uint8((img.clip(0, 1) * 255.0).round())


def uint162single(img: np.ndarray) -> np.ndarray:
    """Reference uint162single (utils_image.py:173-175)."""
    return np.float32(img / 65535.0)


def single2uint16(img: np.ndarray) -> np.ndarray:
    """Reference single2uint16 (utils_image.py:178-180) — including its
    uint8 output-dtype quirk (np.uint8 of a 0..65535 scale), replicated
    because it changes outputs."""
    return np.uint8((img.clip(0, 1) * 65535.0).round())


def single2nhwc(img: np.ndarray) -> np.ndarray:
    """float HWC -> float32 NHWC (reference single2tensor4,
    utils_image.py:218-219, minus the NCHW permute — this framework is
    NHWC end to end)."""
    if img.ndim == 2:
        img = np.expand_dims(img, axis=2)
    return np.ascontiguousarray(img, dtype=np.float32)[None]


def nhwc2single(arr: np.ndarray) -> np.ndarray:
    """float NHWC/HWC array -> squeezed float32 HWC in [0, 1] (reference
    tensor2single, utils_image.py:228-232)."""
    return np.clip(np.squeeze(np.asarray(arr, dtype=np.float32)), 0.0, 1.0)


def nhwc2single3(arr: np.ndarray) -> np.ndarray:
    """Like :func:`nhwc2single` but always 3-D HWC (reference
    tensor2single3, utils_image.py:235-241)."""
    img = nhwc2single(arr)
    if img.ndim == 2:
        img = np.expand_dims(img, axis=2)
    return img


def _image_grid(batch: np.ndarray, nrow: int, padding: int = 2) -> np.ndarray:
    """Tile an NHWC batch into one HWC image (torchvision make_grid
    semantics: ``nrow`` images per row, ``padding`` zero pixels between
    cells and around the border)."""
    n, h, w, c = batch.shape
    ncol = -(-n // nrow)
    grid = np.zeros((padding + ncol * (h + padding),
                     padding + nrow * (w + padding), c), batch.dtype)
    for k in range(n):
        r, col = divmod(k, nrow)
        y0 = padding + r * (h + padding)
        x0 = padding + col * (w + padding)
        grid[y0:y0 + h, x0:x0 + w] = batch[k]
    return grid


def tensor2img(arr: np.ndarray, out_type=np.uint8, min_max=(0, 1)) -> np.ndarray:
    """Model output (NHWC/HWC/HW float array, RGB) -> BGR uint8 image
    (reference tensor2img, utils_image.py:245-269: clamp to ``min_max``,
    rescale to [0,1], RGB->BGR, x255 round for uint8; 4-D batches are
    tiled into a sqrt grid via make_grid)."""
    import math

    arr = np.squeeze(np.asarray(arr, dtype=np.float32))
    arr = np.clip(arr, *min_max)
    arr = (arr - min_max[0]) / (min_max[1] - min_max[0])
    if arr.ndim == 4:
        arr = _image_grid(arr, nrow=int(math.sqrt(len(arr))))
        arr = arr[:, :, ::-1]
    elif arr.ndim == 3:
        arr = arr[:, :, ::-1]
    elif arr.ndim != 2:
        raise TypeError(
            f"Only support 4D, 3D and 2D arrays. But received with dimension: {arr.ndim}")
    if out_type == np.uint8:
        arr = (arr * 255.0).round()
    return arr.astype(out_type)


def channel_convert(in_c: int, tar_type: str, img_list):
    """Reference channel_convert (utils_image.py:466-484)."""
    if in_c == 3 and tar_type == "gray":
        gray_list = [cv2.cvtColor(img, cv2.COLOR_BGR2GRAY) for img in img_list]
        return [np.expand_dims(img, axis=2) for img in gray_list]
    if in_c == 3 and tar_type == "y":
        y_list = [bgr2ycbcr(img, only_y=True) for img in img_list]
        return [np.expand_dims(img, axis=2) for img in y_list]
    if in_c == 1 and tar_type == "RGB":
        return [cv2.cvtColor(img, cv2.COLOR_GRAY2BGR) for img in img_list]
    return img_list


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


def augment_img_np3(img: np.ndarray, mode: int = 0) -> np.ndarray:
    """The reference's second dihedral convention on HWC arrays
    (utils_image.py:299-324: flips and HW transposes, no rot90)."""
    if mode == 0:
        return img
    if mode == 1:
        return img.transpose(1, 0, 2)
    if mode == 2:
        return img[::-1, :, :]
    if mode == 3:
        return img[::-1, :, :].transpose(1, 0, 2)
    if mode == 4:
        return img[:, ::-1, :]
    if mode == 5:
        return img[:, ::-1, :].transpose(1, 0, 2)
    if mode == 6:
        return img[:, ::-1, :][::-1, :, :]
    if mode == 7:
        return img[:, ::-1, :][::-1, :, :].transpose(1, 0, 2)
    raise ValueError(f"mode must be in 0..7, got {mode}")


def augment_img_nhwc(arr, mode: int = 0):
    """Dihedral transform of a device/NHWC array (reference
    augment_img_tensor, utils_image.py:327-341, minus the NCHW permutes:
    NHWC already has H, W adjacent, so :func:`augment_img` applies to the
    middle axes directly). Works on numpy and jax arrays."""
    import numpy as _np

    a = _np.asarray(arr)
    if a.ndim == 4:
        out = _np.stack([augment_img(im, mode=mode) for im in a])
    else:
        out = augment_img(a, mode=mode)
    return _np.ascontiguousarray(out)


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
