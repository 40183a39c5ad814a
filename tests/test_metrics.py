"""PSNR/SSIM and image-conversion parity vs the reference formulas."""

import math

import numpy as np

from ntire2022_esr_tpu.ops import imresize_matlab_np
from ntire2022_esr_tpu.utils import image, metrics


def test_psnr_basic(rng):
    a = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    b = np.clip(a.astype(np.int32) + rng.randint(-10, 10, a.shape), 0, 255).astype(np.uint8)
    p = metrics.calculate_psnr(a, b, border=4)
    # independent computation
    aa = a[4:-4, 4:-4].astype(np.float64)
    bb = b[4:-4, 4:-4].astype(np.float64)
    mse = np.mean((aa - bb) ** 2)
    assert abs(p - 20 * math.log10(255.0 / math.sqrt(mse))) < 1e-9


def test_psnr_identical():
    a = np.zeros((16, 16, 3), np.uint8)
    assert metrics.calculate_psnr(a, a) == float("inf")


def test_ssim_self_is_one(rng):
    a = rng.randint(0, 256, (48, 48, 3)).astype(np.uint8)
    assert abs(metrics.calculate_ssim(a, a, border=4) - 1.0) < 1e-9


def test_ssim_range(rng):
    a = rng.randint(0, 256, (48, 48, 3)).astype(np.uint8)
    b = rng.randint(0, 256, (48, 48, 3)).astype(np.uint8)
    s = metrics.calculate_ssim(a, b)
    assert -1.0 <= s <= 1.0


def test_uint_roundtrip(rng):
    img = rng.randint(0, 256, (21, 23, 3)).astype(np.uint8)
    for dr in (1.0, 255.0):
        arr = image.uint2nhwc(img, dr)
        assert arr.shape == (1, 21, 23, 3)
        assert arr.max() <= dr + 1e-6
        back = image.nhwc2uint(arr, dr)
        np.testing.assert_array_equal(back, img)


def test_modcrop():
    img = np.zeros((13, 18, 3), np.uint8)
    out = image.modcrop(img, 4)
    assert out.shape == (12, 16, 3)


def test_matlab_imresize_downscale_props(rng):
    # antialiased downscale of a constant image stays constant
    img = np.full((32, 32, 3), 0.5, np.float32)
    out = imresize_matlab_np(img, 0.25)
    assert out.shape == (8, 8, 3)
    np.testing.assert_allclose(out, 0.5, rtol=1e-6)


def test_matlab_imresize_identity_scale1(rng):
    img = rng.rand(16, 16, 3).astype(np.float32)
    out = imresize_matlab_np(img, 1.0)
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_matlab_imresize_matches_reference_goldens():
    """Bit-level parity with the reference's utils_image imresize
    (utils_image.py:631-774), both numpy and torch variants."""
    import os
    path = os.path.join(os.path.dirname(__file__), "goldens", "resize_matlab.npz")
    if not os.path.exists(path):
        import pytest
        pytest.skip("resize goldens not generated")
    g = np.load(path)
    img = g["input"]
    for scale, key in ((0.25, "np_0_25"), (0.5, "np_0_5"), (2.0, "np_2_0"), (4.0, "np_4_0")):
        ref = g[key]
        out = imresize_matlab_np(img, scale)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-6)
    # torch-tensor variant agrees as well
    np.testing.assert_allclose(imresize_matlab_np(img, 4.0), g["t_4_0"], atol=2e-6)


def test_augment_roundtrip(rng):
    from ntire2022_esr_tpu.utils.image import augment_img, inverse_augment_img

    img = rng.rand(8, 10, 3).astype(np.float32)
    for mode in range(8):
        out = augment_img(img, mode)
        back = inverse_augment_img(out, mode)
        np.testing.assert_array_equal(back, img)
