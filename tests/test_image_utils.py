"""Residual utils_image API surface (reference utils/utils_image.py):
converters, tensor2img grid semantics, path helpers, channel_convert,
augment variants, logger_print tee."""

import os

import numpy as np
import pytest

from ntire2022_esr_tpu.utils import image as img_util
from ntire2022_esr_tpu.utils import logger as log_util


def test_single_uint_converters(rng):
    u = rng.randint(0, 256, (5, 7, 3)).astype(np.uint8)
    s = img_util.uint2single(u)
    assert s.dtype == np.float32 and s.max() <= 1.0
    np.testing.assert_array_equal(img_util.single2uint(s), u)
    s1 = img_util.uint2single1(u[None])
    assert s1.shape == (5, 7, 3)  # squeezed
    u16 = rng.randint(0, 65536, (4, 4)).astype(np.uint16)
    s16 = img_util.uint162single(u16)
    assert s16.dtype == np.float32 and s16.max() <= 1.0
    # single2uint16 replicates the reference's uint8-output quirk
    # (utils_image.py:178-180) because it changes outputs
    q = img_util.single2uint16(np.asarray([[0.5]], np.float32))
    assert q.dtype == np.uint8 and q[0, 0] == np.uint8(round(0.5 * 65535.0) % 256)


def test_single_nhwc_roundtrip(rng):
    hwc = rng.rand(6, 5, 3).astype(np.float32)
    nhwc = img_util.single2nhwc(hwc)
    assert nhwc.shape == (1, 6, 5, 3)
    back = img_util.nhwc2single(nhwc)
    np.testing.assert_allclose(back, hwc.clip(0, 1))
    gray = rng.rand(6, 5).astype(np.float32)
    assert img_util.single2nhwc(gray).shape == (1, 6, 5, 1)
    assert img_util.nhwc2single3(gray[None, ..., None]).shape == (6, 5, 1)


def test_tensor2img_3d_bgr_round(rng):
    """3-D case: clamp -> [0,1] -> RGB->BGR -> x255 round (reference
    tensor2img, utils_image.py:245-269)."""
    arr = rng.rand(1, 4, 4, 3).astype(np.float32) * 1.4 - 0.2
    out = img_util.tensor2img(arr)
    expect = (np.clip(np.squeeze(arr), 0, 1)[:, :, ::-1] * 255.0).round().astype(np.uint8)
    np.testing.assert_array_equal(out, expect)
    assert out.dtype == np.uint8


def test_tensor2img_4d_grid(rng):
    """4-D batches tile into a sqrt grid with 2px zero padding
    (torchvision make_grid defaults, as the reference calls it)."""
    arr = rng.rand(4, 3, 3, 3).astype(np.float32)
    out = img_util.tensor2img(arr)
    # nrow = int(sqrt(4)) = 2 -> 2x2 grid; each cell 3px + 2px padding
    assert out.shape == (2 + 2 * 5, 2 + 2 * 5, 3)
    # first cell content matches image 0 (BGR flipped)
    cell = out[2:5, 2:5]
    expect = (arr[0][:, :, ::-1] * 255.0).round().astype(np.uint8)
    np.testing.assert_array_equal(cell, expect)


def test_tensor2img_float_output(rng):
    arr = rng.rand(4, 4).astype(np.float32)
    out = img_util.tensor2img(arr, out_type=np.float32)
    np.testing.assert_allclose(out, arr, rtol=1e-6)


def test_get_image_paths(tmp_path, rng):
    sub = tmp_path / "a"
    sub.mkdir()
    for name in ("x.png", "y.bmp", "notes.txt"):
        (sub / name).write_bytes(b"0")
    paths = img_util.get_image_paths(str(tmp_path))
    assert [os.path.basename(p) for p in paths] == ["x.png", "y.bmp"]
    assert img_util.get_image_paths(None) is None
    with pytest.raises(AssertionError):
        img_util.get_image_paths(str(tmp_path / "missing"))


def test_mkdirs_and_rename(tmp_path):
    a, b = str(tmp_path / "p"), str(tmp_path / "q")
    img_util.mkdirs([a, b])
    assert os.path.isdir(a) and os.path.isdir(b)
    (tmp_path / "p" / "f").write_text("keep")
    img_util.mkdir_and_rename(a)
    assert os.path.isdir(a) and not os.path.exists(os.path.join(a, "f"))
    archived = [d for d in os.listdir(tmp_path) if d.startswith("p_archived_")]
    assert len(archived) == 1


def test_channel_convert(rng):
    imgs = [rng.rand(4, 4, 3).astype(np.float32)]
    gray = img_util.channel_convert(3, "gray", imgs)
    assert gray[0].shape == (4, 4, 1)
    y = img_util.channel_convert(3, "y", imgs)
    assert y[0].shape == (4, 4, 1)
    same = img_util.channel_convert(3, "RGB", imgs)
    assert same is imgs


def test_augment_img_np3_modes(rng):
    img = rng.rand(3, 5, 2).astype(np.float32)
    outs = [img_util.augment_img_np3(img, m) for m in range(8)]
    np.testing.assert_array_equal(outs[0], img)
    np.testing.assert_array_equal(outs[1], img.transpose(1, 0, 2))
    np.testing.assert_array_equal(outs[6], img[:, ::-1][::-1])
    shapes = {o.shape for o in outs}
    assert shapes == {(3, 5, 2), (5, 3, 2)}
    with pytest.raises(ValueError):
        img_util.augment_img_np3(img, 8)


def test_augment_img_nhwc(rng):
    arr = rng.rand(2, 3, 5, 3).astype(np.float32)
    out = img_util.augment_img_nhwc(arr, mode=2)
    np.testing.assert_array_equal(out[0], img_util.augment_img(arr[0], 2))
    hwc = rng.rand(3, 5, 3).astype(np.float32)
    np.testing.assert_array_equal(
        img_util.augment_img_nhwc(hwc, 5), img_util.augment_img(hwc, 5))


def test_logger_print_tee(tmp_path, capsys):
    import sys

    log_path = str(tmp_path / "tee.log")
    tee = log_util.logger_print(log_path)
    old = sys.stdout
    sys.stdout = tee
    try:
        print("hello tee")
    finally:
        sys.stdout = old
        tee.close()
    assert "hello tee" in open(log_path).read()
