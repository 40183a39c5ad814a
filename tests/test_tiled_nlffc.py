"""Tiled-forward path: NLFFC (the only tiled zoo model) + CLI smoke (CPU)."""

import logging
import os
import subprocess
import sys
import types

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "model_02.npz")


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no NLFFC golden")
def test_nlffc_tiled_matches_whole_image_on_small_input():
    """With tile >= image size the tiled runner must equal the direct call."""
    import jax

    from ntire2022_esr_tpu.harness import registry, tiling

    apply, params, name, dr, tile = registry.build_model(2)
    assert tile == 256
    g = np.load(GOLDEN)
    x = (g["input_u8"].astype(np.float32) / (255.0 / dr))[None]
    direct = np.asarray(jax.jit(apply)(params, x))
    tiled = np.asarray(tiling.forward(apply, params, x, tile=tile))
    np.testing.assert_allclose(tiled, direct, rtol=1e-5, atol=1e-4)


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no NLFFC golden")
def test_nlffc_tiled_blending_on_large_input(rng):
    """Input larger than the tile: sweep + accumulate/divide blending."""
    from ntire2022_esr_tpu.harness import registry, tiling

    apply, params, name, dr, tile = registry.build_model(2)
    x = rng.rand(1, 80, 100, 3).astype(np.float32) * dr
    out = np.asarray(tiling.tiled_apply(apply, params, x, tile=64, tile_overlap=32))
    assert out.shape == (1, 320, 400, 3)
    assert np.isfinite(out).all()


def test_cli_end_to_end(tmp_path):
    """Full CLI run over a synthetic 3-image DIV2K-layout dataset (CPU)."""
    from ntire2022_esr_tpu.utils import image

    rng = np.random.RandomState(7)
    d = tmp_path / "data"
    (d / "DIV2K_valid_LR").mkdir(parents=True)
    (d / "DIV2K_valid_HR").mkdir(parents=True)
    for i in range(801, 804):
        hr = rng.randint(0, 256, (64, 96, 3)).astype(np.uint8)
        image.imsave(hr, str(d / "DIV2K_valid_HR" / f"{i:04}.png"))
        image.imsave(hr[::4, ::4], str(d / "DIV2K_valid_LR" / f"{i:04}x4.png"))

    # restrict the val split to the 3 synthetic images
    import ntire2022_esr_tpu.harness.data as data_mod
    from ntire2022_esr_tpu.harness import cli

    orig = data_mod.select_dataset

    def small(data_dir, mode):
        return orig(data_dir, mode)[:3]

    data_mod.select_dataset = small
    try:
        cwd = os.getcwd()
        os.chdir(tmp_path)
        cli.main([
            "--data_dir", str(d), "--save_dir", str(tmp_path / "out"),
            "--model_id", "4", "--ssim",
        ])
        assert os.path.exists(tmp_path / "results.json")
        assert os.path.exists(tmp_path / "results.txt")
        import json

        res = json.load(open(tmp_path / "results.json"))
        assert "04_RLFN" in res
        entry = res["04_RLFN"]
        assert len(entry["valid_psnr"]) == 3
        assert entry["num_conv"] == 39  # published table value
        assert abs(entry["num_parameters"] - 0.317) < 0.001
        table = open(tmp_path / "results.txt").read()
        assert "04_RLFN" in table
    finally:
        os.chdir(cwd)
        data_mod.select_dataset = orig


def test_cli_sweep_isolates_failures(tmp_path):
    """A failing model id must not kill the sweep (reference crashes there)."""
    import json

    from ntire2022_esr_tpu.utils import image
    import ntire2022_esr_tpu.harness.data as data_mod
    from ntire2022_esr_tpu.harness import cli

    rng = np.random.RandomState(3)
    d = tmp_path / "data"
    (d / "DIV2K_valid_LR").mkdir(parents=True)
    (d / "DIV2K_valid_HR").mkdir(parents=True)
    for i in range(801, 803):
        hr = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
        image.imsave(hr, str(d / "DIV2K_valid_HR" / f"{i:04}.png"))
        image.imsave(hr[::4, ::4], str(d / "DIV2K_valid_LR" / f"{i:04}x4.png"))

    orig = data_mod.select_dataset
    data_mod.select_dataset = lambda dd, m: orig(dd, m)[:2]
    try:
        cwd = os.getcwd()
        os.chdir(tmp_path)
        # id 7 is withheld (raises) — sweep must continue to id 24
        cli.main(["--data_dir", str(d), "--save_dir", str(tmp_path / "o"),
                  "--model_id", "7", "24"])
        res = json.load(open(tmp_path / "results.json"))
        assert "24_MDGN" in res
    finally:
        os.chdir(cwd)
        data_mod.select_dataset = orig


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no NLFFC golden")
@pytest.mark.parametrize("chunk", [1, 2, 4])
def test_chunked_tiler_matches_tiled_apply(rng, chunk):
    """The dispatch-chunked serving tiler must reproduce tiled_apply's
    equal-weight E/W blend exactly (incl. masked ragged final chunks)."""
    from ntire2022_esr_tpu.harness import registry, tiling

    apply, params, name, dr, tile = registry.build_model(2)
    x = rng.rand(1, 80, 100, 3).astype(np.float32) * dr  # 2x3 = 6 tiles @64
    ref = np.asarray(tiling.tiled_apply(apply, params, x, tile=64,
                                        tile_overlap=32,
                                        max_tiles_per_call=chunk))
    tiler = tiling.ChunkedTiler(apply, tile=64, tile_overlap=32, chunk=chunk)
    out = np.asarray(tiler(params, x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-5 * dr)


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no NLFFC golden")
def test_chunked_tiler_small_frame_fallback(rng):
    """Frames smaller than the tile take the whole-image path."""
    from ntire2022_esr_tpu.harness import registry, tiling

    apply, params, name, dr, tile = registry.build_model(2)
    x = rng.rand(1, 40, 48, 3).astype(np.float32) * dr
    tiler = tiling.ChunkedTiler(apply, tile=64, tile_overlap=32, chunk=2)
    out = np.asarray(tiler(params, x))
    ref = np.asarray(tiling.tiled_apply(apply, params, x, tile=64,
                                        tile_overlap=32))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-5 * dr)


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no NLFFC golden")
def test_chunked_tiler_shape_independent_model_executable(rng):
    """The expensive model executable must be traced ONCE across frame
    shapes (the serving win: per-shape recompiles touch only the tiny
    gather/blend helpers)."""
    from ntire2022_esr_tpu.harness import registry, tiling

    apply, params, name, dr, tile = registry.build_model(2)
    calls = []

    def counting_apply(p, b):
        calls.append(b.shape)
        return apply(p, b)

    tiler = tiling.ChunkedTiler(counting_apply, tile=64, tile_overlap=32,
                                chunk=2)
    tiler(params, rng.rand(1, 80, 100, 3).astype(np.float32) * dr)
    n_traces_first = len(calls)
    tiler(params, rng.rand(1, 100, 80, 3).astype(np.float32) * dr)
    # jit tracing happens once per input signature: the second (different)
    # frame shape must NOT re-trace the model body
    assert len(calls) == n_traces_first
    assert all(s == (2, 64, 64, 3) for s in calls)
