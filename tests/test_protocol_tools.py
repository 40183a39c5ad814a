"""Regression tests for the full-protocol parity toolchain.

tools/run_tpu_protocol.py produced the committed parity artifact
(results/protocol/); these tests keep that pipeline green on CPU with a
tiny DIV2K-layout dataset, and pin tools/compare_protocol.py's pass/fail
logic on synthetic artifacts.
"""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from ntire2022_esr_tpu.utils import image as img_util


def _make_div2k(tmp_path, n=2, lr_hw=(24, 33)):
    # NB: LR must clear the ESA receptive floor (stride-2 conv + maxpool
    # k7s3) — below ~16 px a dim collapses to zero, as it does in torch.
    lr_dir = tmp_path / "DIV2K_valid_LR"
    hr_dir = tmp_path / "DIV2K_valid_HR"
    lr_dir.mkdir(parents=True)
    hr_dir.mkdir(parents=True)
    rng = np.random.RandomState(7)
    h, w = lr_hw
    for i in range(801, 801 + n):
        lr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        # HR deliberately not an exact x4 multiple: exercises modcrop
        hr = rng.randint(0, 256, (4 * h + 1, 4 * w + 2, 3), dtype=np.uint8)
        img_util.imsave(lr, str(lr_dir / f"{i:04}x4.png"))
        img_util.imsave(hr, str(hr_dir / f"{i:04}.png"))
    return str(tmp_path)


def test_run_tpu_protocol_artifact(tmp_path):
    import run_tpu_protocol

    data_dir = _make_div2k(tmp_path / "data", n=2)
    out = str(tmp_path / "tpu.json")
    run_tpu_protocol.main([
        "--data_dir", data_dir, "--out", out,
        "--save_dir", str(tmp_path / "sr"), "4",
    ])
    with open(out) as f:
        art = json.load(f)
    assert "04_RLFN" in art
    row = art["04_RLFN"]
    assert row["model_id"] == 4
    assert len(row["valid_psnr"]) == 2
    assert row["valid_ave_psnr"] == pytest.approx(
        sum(row["valid_psnr"]) / 2)
    assert row["images"] == ["0801.png", "0802.png"]
    # SR PNGs saved at modcropped-HR shape
    sr = img_util.imread_uint(str(tmp_path / "sr/04_RLFN/valid/0801.png"))
    assert sr.shape == (4 * 24, 4 * 33, 3)
    # re-run resumes from the artifact without recomputing
    run_tpu_protocol.main([
        "--data_dir", data_dir, "--out", out,
        "--save_dir", str(tmp_path / "sr"), "4",
    ])


def test_compare_protocol_pass_fail(tmp_path, capsys):
    import compare_protocol

    def art(psnrs):
        return {"m": {"model_id": 4, "images": ["0801.png", "0802.png"],
                      "valid_psnr": psnrs,
                      "valid_ave_psnr": sum(psnrs) / len(psnrs),
                      "valid_ave_runtime_ms": 1.0}}

    ref, tpu = tmp_path / "ref.json", tmp_path / "tpu.json"
    ref.write_text(json.dumps(art([30.0, 31.0])))

    tpu.write_text(json.dumps(art([30.0041, 30.9961])))  # within +-0.01 ave
    compare_protocol.main(["--ref", str(ref), "--tpu", str(tpu)])
    ok = capsys.readouterr().out
    assert "FAIL" not in ok and "1/1 models within" in ok

    tpu.write_text(json.dumps(art([30.05, 31.05])))  # out of tolerance
    compare_protocol.main(["--ref", str(ref), "--tpu", str(tpu)])
    bad = capsys.readouterr().out
    assert "FAIL" in bad


def test_run_tpu_protocol_ssim(tmp_path):
    # --ssim scores the protocol's second metric (reference
    # test_demo.py:450-453) per image and in aggregate
    import run_tpu_protocol

    data_dir = _make_div2k(tmp_path / "data", n=2)
    out = str(tmp_path / "tpu.json")
    run_tpu_protocol.main([
        "--data_dir", data_dir, "--out", out,
        "--save_dir", str(tmp_path / "sr"), "--ssim", "4",
    ])
    row = json.load(open(out))["04_RLFN"]
    assert len(row["valid_ssim"]) == 2
    assert all(-1.0 <= s <= 1.0 for s in row["valid_ssim"])
    assert row["valid_ave_ssim"] == pytest.approx(
        sum(row["valid_ssim"]) / 2)


def test_compare_protocol_ssim_columns(tmp_path, capsys):
    import compare_protocol

    def art(psnrs, ssims=None):
        row = {"model_id": 4, "images": ["0801.png", "0802.png"],
               "valid_psnr": psnrs,
               "valid_ave_psnr": sum(psnrs) / len(psnrs),
               "valid_ave_runtime_ms": 1.0}
        if ssims is not None:
            row["valid_ssim"] = ssims
            row["valid_ave_ssim"] = sum(ssims) / len(ssims)
        return {"m": row}

    ref, tpu = tmp_path / "ref.json", tmp_path / "tpu.json"
    ref.write_text(json.dumps(art([30.0, 31.0], [0.90, 0.91])))
    tpu.write_text(json.dumps(art([30.0, 31.0], [0.90, 0.9105])))
    compare_protocol.main(["--ref", str(ref), "--tpu", str(tpu)])
    out = capsys.readouterr().out
    assert "ave SSIM delta" in out
    assert "0.000250" in out   # ave |0.9105-0.91|/2 over 2 images
    assert "0.000500" in out   # max per-image SSIM delta
    assert "Worst per-image SSIM delta 0.000500 (m)" in out

    # artifacts without SSIM keep the PSNR-only table
    ref.write_text(json.dumps(art([30.0, 31.0])))
    tpu.write_text(json.dumps(art([30.0, 31.0])))
    compare_protocol.main(["--ref", str(ref), "--tpu", str(tpu)])
    out = capsys.readouterr().out
    assert "SSIM" not in out
