"""Serving CLI (harness/serve.py): envelope listing, plan-configured
serving, tier override, and the tiled (fori) route."""

import json
import os

import numpy as np
import pytest

from ntire2022_esr_tpu import config
from ntire2022_esr_tpu.harness import serve


ROWS = {
    "04_RLFN": {"model_id": 4, "batch": 4, "reps": 8, "tier": "fast",
                "method": "chain", "ms_per_image_sustained": 0.7,
                "tier_delta_db": -0.015},
    "28_NASNetBN": {"model_id": 28, "batch": 4, "chunk": 2, "reps": 8,
                    "tier": "high", "method": "split", "size": 256,
                    "ms_per_image_sustained": 8.9, "tier_delta_db": None},
    "02_NLFFC": {"model_id": 2, "batch": 1, "tier": "high", "method": "fori",
                 "ms_per_image_sustained": 341.4, "tier_delta_db": None},
}


@pytest.fixture
def artifact(tmp_path):
    p = tmp_path / "zoo_sustained_gated.json"
    p.write_text(json.dumps(ROWS))
    return str(p)


def _run(capsys, argv):
    rc = serve.main(argv)
    assert rc == 0
    return capsys.readouterr().out


def test_list(artifact, capsys):
    out = _run(capsys, ["--list", "--envelope", artifact])
    assert "04_RLFN" in out and "split/2" in out and "fori" in out
    assert "AUTO ledger" in out and "-0.0150" in out


def test_serve_synthetic_chain(artifact, capsys, tmp_path):
    save = str(tmp_path / "sr")
    out = _run(capsys, ["--model_id", "4", "--envelope", artifact,
                        "--synthetic", "3", "--hw", "16", "16",
                        "--save_dir", save])
    row = json.loads(out.strip().splitlines()[-1])
    assert row["model"] == "04_RLFN" and row["tier"] == "fast"
    assert row["images"] == 3 and row["images_per_sec"] > 0
    pngs = sorted(os.listdir(save))
    assert pngs == [f"frame_{i:04d}_sr.png" for i in range(3)]
    assert config.mode() == "parity"  # ambient mode untouched


def test_serve_split_plan(artifact, capsys):
    out = _run(capsys, ["--model_id", "28", "--envelope", artifact,
                        "--synthetic", "2", "--hw", "16", "16"])
    row = json.loads(out.strip().splitlines()[-1])
    assert row["method"] == "split" and row["images"] == 2


def test_tier_override(artifact, capsys):
    out = _run(capsys, ["--model_id", "4", "--envelope", artifact,
                        "--synthetic", "1", "--hw", "16", "16",
                        "--tier", "parity", "--batch", "1"])
    row = json.loads(out.strip().splitlines()[-1])
    assert row["tier"] == "parity" and row["tier_delta_db"] is None


def test_serve_images_dir(artifact, capsys, tmp_path, rng):
    from ntire2022_esr_tpu.utils import image as img_util

    src = tmp_path / "in"
    src.mkdir()
    for name in ("a", "b"):
        img_util.imsave(rng.randint(0, 256, (16, 16, 3), dtype=np.uint8),
                        str(src / f"{name}.png"))
    save = str(tmp_path / "sr")
    out = _run(capsys, ["--model_id", "4", "--envelope", artifact,
                        "--images", str(src), "--save_dir", save])
    row = json.loads(out.strip().splitlines()[-1])
    assert row["images"] == 2
    assert sorted(os.listdir(save)) == ["a_sr.png", "b_sr.png"]


def test_serve_tiled_route(artifact, capsys, tmp_path):
    save = str(tmp_path / "sr")
    out = _run(capsys, ["--model_id", "2", "--envelope", artifact,
                        "--synthetic", "1", "--hw", "24", "24",
                        "--save_dir", save])
    row = json.loads(out.strip().splitlines()[-1])
    assert row["method"] == "fori" and row["images"] == 1
    assert os.listdir(save) == ["frame_0000_sr.png"]
