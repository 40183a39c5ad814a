"""Pin tools/make_gated_envelope.py's join/gate logic on synthetic artifacts.

The real envelope (results/protocol/zoo_sustained_gated.json) is produced
from on-chip measurements; these tests keep the adjudication rules honest:
a non-high tier enters only with an on-chip sustained row AND a benchmark
delta measured on >= min_images surrogate images AND |mean delta| within
the gate AND |worst per-image delta| within the worst-image bar;
forced-variant delta rows are ignored, and the envelope never degrades
below the high row.
"""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import make_gated_envelope as mge


def _write(proto, name, obj):
    with open(os.path.join(proto, name), "w") as fh:
        json.dump(obj, fh)


@pytest.fixture
def proto(tmp_path):
    d = str(tmp_path / "protocol")
    os.makedirs(d)
    # canonical high table: two real zoo names (TITAN_MS lookup)
    _write(d, "zoo_sustained.json", {
        "04_RLFN": {"model_id": 4, "batch": 128, "mode": "high",
                    "ms_per_image_sustained": 1.62},
        "30_SCET": {"model_id": 30, "batch": 64, "mode": "high",
                    "ms_per_image_sustained": 19.8},
    })
    _write(d, "zoo_sustained_fast_r3.json", {
        "04_RLFN": {"model_id": 4, "batch": 128, "mode": "fast",
                    "ms_per_image_sustained": 0.80},
        "30_SCET": {"model_id": 30, "batch": 128, "mode": "fast",
                    "ms_per_image_sustained": 2.87},
    })
    _write(d, "zoo_sustained_fast16_r4.json", {
        "04_RLFN": {"model_id": 4, "batch": 64, "mode": "fast16",
                    "ms_per_image_sustained": 5.08},
        "30_SCET": {"model_id": 30, "batch": 64, "mode": "fast16",
                    "ms_per_image_sustained": 9.0},
    })
    _write(d, "numerics_delta_r4.json", {
        # RLFN: fast fails the 0.005 gate, fast16 passes but is SLOWER
        # than high -> keeps high
        "04_RLFN|attn=auto|tail=auto|fast,fast16": {
            "model_id": 4, "images": 8, "attn": "auto", "tail": "auto",
            "w8": False, "parity_psnr": 26.8,
            "delta_db": {"fast": -0.0222, "fast16": 0.0004},
            "delta_db_worst": {"fast": -0.0310, "fast16": 0.0007}},
        # SCET: fast passes AND is faster -> flips
        "30_SCET|attn=auto|tail=auto|fast,fast16": {
            "model_id": 30, "images": 8, "attn": "auto", "tail": "auto",
            "w8": False, "parity_psnr": 26.4,
            "delta_db": {"fast": 0.0009, "fast16": 0.0012},
            "delta_db_worst": {"fast": 0.0021, "fast16": 0.0030}},
        # forced-variant rows must NOT count toward the envelope
        "30_SCET|attn=auto|tail=bf16|high": {
            "model_id": 30, "images": 8, "attn": "auto", "tail": "bf16",
            "w8": False, "parity_psnr": 26.4, "delta_db": {"high": -0.9},
            "delta_db_worst": {"high": -1.2}},
        "04_RLFN|attn=auto|tail=auto|w8|fast": {
            "model_id": 4, "images": 8, "attn": "auto", "tail": "auto",
            "w8": True, "parity_psnr": 26.8, "delta_db": {"fast": 0.0},
            "delta_db_worst": {"fast": 0.0}},
    })
    return d


def _run(proto, *extra_args):
    return mge.main(["--proto_dir", proto, *extra_args])


def test_gate_and_speed_jointly_required(proto):
    env = _run(proto)
    # RLFN: fast fails gate, fast16 passes gate but slower -> high row kept
    assert env["04_RLFN"]["tier"] == "high"
    assert env["04_RLFN"]["ms_per_image_sustained"] == 1.62
    assert env["04_RLFN"]["tier_delta_db"] is None
    # SCET: fast passes gate and is faster -> flips with the measured delta
    assert env["30_SCET"]["tier"] == "fast"
    assert env["30_SCET"]["ms_per_image_sustained"] == 2.87
    assert env["30_SCET"]["tier_delta_db"] == pytest.approx(0.0009)
    assert env["30_SCET"]["tier_delta_db_worst"] == pytest.approx(0.0021)
    assert env["30_SCET"]["delta_images"] == 8


def test_forced_variant_rows_ignored(proto):
    # the tail=bf16 row carries a -0.9 dB delta for mode 'high'; if it
    # leaked into the envelope adjudication the 'high' tier itself would
    # be mis-keyed. gated_deltas must drop forced rows entirely.
    deltas = mge.gated_deltas(json.load(
        open(os.path.join(proto, "numerics_delta_r4.json"))))
    assert "high" not in deltas.get("30_SCET", {})
    assert "fast" in deltas["30_SCET"]
    # the w8 row's 0.0 delta must not overwrite RLFN's real fast delta
    assert deltas["04_RLFN"]["fast"][0] == pytest.approx(-0.0222)


def test_best_powered_measurement_wins(proto):
    # a MORE-IMAGES AUTO-config row must replace a smaller-sample one
    # (the best-powered measurement adjudicates); same-size rows break
    # toward the larger |delta| (conservative)
    art = json.load(open(os.path.join(proto, "numerics_delta_r4.json")))
    art["30_SCET|attn=auto|tail=auto|fast"] = {
        "model_id": 30, "images": 12, "attn": "auto", "tail": "auto",
        "w8": False, "parity_psnr": 26.4, "delta_db": {"fast": -0.0060},
        "delta_db_worst": {"fast": -0.0080}}
    _write(proto, "numerics_delta_r4.json", art)
    env = _run(proto)
    # the 12-image fast delta (-0.006) fails the 0.005 gate; the next
    # faster-than-high passing tier (fast16, 9.0 < 19.8 ms) wins instead
    assert env["30_SCET"]["tier"] == "fast16"
    assert env["30_SCET"]["ms_per_image_sustained"] == 9.0


def test_same_sample_ties_break_conservative(proto):
    # equal-images rows: the larger-|delta| one adjudicates
    art = json.load(open(os.path.join(proto, "numerics_delta_r4.json")))
    art["30_SCET|attn=auto|tail=auto|fast"] = {
        "model_id": 30, "images": 8, "attn": "auto", "tail": "auto",
        "w8": False, "parity_psnr": 26.4, "delta_db": {"fast": -0.0060},
        "delta_db_worst": {"fast": -0.0080}}
    _write(proto, "numerics_delta_r4.json", art)
    deltas = mge.gated_deltas(json.load(
        open(os.path.join(proto, "numerics_delta_r4.json"))))
    assert deltas["30_SCET"]["fast"][0] == pytest.approx(-0.0060)


def test_under_powered_measurement_never_flips(proto):
    # a 2-image spot check (round-4 legacy) cannot flip a tier, no matter
    # how good its delta looks
    art = json.load(open(os.path.join(proto, "numerics_delta_r4.json")))
    row = art.pop("30_SCET|attn=auto|tail=auto|fast,fast16")
    row["images"] = 2
    art["30_SCET|attn=auto|tail=auto|fast,fast16"] = row
    _write(proto, "numerics_delta_r4.json", art)
    env = _run(proto)
    assert env["30_SCET"]["tier"] == "high"
    # ... unless the caller explicitly lowers the evidence bar
    env = _run(proto, "--min_images", "2")
    assert env["30_SCET"]["tier"] == "fast"


def test_worst_image_bound_blocks_flip(proto):
    # mean delta passes the gate but one image shifts past the +-0.01 dB
    # reproducibility bar -> not admissible
    art = json.load(open(os.path.join(proto, "numerics_delta_r4.json")))
    row = art["30_SCET|attn=auto|tail=auto|fast,fast16"]
    row["delta_db_worst"] = {"fast": -0.0150, "fast16": 0.0200}
    _write(proto, "numerics_delta_r4.json", art)
    env = _run(proto)
    assert env["30_SCET"]["tier"] == "high"


def test_legacy_row_without_worst_never_flips(proto):
    # rows that predate per-image tracking carry no worst bound and are
    # not admissible evidence
    art = json.load(open(os.path.join(proto, "numerics_delta_r4.json")))
    del art["30_SCET|attn=auto|tail=auto|fast,fast16"]["delta_db_worst"]
    _write(proto, "numerics_delta_r4.json", art)
    env = _run(proto)
    assert env["30_SCET"]["tier"] == "high"


def test_missing_delta_never_flips(proto):
    # remove SCET's delta rows: sustained fast row alone must not flip it
    art = json.load(open(os.path.join(proto, "numerics_delta_r4.json")))
    art = {k: v for k, v in art.items() if "30_SCET" not in k}
    _write(proto, "numerics_delta_r4.json", art)
    env = _run(proto)
    assert env["30_SCET"]["tier"] == "high"


def test_gate_widening_admits_more(proto):
    # at the reference's own +-0.01 bar RLFN's fast16 still passes but is
    # slower; its fast (-0.0222, worst -0.031) still fails -> high. Widening
    # both bars to 0.05 admits fast.
    env = _run(proto, "--gate", "0.05", "--worst_gate", "0.05")
    assert env["04_RLFN"]["tier"] == "fast"
    assert env["04_RLFN"]["ms_per_image_sustained"] == 0.80


def test_extra_artifact_fastest_row_wins(proto, tmp_path):
    # a tuned re-measure in an --extra file beats the uniform-sweep row
    extra = str(tmp_path / "tuned.json")
    with open(extra, "w") as fh:
        json.dump({"30_SCET": {"model_id": 30, "batch": 128, "mode": "fast",
                               "ms_per_image_sustained": 2.50}}, fh)
    env = _run(proto, "--extra", extra)
    assert env["30_SCET"]["ms_per_image_sustained"] == 2.50
    assert env["30_SCET"]["tier"] == "fast"


def test_fasthi_candidate_tier_flips_when_fastest_passing(proto):
    # the round-5 storage tiers are full envelope candidates: RLFN's fast
    # fails the gate and fast16 is slower than high, but a measured
    # fasthi row that passes the 8-image gate AND beats high flips it —
    # and a near-miss fasthi delta (worst just past the ±0.01 bar, the
    # measured RLFN case) is rejected like any other tier.
    _write(proto, "zoo_sustained_fasthi_r5.json", {
        "04_RLFN": {"model_id": 4, "batch": 128, "mode": "fasthi",
                    "method": "chain", "ms_per_image_sustained": 0.98}})
    art = json.load(open(os.path.join(proto, "numerics_delta_r4.json")))
    art["04_RLFN|attn=auto|tail=auto|fasthi"] = {
        "model_id": 4, "images": 8, "attn": "auto", "tail": "auto",
        "w8": False, "parity_psnr": 26.8,
        "delta_db": {"fasthi": -0.0093},
        "delta_db_worst": {"fasthi": -0.0109}}  # worst fails ±0.01
    _write(proto, "numerics_delta_r4.json", art)
    env = _run(proto)
    assert env["04_RLFN"]["tier"] == "high"
    # a passing fasthi16 row (f16 storage cuts the rounding ~8x) flips it
    _write(proto, "zoo_sustained_fasthi16_r5.json", {
        "04_RLFN": {"model_id": 4, "batch": 128, "mode": "fasthi16",
                    "method": "chain", "ms_per_image_sustained": 1.10}})
    art["04_RLFN|attn=auto|tail=auto|fasthi16"] = {
        "model_id": 4, "images": 8, "attn": "auto", "tail": "auto",
        "w8": False, "parity_psnr": 26.8,
        "delta_db": {"fasthi16": -0.0011},
        "delta_db_worst": {"fasthi16": -0.0014}}
    _write(proto, "numerics_delta_r4.json", art)
    env = _run(proto)
    assert env["04_RLFN"]["tier"] == "fasthi16"
    assert env["04_RLFN"]["ms_per_image_sustained"] == 1.10
    assert env["04_RLFN"]["method"] == "chain"


def test_write_artifact(proto):
    _run(proto, "--write")
    out = json.load(open(os.path.join(proto, "zoo_sustained_gated.json")))
    assert set(out) == {"04_RLFN", "30_SCET"}
    assert out["30_SCET"]["tier"] == "fast"


def test_pin_high_blocks_flip(proto):
    # oracle-less models (HNCT: random-init deltas) can be pinned to high
    # regardless of their measured numbers
    env = mge.main(["--proto_dir", proto, "--pin_high", "30"])
    assert env["30_SCET"]["tier"] == "high"
    assert env["04_RLFN"]["tier"] == "high"  # unrelated rows unaffected
