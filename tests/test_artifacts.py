"""Integrity of the recorded on-chip artifacts under results/protocol/.

The headline claims (STATUS.md, docs/RUNTIME_TPU.md) and bench.py's
zoo-aggregate fields are recomputed from these files; a truncated or
hand-mangled artifact would silently skew published numbers. Pure host
checks — no device work.
"""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROTO = os.path.join(REPO, "results", "protocol")
sys.path.insert(0, os.path.join(REPO, "tools"))


def _load(name):
    return json.load(open(os.path.join(PROTO, name)))


@pytest.mark.parametrize("fname,mode", [
    ("zoo_sustained.json", "high"),
    ("zoo_sustained_fast_r3.json", "fast"),
])
def test_sustained_artifact_covers_full_zoo(fname, mode):
    from ntire2022_esr_tpu.harness import registry

    art = _load(fname)
    ids = {row["model_id"] for row in art.values()}
    assert ids == set(registry.available_ids()), (
        f"{fname} does not cover the registered zoo")
    for name, row in art.items():
        assert row["ms_per_image_sustained"] > 0, name
        assert row["mode"] == mode, (name, row["mode"])
        assert row["batch"] >= 1, name


def test_sustained_matches_titan_table():
    """Every artifact row maps to a Titan Xp baseline row (merge_sustained
    aggregates silently drop unmatched names)."""
    from merge_sustained import TITAN_MS

    for fname in ("zoo_sustained.json", "zoo_sustained_fast_r3.json"):
        art = _load(fname)
        missing = [n for n in art if n not in TITAN_MS]
        assert not missing, (fname, missing)


def test_gated_envelope_artifact_honest():
    """The shipped envelope (serve CLI default) must cover the zoo, never
    degrade below the high table, and carry a measured within-gate delta
    for every non-high row (tools/make_gated_envelope.py GATE=0.005)."""
    from ntire2022_esr_tpu.harness import registry

    art = _load("zoo_sustained_gated.json")
    high = _load("zoo_sustained.json")
    ids = {row["model_id"] for row in art.values()}
    assert ids == set(registry.available_ids())
    for name, row in art.items():
        assert row["ms_per_image_sustained"] > 0, name
        if name in high:
            assert (row["ms_per_image_sustained"]
                    <= high[name]["ms_per_image_sustained"] + 1e-9), name
        if row["tier"] == "high":
            assert row.get("tier_delta_db") is None, name
        else:
            assert abs(row["tier_delta_db"]) <= 0.005, (name, row)
            # round-5 evidence bar: >= 8 surrogate images + a recorded
            # worst-per-image shift inside the reference's own +-0.01 dB
            # reproducibility bar (VERDICT r4 item 2)
            assert row.get("delta_images", 0) >= 8, name
            assert abs(row["tier_delta_db_worst"]) <= 0.01, (name, row)


def test_gated_envelope_loads_as_plans():
    """harness.envelope parses the committed artifact into ServingPlans."""
    from ntire2022_esr_tpu.harness import envelope

    plans = envelope.load_envelope()
    assert len(plans) == 42
    for p in plans.values():
        assert p.tier in ("parity", "high", "mixed", "fast", "fast16", "fasthi", "fasthi16"), p
        assert p.method in ("chain", "split", "fori"), p
        assert (p.chunk is not None) == (p.method == "split"), p


@pytest.mark.parametrize("fname,min_rows", [
    ("roofline_r3.json", 10),
    ("roofline_r5.json", 42),  # round 5: full zoo at shipped operating points
])
def test_roofline_rows_are_physical(fname, min_rows):
    """measured >= bytes speed-of-light (sol_ratio >= 1): a sub-1 ratio
    means the cost-analysis bytes or the measurement regressed."""
    art = _load(fname)
    assert len(art) >= min_rows
    for name, row in art.items():
        assert row["sol_ratio"] >= 0.99, (name, row["sol_ratio"])
        assert row["measured_ms_per_img"] > 0, name
        assert row["bound"] in ("hbm", "mxu"), name
