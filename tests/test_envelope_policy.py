"""Envelope serving policy (harness/envelope.py): plan parsing, tier
pinning, and dispatch-method routing from the gated-envelope artifact."""

import json

import numpy as np
import pytest

from ntire2022_esr_tpu import config
from ntire2022_esr_tpu.harness import envelope, registry
from ntire2022_esr_tpu.utils import image as img_util


def _write_artifact(tmp_path, rows):
    p = tmp_path / "zoo_sustained_gated.json"
    p.write_text(json.dumps(rows))
    return str(p)


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


def test_missing_artifact_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="make_gated_envelope"):
        envelope.load_envelope(str(tmp_path / "nope.json"))


def test_plan_parsing(tmp_path):
    path = _write_artifact(tmp_path, ROWS)
    plans = envelope.load_envelope(path)
    assert set(plans) == set(ROWS)
    p4 = envelope.plan_for(4, path)
    assert (p4.tier, p4.batch, p4.method, p4.chunk) == ("fast", 4, "chain", None)
    assert p4.stage_split is False
    p28 = envelope.plan_for(28, path)
    assert (p28.method, p28.chunk, p28.stage_split) == ("split", 2, 2)
    with pytest.raises(KeyError, match="no row"):
        envelope.plan_for(44, path)


def test_tiled_model_routed_to_tiler(tmp_path):
    path = _write_artifact(tmp_path, ROWS)
    with pytest.raises(ValueError, match="tiled runner"):
        envelope.make_server(2, path=path)


def test_make_server_pins_tier(tmp_path, rng):
    """The server runs the plan's tier (fast = bf16 e2e) regardless of the
    ambient process mode, and leaves the ambient mode untouched."""
    path = _write_artifact(tmp_path, ROWS)
    config.set_mode("parity")
    srv = envelope.make_server(4, path=path, max_batch=2)
    assert srv.tier == "fast" and srv.plan.tier_delta_db == -0.015

    lr = rng.randint(0, 256, (24, 33, 3), dtype=np.uint8)
    sr = srv.process_one(lr)
    assert config.mode() == "parity"  # ambient mode untouched

    # references computed EAGERLY: jit of the same zoo apply object hits
    # jax's global executable cache across numerics modes (the mode is read
    # at trace time), which would silently reuse the first-traced tier
    apply, params, name, dr, tile = registry.build_model(4)
    x = img_util.uint2nhwc(lr, dr)
    with config.numerics_mode("fast"):
        fast_ref = img_util.nhwc2uint(np.asarray(apply(params, x), np.float32), dr)
    parity_ref = img_util.nhwc2uint(np.asarray(apply(params, x), np.float32), dr)

    # matches the pinned-tier reference (conversion-path ulp flips only) …
    assert np.abs(sr.astype(np.int16) - fast_ref.astype(np.int16)).max() <= 1
    # … and is demonstrably NOT the ambient parity computation
    assert np.abs(sr.astype(np.int16) - parity_ref.astype(np.int16)).max() >= 2


def test_make_server_split_dispatch(tmp_path, rng):
    """Split-method plans configure stage-split serving; output matches the
    whole forward at the plan's tier."""
    path = _write_artifact(tmp_path, ROWS)
    srv = envelope.make_server(28, path=path)
    assert srv.plan.method == "split" and srv._srv._split is not None

    lr = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    sr = srv.process_one(lr)

    apply, params, name, dr, tile = registry.build_model(28)
    with config.numerics_mode("high"):  # eager: see test_make_server_pins_tier
        y = apply(params, img_util.uint2nhwc(lr, dr))
    ref = img_util.nhwc2uint(np.asarray(y, np.float32), dr)
    assert np.abs(sr.astype(np.int16) - ref.astype(np.int16)).max() <= 1


def test_stream_pins_tier_across_yields(tmp_path, rng):
    path = _write_artifact(tmp_path, ROWS)
    config.set_mode("parity")
    srv = envelope.make_server(4, path=path, max_batch=2)
    frames = [rng.randint(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(3)]
    outs = list(srv.process_stream(frames))
    assert len(outs) == 3 and config.mode() == "parity"
    for f, o in zip(frames, outs):
        assert np.array_equal(o, srv.process_one(f))


def test_real_artifact_loads_if_present():
    """The shipped artifact (when generated) must parse into valid plans."""
    try:
        plans = envelope.load_envelope()
    except FileNotFoundError:
        pytest.skip("gated envelope artifact not generated in this checkout")
    assert len(plans) >= 40
    for p in plans.values():
        assert p.tier in ("high", "fast", "fast16", "fasthi", "fasthi16")
        assert p.ms_per_image > 0 and p.batch >= 1
        if p.method == "split":
            assert p.chunk and p.batch % p.chunk == 0
        if p.tier != "high":
            assert p.tier_delta_db is not None and abs(p.tier_delta_db) <= 0.005


def test_real_artifact_methods_match_registry():
    """Dispatch-method integrity vs the registry: every registry-tiled
    model (spec.tile is not None, reference test_demo.py:337) must route to
    the tiled (fori) runner — the sweep's 'chain' timing label must never
    leak into the artifact as an untiled full-image deployment — and no
    untiled model may claim the fori route or an unregistered stage split."""
    try:
        plans = envelope.load_envelope()
    except FileNotFoundError:
        pytest.skip("gated envelope artifact not generated in this checkout")
    from ntire2022_esr_tpu.harness import stagesplit

    for p in plans.values():
        spec = registry.get_spec(p.model_id)
        if spec.tile is not None:
            assert p.method == "fori", (
                f"{p.name}: registry mandates tiled dispatch, artifact says "
                f"{p.method!r}")
        else:
            assert p.method != "fori", f"{p.name}: fori row for untiled model"
        if p.method == "split":
            assert stagesplit.get_split(p.model_id) is not None, (
                f"{p.name}: split plan without a registered stage split")
