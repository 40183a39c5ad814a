"""bench.py driver contract: exactly one parseable JSON line on stdout."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_json_contract():
    env = dict(os.environ)
    env.update({
        "PALLAS_AXON_POOL_IPS": "",   # force CPU (skip the axon backend)
        "JAX_PLATFORMS": "cpu",
        "NTIRE_BENCH_BATCH": "2",
        "NTIRE_BENCH_ITERS": "2",
        "NTIRE_BENCH_TIMEOUT": "560",
    })
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=580, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-500:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line, got {lines}"
    rec = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec
    assert rec["value"] > 0 and rec["unit"] == "images/sec"
    # full-zoo aggregates from the recorded on-chip artifacts: _zoo_summary
    # degrades silently on error, so assert the fields actually appear (the
    # artifacts are checked in under results/protocol/)
    for key in ("zoo_sustained_geomean_vs_baseline",
                "zoo_sustained_min_vs_baseline", "zoo_models",
                "zoo_fast_geomean_vs_baseline", "zoo_fast_min_vs_baseline"):
        assert key in rec, f"missing {key}: {rec}"
        assert rec[key] > 0


def test_sweep_zoo_sustained_smoke(tmp_path):
    """The sustained-throughput sweep tool runs end-to-end on CPU."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import sweep_zoo_sustained

    out = str(tmp_path / "sus.json")
    sweep_zoo_sustained.main([
        "--out", out, "--size", "48", "--batch", "1",
        "--reps", "2", "--iters", "1", "24",
    ])
    art = json.load(open(out))
    assert "24_MDGN" in art
    row = art["24_MDGN"]
    assert row["batch"] == 1 and row["reps"] == 2
    assert row["ms_per_image_sustained"] > 0


def test_sweep_resume_cache_keyed_on_settings(tmp_path):
    """Re-running with different settings must REMEASURE, not reuse rows
    measured under old settings (artifact-methodology integrity)."""
    import json
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import sweep_zoo_sustained

    out = str(tmp_path / "sus.json")
    base = ["--out", out, "--size", "48", "--batch", "1", "--iters", "1", "24"]
    sweep_zoo_sustained.main(base + ["--reps", "2"])
    assert json.load(open(out))["24_MDGN"]["reps"] == 2
    # same settings -> cached (row unchanged)
    sweep_zoo_sustained.main(base + ["--reps", "2"])
    assert json.load(open(out))["24_MDGN"]["reps"] == 2
    # different reps -> remeasured under the new settings
    sweep_zoo_sustained.main(base + ["--reps", "3"])
    assert json.load(open(out))["24_MDGN"]["reps"] == 3
    # different method -> remeasured and recorded
    sweep_zoo_sustained.main(base + ["--reps", "3", "--method", "chain"])
    assert json.load(open(out))["24_MDGN"]["method"] == "chain"


def test_sweep_chain_method_smoke(tmp_path):
    """chain method: small executable dispatched back-to-back, fenced once."""
    import json
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import sweep_zoo_sustained

    out = str(tmp_path / "chain.json")
    sweep_zoo_sustained.main([
        "--out", out, "--size", "48", "--batch", "1",
        "--reps", "2", "--iters", "1", "--method", "chain", "24",
    ])
    row = json.load(open(out))["24_MDGN"]
    assert row["method"] == "chain" and row["ms_per_image_sustained"] > 0
