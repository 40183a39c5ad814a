#!/usr/bin/env python
"""Headline benchmark: flagship RLFN (team04, runtime-track winner) x4 SR
throughput on a 256x256 LR input, single chip.

Baseline: the reference's published RLFN runtime on the challenge GPU
(Titan Xp): 27.11 ms/image at 256x256-class inputs (BASELINE.md row 1)
= 36.89 images/sec. ``vs_baseline`` is our images/sec over that.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_IMG_PER_SEC = 1000.0 / 27.11  # Titan Xp, reference protocol


def _watchdog(seconds: int) -> None:
    """Emit a diagnostic JSON line and exit if the device wedges mid-bench
    (the tunnelled TPU backend can hang indefinitely on a dead grant)."""
    import signal

    def onalarm(signum, frame):
        print(json.dumps({
            "metric": "RLFN_x4_256px_images_per_sec_per_chip",
            "value": 0.0,
            "unit": "images/sec",
            "vs_baseline": 0.0,
            "error": f"device unresponsive for {seconds}s",
        }))
        os._exit(2)

    signal.signal(signal.SIGALRM, onalarm)
    signal.alarm(seconds)


def main():
    # generous: remote-compile via the tunnel has been observed to take
    # minutes per executable
    _watchdog(int(os.environ.get("NTIRE_BENCH_TIMEOUT", "1500")))

    import jax
    import jax.numpy as jnp

    from ntire2022_esr_tpu import config
    from ntire2022_esr_tpu.harness import registry

    # default 'high' (3-pass bf16 MXU, f32 everywhere else): measured
    # 74-77 dB vs the parity output across the zoo's model families, i.e.
    # <= 0.002 dB on the 29 dB benchmark PSNR - strictly within the
    # challenge's +-0.01 dB parity bar, at ~1.4x the HIGHEST throughput.
    mode = os.environ.get("NTIRE_BENCH_MODE", "envelope")
    tier_delta = None
    if mode == "envelope":
        # Serve the flagship at its benchmark-gated envelope tier — the
        # serve CLI's default deployment config. A non-high tier is only
        # ever in the artifact on >= 8-image protocol evidence with
        # |mean delta| <= 0.005 dB AND |worst image| <= 0.01 dB
        # (tools/make_gated_envelope.py), i.e. inside the challenge's own
        # +-0.01 dB reproducibility bar (reference test_demo.py:447).
        try:
            _env = json.load(open(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "results", "protocol", "zoo_sustained_gated.json")))["04_RLFN"]
            mode = _env["tier"]
            tier_delta = _env.get("tier_delta_db")
        except Exception:
            mode = "high"  # artifact absent (fresh clone): parity-grade tier
    config.set_mode(mode)

    apply, params, name, data_range, tile = registry.build_model(4)

    rng = np.random.RandomState(0)
    params = jax.device_put(params)

    # Serving boundary: uint8 in -> on-device convert -> model -> on-device
    # round/clip -> uint8 out (exact tensor2uint semantics). This times
    # strictly MORE device work than the reference (which times only the
    # f32 forward, test_demo.py:429-433), while the 4x smaller output
    # buffer lets larger batches schedule without hitting XLA's
    # memory-conserving regime (measured cliff above batch 128 for f32 I/O).
    def serve(p, u8):
        # exact uint2nhwc / nhwc2uint expressions (matching utils/image.py
        # and harness/serving.py bit-for-bit: divide-by-(255/DR) in, clamp
        # in the data_range domain then rescale+round out)
        x = u8.astype(jnp.float32) / (255.0 / data_range)
        y = apply(p, x)
        y = jnp.clip(y, 0, data_range) * (255.0 / data_range)
        return jnp.round(y).astype(jnp.uint8)

    # Sustained timing: `reps` forwards inside one executable (input varied
    # per rep, every output fully reduced so nothing is elided). Per-call
    # fenced timing through the tunnelled backend pays a fixed dispatch cost
    # a locally-attached chip does not have — the reference's CUDA-event
    # numbers contain no such artifact (us-scale launch). Set
    # NTIRE_BENCH_REPS=1 for raw per-call timing.
    reps = int(os.environ.get("NTIRE_BENCH_REPS", "8"))
    if reps > 1:
        def timed(p, u8):
            def body(i, acc):
                y = serve(p, u8 + i.astype(jnp.uint8))
                return acc + y.astype(jnp.int32).sum()
            return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int32))
    else:
        timed = serve

    jitted = jax.jit(timed)
    iters = max(1, int(os.environ.get("NTIRE_BENCH_ITERS", "10")))
    batches = [int(b) for b in os.environ.get("NTIRE_BENCH_BATCH", "256,128").split(",")]

    # measure: median over iterations, per candidate batch; report the best.
    # The reference times only the model forward (CUDA events around the
    # call, D2H excluded). On this backend block_until_ready does not
    # synchronize remote execution, so we fence each call with a
    # single-element device->host read instead.
    def _fence(out):
        arr = out[0, 0, 0, 0] if reps == 1 else out
        np.asarray(arr)

    best = (0.0, 0)
    for batch in batches:
        u = jnp.asarray(rng.randint(0, 256, (batch, 256, 256, 3), dtype=np.uint8))
        for attempt in (0, 1):
            try:
                _fence(jitted(params, u))  # compile + fence
                break
            except Exception as e:
                # skip batches this backend cannot run: HBM exhaustion OR
                # the remote compile helper's executable-size ceiling
                # (HTTP 500, observed at batch 512) — both mean "try the
                # next batch". A 500 can also be a transient helper blip,
                # so retry once at the same batch before skipping it.
                if not ("RESOURCE_EXHAUSTED" in str(e)
                        or "remote_compile" in str(e) or "HTTP 500" in str(e)):
                    raise
                if "RESOURCE_EXHAUSTED" in str(e) or attempt == 1:
                    del u
                    u = None
                    break
        if u is None:
            continue
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = jitted(params, u)
            _fence(out)
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        if batch * reps / dt > best[0]:
            best = (batch * reps / dt, batch)
        del u, out  # free this candidate's HBM before the next compiles
    img_per_sec, batch = best
    if not batch:
        raise RuntimeError("all candidate batches exhausted device memory")

    # Per-call number at the winning batch (the round-1 metric): one plain
    # dispatch per timing, fenced — includes the tunnel's fixed per-call
    # dispatch cost, so it is a lower bound a locally-attached chip beats.
    # Reported alongside so BENCH_rN stays longitudinally comparable.
    per_call = None
    if reps > 1:
        pc = jax.jit(serve)
        u = jnp.asarray(rng.randint(0, 256, (batch, 256, 256, 3), dtype=np.uint8))
        np.asarray(pc(params, u)[0, 0, 0, 0])  # compile + fence
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(pc(params, u)[0, 0, 0, 0])
            times.append(time.perf_counter() - t0)
        per_call = batch / sorted(times)[len(times) // 2]

    suffix = "_sustained" if reps > 1 else ""
    rec = {
        "metric": f"RLFN_x4_256px_images_per_sec_per_chip_{mode}_u8serve{suffix}",
        "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
    }
    if per_call is not None:
        rec["per_call_images_per_sec"] = round(per_call, 2)
        rec["per_call_vs_baseline"] = round(per_call / BASELINE_IMG_PER_SEC, 3)
    if tier_delta is not None:
        # measured 8-image protocol PSNR shift of the serving tier vs the
        # parity arm (numerics_delta ledger via the gated envelope)
        rec["tier_delta_db"] = round(tier_delta, 4)
    rec.update(_zoo_summary())
    print(json.dumps(rec))


def _zoo_summary():
    """Full-zoo aggregates from the recorded on-chip sustained artifacts
    (results/protocol/zoo_sustained*.json, measured by
    tools/sweep_zoo_sustained.py) vs the published Titan Xp per-model
    runtimes — so each BENCH_rN records the zoo-wide picture alongside the
    flagship number. Static file reads; no device work."""
    import math

    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.join(repo, "tools"))
    out = {}
    try:
        from merge_sustained import TITAN_MS

        def agg(path):
            art = json.load(open(os.path.join(repo, path)))
            sps = [TITAN_MS[n] / r["ms_per_image_sustained"]
                   for n, r in art.items() if n in TITAN_MS]
            geo = math.exp(sum(math.log(s) for s in sps) / len(sps))
            return round(geo, 1), round(min(sps), 1), len(sps)

        geo, lo, n = agg("results/protocol/zoo_sustained.json")
        out["zoo_sustained_geomean_vs_baseline"] = geo
        out["zoo_sustained_min_vs_baseline"] = lo
        out["zoo_models"] = n
        geo, lo, _ = agg("results/protocol/zoo_sustained_fast_r3.json")
        out["zoo_fast_geomean_vs_baseline"] = geo
        out["zoo_fast_min_vs_baseline"] = lo
        try:
            # benchmark-gated envelope (tools/make_gated_envelope.py):
            # fastest tier per model with measured |protocol delta| <=
            # 0.005 dB — the headline "no quality trade" serving numbers
            geo, lo, _ = agg("results/protocol/zoo_sustained_gated.json")
            out["zoo_gated_geomean_vs_baseline"] = geo
            out["zoo_gated_min_vs_baseline"] = lo
        except Exception:
            pass
    except Exception:
        pass  # artifacts absent (fresh clone): headline fields still emitted
    return out


if __name__ == "__main__":
    main()
