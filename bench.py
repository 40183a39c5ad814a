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
    mode = os.environ.get("NTIRE_BENCH_MODE", "high")
    config.set_mode(mode)

    apply, params, name, data_range, tile = registry.build_model(4)

    batch = int(os.environ.get("NTIRE_BENCH_BATCH", "128"))
    rng = np.random.RandomState(0)
    params = jax.device_put(params)
    jitted = jax.jit(apply)

    while True:
        x = jnp.asarray(rng.rand(batch, 256, 256, 3).astype(np.float32) * data_range)
        try:
            np.asarray(jitted(params, x)[0, 0, 0, 0])  # compile + fence
            break
        except Exception as e:
            if "RESOURCE_EXHAUSTED" in str(e) and batch > 8:
                batch //= 2
                continue
            raise

    # measure: median over iterations. The reference times only the model
    # forward (CUDA events around the call, D2H excluded). On this backend
    # block_until_ready does not synchronize remote execution, so we fence
    # each call with a single-element device->host read instead.
    iters = int(os.environ.get("NTIRE_BENCH_ITERS", "20"))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jitted(params, x)
        np.asarray(out[0, 0, 0, 0])
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    img_per_sec = batch / dt

    print(json.dumps({
        "metric": f"RLFN_x4_256px_images_per_sec_per_chip_{mode}",
        "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
