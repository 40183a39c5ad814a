#!/bin/bash
# Round-5b device queue: measure the new `fasthi` tier (bf16 activation
# storage, f32 weights, HIGH contractions — config.py) where it can flip
# the gated envelope. Sanity A/B already measured on-chip: 13_RFDN_Dilated
# 3.48 (high) -> 2.00 ms/img, 26_IMDN 2.87 -> 1.84 at batch 128 — the
# storage converts fuse; fasthi lands between fast and high in speed with
# ~3-6 dB tighter parity agreement than fast (CPU probe).
#
# Ordered by envelope value so a partial run still yields evidence:
#  P1: the 10 models whose `fast` failed the benchmark gate (mean or worst
#      out of bounds, numerics_delta_r4.json) + flagship RLFN(4) + FMEN(3)
#      + MDGN(24) + IMDN_plus(39) — sweep, then 8-image deltas.
#  P2: never-measured high-tier models + the current fast16 flips
#      (9/18/20/23/33 — fasthi should beat f16's guard overhead); capped
#      models probe one batch step ABOVE their f32 cap (bf16 activations
#      halve executable size, which is the compile-500 ceiling).
#  P3: NLFFC fori rows + delta.
set -u
cd /root/repo
DD=/tmp/div2k_surrogate
OUT=results/protocol/zoo_sustained_fasthi_r5.json

{
  python tools/make_surrogate_div2k.py --out $DD --n 8

  echo "=== P1 sweep: gate-failed + flagship candidates ==="
  timeout 7200 python tools/sweep_zoo_sustained.py --mode fasthi --method chain \
      --out $OUT -- 4 3 13 26 -1 15 16 17 25 36 37 44 24 39
  echo "=== P1 deltas (8 images, mean + worst) ==="
  timeout 14400 python tools/validate_numerics.py --modes fasthi \
      --data_dir $DD --images 8 -- 4 3 13 26 -1 15 16 17 25 36 37 44 24 39

  echo "=== P2 sweep: never-measured + fast16-flip models ==="
  timeout 7200 python tools/sweep_zoo_sustained.py --mode fasthi --method chain \
      --out $OUT -- 1 6 8 11 14 19 22 29 31 38 42 43 18
  timeout 2400 python tools/sweep_zoo_sustained.py --mode fasthi --method chain \
      --batch 48 --out $OUT -- 9
  timeout 2400 python tools/sweep_zoo_sustained.py --mode fasthi --method chain \
      --batch 128 --out $OUT -- 20
  timeout 2400 python tools/sweep_zoo_sustained.py --mode fasthi --method chain \
      --batch 128 --out $OUT -- 23
  timeout 2400 python tools/sweep_zoo_sustained.py --mode fasthi --method chain \
      --batch 64 --out $OUT -- 33
  echo "=== P2 deltas ==="
  timeout 21600 python tools/validate_numerics.py --modes fasthi \
      --data_dir $DD --images 8 -- 1 6 8 11 14 19 22 29 31 38 42 43 9 18 20 23 33

  echo "=== P3: NLFFC fori rows + delta ==="
  timeout 3600 python tools/sweep_zoo_sustained.py --mode fasthi --method fori \
      --out results/protocol/zoo_sustained_fasthi_fori_r5.json -- 2
  timeout 3600 python tools/sweep_zoo_sustained.py --mode fasthi --method fori \
      --batch 2 --out results/protocol/zoo_sustained_fasthi_fori_b2_r5.json -- 2
  timeout 7200 python tools/validate_numerics.py --modes fasthi \
      --data_dir $DD --images 8 -- 2

  echo "=== FASTHI QUEUE DONE ==="
} >> /tmp/device_queue_r5b.log 2>&1
