#!/bin/bash
# Round-5c device queue: corrected fasthi measurement plan. The r5b queue
# ran the P1 sweep at the tool's conservative default batch (32) instead
# of the models' shipped batch-128 operating points, under-measuring the
# tier (fasthi 13_RFDN_Dilated: 2.00 ms/img @128 vs 4.69 @32); its bash
# parent was stopped after the P1 sweep launched. This queue waits for
# that orphaned sweep to finish (never kill a python mid-device-use),
# re-sweeps at the real operating batches (auto-halving covers any
# compile-500), then runs the 8-image benchmark-delta gate and the NLFFC
# fori rows. Single chip — strictly serial.
set -u
cd /root/repo
DD=/tmp/div2k_surrogate
OUT=results/protocol/zoo_sustained_fasthi_r5.json
ORPHAN=${1:-0}

{
  while [ "$ORPHAN" != "0" ] && kill -0 "$ORPHAN" 2>/dev/null; do sleep 30; done

  echo "=== P1 re-sweep at batch 128 ==="
  timeout 7200 python tools/sweep_zoo_sustained.py --mode fasthi --method chain \
      --batch 128 --out $OUT -- 4 3 13 26 -1 15 16 17 25 36 37 44 24 39
  echo "=== P1 deltas (8 images, mean + worst) ==="
  timeout 14400 python tools/validate_numerics.py --modes fasthi \
      --data_dir $DD --images 8 -- 4 3 13 26 -1 15 16 17 25 36 37 44 24 39

  echo "=== P2 sweep at batch 128 (auto-halve on compile-500) ==="
  timeout 10800 python tools/sweep_zoo_sustained.py --mode fasthi --method chain \
      --batch 128 --out $OUT -- 1 6 8 11 14 19 22 29 31 38 42 43 18
  echo "=== P2 capped-model probes one step above their f32 caps ==="
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
} >> /tmp/device_queue_r5c.log 2>&1
