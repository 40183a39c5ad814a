#!/bin/bash
# Round-5d device queue (runs after r5c): complete the fasthi tier's
# envelope coverage.
#  - 27/28 stage-split dispatch under fasthi (the split keeps the active
#    mode's numerics; their high-split rows are the current envelope) +
#    their 8-image benchmark deltas.
#  - Completeness sweep of the models whose current flip is `fast`
#    (0 5 10 30 34 35 40): fasthi is expected slower than fast there —
#    rows recorded so the tier table is full-zoo and the envelope can
#    still pick `fast` where it stays admissible.
set -u
cd /root/repo
DD=/tmp/div2k_surrogate
OUT=results/protocol/zoo_sustained_fasthi_r5.json

{
  while ! grep -q "FASTHI QUEUE DONE" /tmp/device_queue_r5c.log 2>/dev/null; do
    sleep 60
  done

  echo "=== split models 27/28 under fasthi ==="
  timeout 7200 python tools/sweep_zoo_sustained.py --mode fasthi --method split \
      --out results/protocol/zoo_sustained_fasthi_split_r5.json -- 27 28
  echo "=== 27/28 deltas (8 images, mean + worst) ==="
  timeout 14400 python tools/validate_numerics.py --modes fasthi \
      --data_dir $DD --images 8 -- 27 28

  echo "=== completeness: current-fast-flip models at batch 128 ==="
  timeout 10800 python tools/sweep_zoo_sustained.py --mode fasthi --method chain \
      --batch 128 --out $OUT -- 0 5 10 30 34 35 40

  echo "=== R5D QUEUE DONE ==="
} >> /tmp/device_queue_r5d.log 2>&1
