#!/bin/bash
# Round-5e device queue: consolidated remainder after taking scheduling
# over from r5c/r5d (their bash parents were stopped; the P1 fasthi
# delta run was left to finish — pass its PID as $1).
#
# Order (value-first):
#  1. fasthi16 for the P1 fasthi near-misses (flagship RLFN included):
#     models whose fasthi delta failed the gate get the f16-storage
#     variant swept + gated.
#  2. P2 fasthi sweep at real operating batches + capped-model probes one
#     batch step above their f32 caps.
#  3. P2 deltas (8 images).
#  4. fasthi16 for any NEW near-misses from P2 (first set excluded).
#  5. 27/28 stage-split fasthi + deltas; NLFFC fori fasthi + delta.
#  6. Completeness sweep of the current fast-flip models.
set -u
cd /root/repo
DD=/tmp/div2k_surrogate
OUT=results/protocol/zoo_sustained_fasthi_r5.json
OUT16=results/protocol/zoo_sustained_fasthi16_r5.json
WAIT_PID=${1:-0}

near_misses() {  # models whose fasthi (or fasthi16-pending) delta failed the gate
  python - <<'PY'
import json
d = json.load(open('results/protocol/numerics_delta_r4.json'))
ids = set()
for k, r in d.items():
    if r.get('attn') != 'auto' or r.get('tail') != 'auto' or r.get('w8'):
        continue
    if r.get('images', 0) < 8:
        continue
    dd = r.get('delta_db', {}).get('fasthi')
    w = r.get('delta_db_worst', {}).get('fasthi')
    if dd is None:
        continue
    if (abs(dd) > 0.005 or (w is not None and abs(w) > 0.01)) and r['model_id'] != 12:
        ids.add(r['model_id'])
print(' '.join(str(i) for i in sorted(ids)))
PY
}

{
  while [ "$WAIT_PID" != "0" ] && kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done

  MISS1=$(near_misses)
  echo "=== fasthi16 for P1 near-misses: [$MISS1] ==="
  if [ -n "$MISS1" ]; then
    timeout 7200 python tools/sweep_zoo_sustained.py --mode fasthi16 --method chain \
        --batch 128 --out $OUT16 -- $MISS1
    timeout 14400 python tools/validate_numerics.py --modes fasthi16 \
        --data_dir $DD --images 8 -- $MISS1
  fi

  echo "=== P2 fasthi sweep at batch 128 (auto-halve on compile-500) ==="
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

  MISS2=$(python - <<PY
s1 = set("$MISS1".split())
s2 = set("$(near_misses)".split())
print(' '.join(sorted(s2 - s1, key=int)))
PY
)
  echo "=== fasthi16 for P2 near-misses: [$MISS2] ==="
  if [ -n "$MISS2" ]; then
    timeout 7200 python tools/sweep_zoo_sustained.py --mode fasthi16 --method chain \
        --batch 128 --out $OUT16 -- $MISS2
    timeout 14400 python tools/validate_numerics.py --modes fasthi16 \
        --data_dir $DD --images 8 -- $MISS2
  fi

  echo "=== split models 27/28 under fasthi + deltas ==="
  timeout 7200 python tools/sweep_zoo_sustained.py --mode fasthi --method split \
      --out results/protocol/zoo_sustained_fasthi_split_r5.json -- 27 28
  timeout 14400 python tools/validate_numerics.py --modes fasthi \
      --data_dir $DD --images 8 -- 27 28

  echo "=== NLFFC fori fasthi rows + delta ==="
  timeout 3600 python tools/sweep_zoo_sustained.py --mode fasthi --method fori \
      --out results/protocol/zoo_sustained_fasthi_fori_r5.json -- 2
  timeout 3600 python tools/sweep_zoo_sustained.py --mode fasthi --method fori \
      --batch 2 --out results/protocol/zoo_sustained_fasthi_fori_b2_r5.json -- 2
  timeout 7200 python tools/validate_numerics.py --modes fasthi \
      --data_dir $DD --images 8 -- 2

  echo "=== completeness: current-fast-flip models at batch 128 ==="
  timeout 10800 python tools/sweep_zoo_sustained.py --mode fasthi --method chain \
      --batch 128 --out $OUT -- 0 5 10 30 34 35 40

  echo "=== R5E QUEUE DONE ==="
} >> /tmp/device_queue_r5e.log 2>&1
