#!/bin/bash
# Round-5 gate hardening: re-measure every envelope-candidate (model, tier)
# benchmark delta on the FULL 8-image surrogate protocol set (true DIV2K
# shapes), recording mean AND worst-per-image deltas (VERDICT.md round-4
# item 2). Candidates = faster-than-high tier rows whose 2-image delta was
# within 2x the 0.005 dB gate, plus the two never-measured fast pairs
# (-1, 44). Appends to results/protocol/numerics_delta_r4.json.
set -u
cd /root/repo
DD=/tmp/div2k_surrogate
LOG=/tmp/remeasure_r5.log
{
  echo "=== group 1: fast-only candidates ==="
  python tools/validate_numerics.py --modes fast --data_dir $DD --images 8 \
      -- -1 0 5 10 13 15 16 17 25 26 34 35 36 37 40 44
  echo "=== group 2: fast16-only candidates ==="
  python tools/validate_numerics.py --modes fast16 --data_dir $DD --images 8 \
      -- 18 23
  echo "=== group 3: fast+fast16 candidates ==="
  python tools/validate_numerics.py --modes fast,fast16 --data_dir $DD --images 8 \
      -- 2 9 12 20 30
  echo "=== DONE ==="
} >> $LOG 2>&1
