#!/bin/bash
# Round-5 device-job queue: runs serially after the gate re-measurement
# (tools/remeasure_gate_r5.sh) completes, keeping the single chip busy
# without contention. Each job appends to its own log under /tmp.
#
# v2: 02_NLFFC's admissible faster tier is fast16 (fast passed the mean
# gate but FAILED the worst-image bound: -0.0150 dB on one surrogate;
# fast16 measured +0.0001 mean / +0.0002 worst) — so the fori sustained
# rows and the tiler probe's tier arm are fast16, not fast.
set -u
cd /root/repo

# wait for the remeasure job to finish (marker line in its log)
while ! grep -q "=== DONE ===" /tmp/remeasure_r5.log 2>/dev/null; do
  sleep 60
done

{
  echo "=== job 1: NLFFC tiler probe (true shape, ceiling + tier arms) ==="
  timeout 7200 python tools/bench_nlffc_tiler.py --iters 5 --modes high fast16

  echo "=== job 2: NLFFC fast16 fori sustained rows (256, batch 1 + 2) ==="
  timeout 2400 python tools/sweep_zoo_sustained.py --mode fast16 --method fori \
      --out results/protocol/zoo_sustained_fast16_fori_r5.json 2
  timeout 2400 python tools/sweep_zoo_sustained.py --mode fast16 --method fori \
      --batch 2 \
      --out results/protocol/zoo_sustained_fast16_fori_b2_r5.json 2

  echo "=== job 3: full-zoo roofline at shipped operating points ==="
  timeout 14400 python tools/roofline_report.py --ids \
      -1 0 1 2 3 4 5 6 8 9 10 11 12 13 14 15 16 17 18 19 20 22 23 24 25 26 \
      27 28 29 30 31 33 34 35 36 37 38 39 40 42 43 44 \
      --out results/protocol/roofline_r5.json

  echo "=== job 4: full-zoo TPU protocol with SSIM + SR save (bit-exact) ==="
  rm -rf /tmp/tpu_protocol_sr
  timeout 21600 python tools/run_tpu_protocol.py \
      --data_dir /tmp/div2k_surrogate \
      --out results/protocol/tpu_protocol_r5.json \
      --save_dir /tmp/tpu_protocol_sr --ssim

  echo "=== QUEUE DONE ==="
} >> /tmp/device_queue_r5.log 2>&1
