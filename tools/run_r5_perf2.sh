#!/bin/bash
# Round-5 perf session 2 — the warp_gain_fold in-program A/B (standing
# policy: isolated wins don't count) + mIoU-neutrality + final bench.
# Waits for battery 2 to release the chip.
#   setsid nohup bash tools/run_r5_perf2.sh > /tmp/r5_perf2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

for _ in $(seq 1 1440); do
  grep -q "r5 battery 2 done" /tmp/r5_battery2.log 2>/dev/null && break
  sleep 30
done
echo "=== battery 2 done; perf 2 starts $(date +%H:%M:%S) ==="

echo "=== DFF serving profile + warp_gain_fold A/B $(date +%H:%M:%S) ==="
timeout 3600 python -u tools/profile_group_step.py --config dff \
    --set warp_dtype=native --set warp_gather=onehot --set warp_max_disp=4 \
    --set warp_gain_fold=true || echo "PROFILE gainfold FAILED rc=$?"

echo "=== gain-fold mIoU neutrality (extreme DFF ckpt; expect 84.54) $(date +%H:%M:%S) ==="
timeout 3600 python experiments/test.py \
    --cfg experiments/cfgs/extreme_synth_dff.yaml --ann-offsets 4 \
    --set-network warp_dtype=native --set-network warp_gather=onehot \
    --set-network warp_max_disp=4 --set-network warp_gain_fold=true \
    || echo "EVAL gainfold FAILED rc=$?"

echo "=== final bench $(date +%H:%M:%S) ==="
timeout 5400 python -u bench.py || echo "BENCH FAILED rc=$?"
echo "=== r5 perf 2 done $(date +%H:%M:%S) ==="
