#!/bin/bash
# Round-5 perf session 3 — the fused Pallas stem (ops/fused_stem.py)
# in-program A/B: the per-layer roofline's worst layer (stem at 1.6-5.6%
# of bound from C=3 lane padding) attacked with a dense-lane fused
# conv7+affine+relu kernel. Standing policy: in-program numbers decide.
# Waits for perf 2 to release the chip.
#   setsid nohup bash tools/run_r5_perf3.sh > /tmp/r5_perf3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

for _ in $(seq 1 1440); do
  grep -q "r5 perf 2 done" /tmp/r5_perf2.log 2>/dev/null && break
  sleep 30
done
echo "=== perf2 done; perf 3 starts $(date +%H:%M:%S) ==="

echo "=== DFF serving profile + fused7 stem $(date +%H:%M:%S) ==="
timeout 3600 python -u tools/profile_group_step.py --config dff \
    --set warp_dtype=native --set warp_gather=onehot --set warp_max_disp=4 \
    --set stem=fused7 || echo "PROFILE dff-fused7 FAILED rc=$?"

echo "=== fast + fused7 stem $(date +%H:%M:%S) ==="
timeout 3600 python -u tools/profile_group_step.py --config accel18_fast \
    --set stem=fused7 || echo "PROFILE fast-fused7 FAILED rc=$?"

echo "=== accel18 + fused7 stem $(date +%H:%M:%S) ==="
timeout 3600 python -u tools/profile_group_step.py --config accel18 \
    --set stem=fused7 || echo "PROFILE accel18-fused7 FAILED rc=$?"

echo "=== r5 perf 3 done $(date +%H:%M:%S) ==="
