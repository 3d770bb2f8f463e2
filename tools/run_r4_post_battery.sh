#!/bin/bash
# Round-4 post-battery TPU session: per-layer rooflines (VERDICT r3 #4),
# the bounded fast-preset conv-level attempts, the aligned DFF warp-stage
# row, and a full bench. Run detached AFTER the battery:
#   setsid nohup bash tools/run_r4_post_battery.sh > /tmp/r4_post.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "=== per-layer roofline: fast update branch $(date +%H:%M:%S) ==="
timeout 3600 python -u tools/profile_layers.py --branch fast_update \
    || echo "LAYERS fast_update FAILED rc=$?"
echo "=== per-layer roofline: key R101 branch $(date +%H:%M:%S) ==="
timeout 3600 python -u tools/profile_layers.py --branch key101 \
    || echo "LAYERS key101 FAILED rc=$?"
echo "=== per-layer roofline: faithful update branch $(date +%H:%M:%S) ==="
timeout 3600 python -u tools/profile_layers.py --branch faithful_update \
    || echo "LAYERS faithful_update FAILED rc=$?"

echo "=== fast composite baseline (clean) $(date +%H:%M:%S) ==="
timeout 3600 python -u tools/profile_group_step.py --config accel18_fast \
    || echo "PROFILE fast FAILED rc=$?"
echo "=== fast attempt A: fold_update_downscale $(date +%H:%M:%S) ==="
timeout 3600 python -u tools/profile_group_step.py --config accel18_fast \
    --set fold_update_downscale=true || echo "PROFILE fastA FAILED rc=$?"
echo "=== fast attempt B: s2d stems $(date +%H:%M:%S) ==="
timeout 3600 python -u tools/profile_group_step.py --config accel18_fast \
    --set stem=s2d || echo "PROFILE fastB FAILED rc=$?"

echo "=== aligned DFF warp-stage row $(date +%H:%M:%S) ==="
timeout 3600 python -u tools/profile_group_step.py --config dff \
    --set warp_dtype=native --set warp_gather=onehot --set warp_max_disp=4 \
    || echo "PROFILE dff FAILED rc=$?"

echo "=== full bench $(date +%H:%M:%S) ==="
timeout 5400 python -u bench.py || echo "BENCH FAILED rc=$?"
echo "=== r4 post-battery done $(date +%H:%M:%S) ==="
