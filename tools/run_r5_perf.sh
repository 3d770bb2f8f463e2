#!/bin/bash
# Round-5 perf session (VERDICT r4 #2 + #3): waits for the r5 battery to
# release the chip, then runs
#   1. the aligned DFF serving profile WITH the new warp-stage
#      decomposition rows (splits the r4 7.34 ms stage into kernel /
#      norm / harness-artifact / residual),
#   2. per-layer rooflines for key101 / fast_update / faithful_update
#      (r3 #4, carried over twice — last chance),
#   3. the two bounded fast-preset conv-level attempts
#      (fold_update_downscale, s2d stem) as in-program A/Bs,
#   4. the per-class DFF-control eval completing the matched-recipe
#      table, and a full bench.
# Run detached:
#   setsid nohup bash tools/run_r5_perf.sh > /tmp/r5_perf.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

# wait (up to 6h) for the battery to finish so the chip is free
for _ in $(seq 1 720); do
  grep -q "r5 battery done" /tmp/r5_battery.log 2>/dev/null && break
  sleep 30
done
echo "=== battery done; perf session starts $(date +%H:%M:%S) ==="

echo "=== aligned DFF serving profile + warp decomposition $(date +%H:%M:%S) ==="
timeout 3600 python -u tools/profile_group_step.py --config dff \
    --set warp_dtype=native --set warp_gather=onehot --set warp_max_disp=4 \
    || echo "PROFILE dff FAILED rc=$?"

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

echo "=== per-class IU: DFF control at far offset (failure) $(date +%H:%M:%S) ==="
timeout 3600 python experiments/test.py \
    --cfg experiments/cfgs/failure_synth_dff_clip_direct.yaml \
    --propagate direct --ann-offsets 4 || echo "EVAL perclass FAILED rc=$?"

echo "=== full bench $(date +%H:%M:%S) ==="
timeout 5400 python -u bench.py || echo "BENCH FAILED rc=$?"
echo "=== r5 perf session done $(date +%H:%M:%S) ==="
