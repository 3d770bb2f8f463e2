#!/bin/bash
# Round-5 battery 2 — the clip-through-(incremental+'last') recipe grid.
# Trigger: the extreme-set clip-last arm (battery 1 arm 3) measured
# 87.45 at k=5 off 4 and 87.38 at k=10, beating the shipped
# clip-through-direct default (84.36/84.47) by ~3 points — reopening the
# flagship-recipe decision. These arms complete the (architecture x
# recipe x set) grid: Accel clip-last on failure/hard, DFF clip-last on
# failure/extreme. Waits for the perf session to release the chip.
#   setsid nohup bash tools/run_r5_battery2.sh > /tmp/r5_battery2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

for _ in $(seq 1 960); do
  grep -q "r5 perf session done" /tmp/r5_perf.log 2>/dev/null && break
  sleep 30
done
echo "=== perf done; battery 2 starts $(date +%H:%M:%S) ==="

ev () {
  local cfg=$1; shift
  echo "=== EVAL $cfg $* $(date +%H:%M:%S) ==="
  timeout 3600 python experiments/test.py --cfg experiments/cfgs/$cfg.yaml \
      "$@" || echo "EVAL $cfg $* FAILED rc=$?"
}

train_one () {  # train_one <cfg> <ckpt_dir>
  if [ -d "$2/29" ]; then
    echo "=== TRAIN $1 SKIPPED (checkpoint exists) ==="
    return 0
  fi
  echo "=== TRAIN $1 $(date +%H:%M:%S) ==="
  timeout 7200 python experiments/train.py --cfg experiments/cfgs/$1.yaml \
      --frequent 50 || echo "TRAIN $1 FAILED rc=$?"
}

# decision-critical first: Accel clip-last on the failure set (the set
# where fusion has its only matched-recipe win)
train_one failure_synth_accel18_clip_last \
    /tmp/accel_failure_out/failure_synth_accel18_clip_last/leftImg8bit_train/fail_accel18_clip_last
ev failure_synth_accel18_clip_last --propagate incremental --offset-sweep
ev failure_synth_accel18_clip_last --interval 10 --ann-offsets 8 \
   --propagate incremental

# the DFF twin on failure (matched recipe for both architectures)
train_one failure_synth_dff_clip_last \
    /tmp/accel_failure_out/failure_synth_dff_clip_last/leftImg8bit_train/fail_dff_clip_last
ev failure_synth_dff_clip_last --propagate incremental --offset-sweep
ev failure_synth_dff_clip_last --interval 10 --ann-offsets 8 \
   --propagate incremental

# DFF clip-last on extreme (completes the extreme-set grid)
train_one extreme_synth_dff_clip_last \
    /tmp/accel_extreme_out/extreme_synth_dff_clip_last/leftImg8bit_train/ext_dff_clip_last
ev extreme_synth_dff_clip_last --propagate incremental --offset-sweep
ev extreme_synth_dff_clip_last --interval 10 --ann-offsets 8 \
   --propagate incremental

# Accel clip-last on hard (the small-motion set)
train_one hard_synth_accel18_clip_last \
    /tmp/accel_hard_out/hard_synth_accel18_clip_last/leftImg8bit_train/hard_accel18_clip_last
ev hard_synth_accel18_clip_last --propagate incremental --offset-sweep
ev hard_synth_accel18_clip_last --interval 10 --ann-offsets 8 \
   --propagate incremental

echo "=== r5 battery 2 done $(date +%H:%M:%S) ==="
