#!/bin/bash
# Round-5 battery (VERDICT r4 next-round #1): the recipe-controlled DFF
# control arms + the carried-over followup2 arms, ordered most
# decision-critical first. Run detached:
#   setsid nohup bash tools/run_r5_battery.sh > /tmp/r5_battery.log 2>&1 &
#
# The question this battery decides: is "Accel clip-through-direct beats
# pure DFF on the failure set" (83.17 vs 81.41, r4) a property of the
# ARCHITECTURE (corrective fusion — the paper's central claim, SURVEY.md
# §0/§6) or of the RECIPE (multi-gap clip-through-direct training, which
# teaches FlowNet gap-scaled flow and applies equally to DFF)?
set -u
cd "$(dirname "$0")/.."

ev () {
  local cfg=$1; shift
  echo "=== EVAL $cfg $* $(date +%H:%M:%S) ==="
  timeout 3600 python experiments/test.py --cfg experiments/cfgs/$cfg.yaml \
      "$@" || echo "EVAL $cfg $* FAILED rc=$?"
}

train_one () {  # train_one <cfg> <ckpt_dir> <final_epoch_subdir>
  if [ -d "$2/$3" ]; then
    echo "=== TRAIN $1 SKIPPED (checkpoint epoch $3 exists) ==="
    return 0
  fi
  echo "=== TRAIN $1 $(date +%H:%M:%S) ==="
  timeout 14400 python experiments/train.py --cfg experiments/cfgs/$1.yaml \
      --frequent 50 || echo "TRAIN $1 FAILED rc=$?"
}

# ---- 1. THE control arm: DFF clip-through-direct on the failure set
train_one failure_synth_dff_clip_direct \
    /tmp/accel_failure_out/failure_synth_dff_clip_direct/leftImg8bit_train/fail_dff_clipdir 29
ev failure_synth_dff_clip_direct --propagate direct --offset-sweep
ev failure_synth_dff_clip_direct --interval 10 --ann-offsets 8 --propagate direct

# ---- 2. extreme-set leg of the control
train_one extreme_synth_dff_clip_direct \
    /tmp/accel_extreme_out/extreme_synth_dff_clip_direct/leftImg8bit_train/ext_dff_clipdir 29
ev extreme_synth_dff_clip_direct --propagate direct --offset-sweep
ev extreme_synth_dff_clip_direct --interval 10 --ann-offsets 8 --propagate direct

# ---- 3. clip objective trained THROUGH scale_cascade=last (followup2a:
#         train/eval-consistent semantics for the incremental serving recipe)
train_one extreme_synth_accel18_clip_last \
    /tmp/accel_extreme_out/extreme_synth_accel18_clip_last/leftImg8bit_train/ext_accel18_clip_last 29
ev extreme_synth_accel18_clip_last --propagate incremental --offset-sweep
ev extreme_synth_accel18_clip_last --interval 10 --ann-offsets 8 --propagate incremental
ev extreme_synth_accel18_clip_last --propagate direct --ann-offsets 3,4

# ---- 4. budget-scaled 90-epoch pair arms (followup2b: the 30-epoch
#         battery left Accel's pair arm at loss 1.27 still descending)
train_one failure_synth_accel18_e90 \
    /tmp/accel_failure_out/failure_synth_accel18_e90/leftImg8bit_train/fail_accel18_e90 89
train_one failure_synth_dff_e90 \
    /tmp/accel_failure_out/failure_synth_dff_e90/leftImg8bit_train/fail_dff_e90 89
ev failure_synth_accel18_e90 --offset-sweep
ev failure_synth_dff_e90 --offset-sweep
ev failure_synth_accel18_e90 --interval 10 --ann-offsets 8
ev failure_synth_dff_e90 --interval 10 --ann-offsets 8

# ---- 5. hard-set leg of the control
train_one hard_synth_dff_clip_direct \
    /tmp/accel_hard_out/hard_synth_dff_clip_direct/leftImg8bit_train/hard_dff_clipdir 29
ev hard_synth_dff_clip_direct --propagate direct --offset-sweep
ev hard_synth_dff_clip_direct --interval 10 --ann-offsets 8 --propagate direct

# ---- 6. cheap completion evals for the BASELINE.md tables
# hard-set intervention cells still "—": incremental mean1/last at off 3
ev hard_synth_accel18_clip --propagate incremental \
   --set-network scale_cascade=mean1 --ann-offsets 3
ev hard_synth_accel18_clip --propagate incremental \
   --set-network scale_cascade=last --ann-offsets 3
# full k=5 curves of the shipped flagship recipe (have 0,3,4 only)
ev hard_synth_accel18_clip_direct --propagate direct --ann-offsets 1,2
ev extreme_synth_accel18_clip_direct --propagate direct --offset-sweep
ev failure_synth_accel18_clip_direct --propagate direct --ann-offsets 1,2

echo "=== r5 battery done $(date +%H:%M:%S) ==="
