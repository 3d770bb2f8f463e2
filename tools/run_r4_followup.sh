#!/bin/bash
# Round-4 battery follow-up PART 1 — the propagation-default decision.
#   setsid nohup bash tools/run_r4_followup.sh > /tmp/r4_followup.log 2>&1 &
# PART 2 (trained-through-last arm, budget-scaled e90 pair rung) is
# tools/run_r4_followup2.sh.
#
# Battery verdicts feeding this session:
#  - eval-time scale_cascade=last beats product AND direct on the
#    incremental-trained clip checkpoints on all three sets;
#  - arm 4 (clip objective TRAINED THROUGH DIRECT, extreme set) beats
#    every incremental-trained row: 76.63/84.45/84.36 at offsets 0/3/4
#    and 84.47 at k=10 off 8 (vs 74.8/81.96/81.21/79.36 for
#    incremental+last) — training through multi-gap direct warps teaches
#    FlowNet gap-scaled flow, overturning the r3 "FlowNet compresses
#    multi-frame displacement" finding (that model was never TRAINED on
#    gaps). The remaining question: does trained-direct also win on the
#    small-motion hard set (where incremental-product led direct 86.77 vs
#    84.79) and the failure set? These two arms decide the flagship
#    default.
set -u
cd "$(dirname "$0")/.."

ev () {
  local cfg=$1; shift
  echo "=== EVAL $cfg $* $(date +%H:%M:%S) ==="
  timeout 3600 python experiments/test.py --cfg experiments/cfgs/$cfg.yaml \
      "$@" || echo "EVAL $cfg $* FAILED rc=$?"
}

train_one () {  # train_one <cfg> <ckpt_dir_for_skip>
  if [ -d "$2/29" ]; then
    echo "=== TRAIN $1 SKIPPED (checkpoint epoch 29 exists) ==="
    return 0
  fi
  echo "=== TRAIN $1 $(date +%H:%M:%S) ==="
  timeout 5400 python experiments/train.py --cfg experiments/cfgs/$1.yaml \
      --frequent 50 || echo "TRAIN $1 FAILED rc=$?"
}

# ---- decision arms: clip-through-direct on hard and failure sets
train_one hard_synth_accel18_clip_direct \
    /tmp/accel_hard_out/hard_synth_accel18_clip_direct/leftImg8bit_train/hard_accel18_clipdir
ev hard_synth_accel18_clip_direct --propagate direct --ann-offsets 0,3,4
ev hard_synth_accel18_clip_direct --interval 10 --ann-offsets 8 \
   --propagate direct

train_one failure_synth_accel18_clip_direct \
    /tmp/accel_failure_out/failure_synth_accel18_clip_direct/leftImg8bit_train/failure_accel18_clipdir
ev failure_synth_accel18_clip_direct --propagate direct --ann-offsets 0,3,4
ev failure_synth_accel18_clip_direct --interval 10 --ann-offsets 8 \
   --propagate direct

# ---- the 'last' rows completing the intervention tables
# hard-set k=10 under 'last' (battery: product 76.81 / direct 79.73)
ev hard_synth_accel18_clip --interval 10 --ann-offsets 8 \
   --propagate incremental --set-network scale_cascade=last
# failure-set clip arm under 'last' (product collapsed to 51.28 at k=10)
ev failure_synth_accel18_clip --propagate incremental \
   --set-network scale_cascade=last --ann-offsets 3,4
ev failure_synth_accel18_clip --interval 10 --ann-offsets 8 \
   --propagate incremental --set-network scale_cascade=last
# full k=5 offset curve of 'last' on the extreme incremental-trained ckpt
ev extreme_synth_accel18_clip --propagate incremental \
   --set-network scale_cascade=last --offset-sweep

# composed + last (with 'last' the composed mode's scale-field warps
# vanish; single resample at tracked displacement)
ev extreme_synth_accel18_clip --propagate composed \
   --set-network scale_cascade=last --ann-offsets 3,4
ev extreme_synth_accel18_clip --interval 10 --ann-offsets 8 \
   --propagate composed --set-network scale_cascade=last

# per-class IU at the far offset: does the Accel-vs-DFF gap localize to
# the flow-failure classes (pole=6 / traffic-sign=7, blurred movers)?
ev failure_synth_dff --ann-offsets 4
ev failure_synth_accel18 --ann-offsets 4
ev failure_synth_accel18_clip --propagate incremental --ann-offsets 4
ev failure_synth_accel18_clip_direct --propagate direct --ann-offsets 4

echo "=== r4 followup part 1 done $(date +%H:%M:%S) ==="
