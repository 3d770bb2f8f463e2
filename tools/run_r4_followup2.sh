#!/bin/bash
# Round-4 follow-up PART 2 — training arms (run after the perf session):
#   setsid nohup bash tools/run_r4_followup2.sh > /tmp/r4_followup2.log 2>&1 &
#
#  (a) clip objective TRAINED through scale_cascade=last (train/eval-
#      consistent semantics for the shipped default);
#  (b) budget-scaled 90-epoch pair arms for the failure-set Accel-vs-DFF
#      rung (the 30-epoch battery left the Accel pair arm at loss 1.27
#      still descending while DFF converged to 0.58).
set -u
cd "$(dirname "$0")/.."

ev () {
  local cfg=$1; shift
  echo "=== EVAL $cfg $* $(date +%H:%M:%S) ==="
  timeout 3600 python experiments/test.py --cfg experiments/cfgs/$cfg.yaml \
      "$@" || echo "EVAL $cfg $* FAILED rc=$?"
}

# (a) clip objective trained through scale_cascade=last
if [ ! -d /tmp/accel_extreme_out/extreme_synth_accel18_clip_last/leftImg8bit_train/ext_accel18_clip_last/29 ]; then
  echo "=== TRAIN extreme_synth_accel18_clip_last $(date +%H:%M:%S) ==="
  timeout 5400 python experiments/train.py \
      --cfg experiments/cfgs/extreme_synth_accel18_clip_last.yaml \
      --frequent 50 || echo "TRAIN clip_last FAILED rc=$?"
fi
# native semantics (cfg ships scale_cascade=last) at k=5 and k=10
ev extreme_synth_accel18_clip_last --propagate incremental --offset-sweep
ev extreme_synth_accel18_clip_last --interval 10 --ann-offsets 8 \
   --propagate incremental
ev extreme_synth_accel18_clip_last --propagate direct --ann-offsets 3,4

# (b) budget-scaled Accel-vs-DFF rung (VERDICT r3 weak #4)
for arm in failure_synth_accel18_e90 failure_synth_dff_e90; do
  echo "=== TRAIN $arm $(date +%H:%M:%S) ==="
  timeout 5400 python experiments/train.py --cfg experiments/cfgs/$arm.yaml \
      --frequent 50 || echo "TRAIN $arm FAILED rc=$?"
done
ev failure_synth_accel18_e90 --offset-sweep
ev failure_synth_dff_e90 --offset-sweep
ev failure_synth_accel18_e90 --interval 10 --ann-offsets 8
ev failure_synth_dff_e90 --interval 10 --ann-offsets 8
ev failure_synth_accel18_e90 --ann-offsets 4
ev failure_synth_dff_e90 --ann-offsets 4

echo "=== r4 followup part 2 done $(date +%H:%M:%S) ==="
