#!/bin/bash
# Round-4 battery follow-up: the scale_cascade='last' decision arms.
# Run detached AFTER run_r4_battery.sh finishes (single chip):
#   setsid nohup bash tools/run_r4_followup.sh > /tmp/r4_followup.log 2>&1 &
#
# Motivation (battery arm-1 rows): on the product-cascade-trained extreme
# clip checkpoint, eval-time scale_cascade=last scores 81.96/81.21 at
# annotated offsets 3/4 — beating BOTH direct (80.79/80.33) and
# product-incremental (78.80/76.33). This follow-up (a) trains the clip
# objective THROUGH the last semantics so the shipped default can carry
# one semantics end-to-end, (b) fills the full offset curves for the
# eval-time intervention, (c) checks the intervention on the failure-set
# clip arm.
set -u
cd "$(dirname "$0")/.."

ev () {
  local cfg=$1; shift
  echo "=== EVAL $cfg $* $(date +%H:%M:%S) ==="
  timeout 3600 python experiments/test.py --cfg experiments/cfgs/$cfg.yaml \
      "$@" || echo "EVAL $cfg $* FAILED rc=$?"
}

# (b) full k=5 offset curve of the eval-time intervention on the
# product-trained checkpoint (rows 3/4 already measured: 81.96/81.21)
ev extreme_synth_accel18_clip --propagate incremental \
   --set-network scale_cascade=last --offset-sweep

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

# (c) the intervention on the failure-set clip arm (trained by the main
# battery's arm 5)
ev failure_synth_accel18_clip --propagate incremental \
   --set-network scale_cascade=last --ann-offsets 3,4
ev failure_synth_accel18_clip --interval 10 --ann-offsets 8 \
   --propagate incremental --set-network scale_cascade=last

# composed + last: with 'last' the composed mode's scale-field warps
# vanish (only the 2-ch flow composition cascades) while keeping the
# single propagated-tensor resample — direct's sharpness at incremental's
# tracked displacement with the winning modulation semantics
ev extreme_synth_accel18_clip --propagate composed \
   --set-network scale_cascade=last --ann-offsets 3,4
ev extreme_synth_accel18_clip --interval 10 --ann-offsets 8 \
   --propagate composed --set-network scale_cascade=last

# per-class IU at the far offset (single-offset evals print the per-class
# table): does fusion's win/loss vs DFF localize to the flow-failure
# classes (pole=6 / traffic-sign=7 thin structures, blurred fast movers)?
ev failure_synth_dff --ann-offsets 4
ev failure_synth_accel18 --ann-offsets 4
ev failure_synth_accel18_clip --propagate incremental --ann-offsets 4

# budget-scaled Accel-vs-DFF rung (VERDICT r3 weak #4): the 30-epoch
# battery left the Accel pair arm at loss 1.27 still descending while DFF
# converged to 0.58 — re-train both sides at 90 epochs and re-read the
# comparison at the far offset and k=10
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

echo "=== r4 followup done $(date +%H:%M:%S) ==="
