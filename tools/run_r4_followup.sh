#!/bin/bash
# Round-4 battery follow-up PART 1 — decision-critical EVAL rows only
# (no training; ~1h). Run detached AFTER run_r4_battery.sh finishes:
#   setsid nohup bash tools/run_r4_followup.sh > /tmp/r4_followup.log 2>&1 &
# PART 2 (training arms: clip-through-last, budget-scaled e90 pair rung)
# is tools/run_r4_followup2.sh, run after the perf session if time allows.
#
# Motivation (battery rows): on the product-cascade-trained clip
# checkpoints, eval-time scale_cascade=last is measured-best at the far
# offsets on ALL THREE synth sets — extreme 81.96/81.21 (vs direct
# 80.79/80.33, product 78.80/76.33), hard 86.98 (vs 86.77/84.79),
# extreme k=10 79.36 (vs 77.62/60.54).
set -u
cd "$(dirname "$0")/.."

ev () {
  local cfg=$1; shift
  echo "=== EVAL $cfg $* $(date +%H:%M:%S) ==="
  timeout 3600 python experiments/test.py --cfg experiments/cfgs/$cfg.yaml \
      "$@" || echo "EVAL $cfg $* FAILED rc=$?"
}

# hard-set k=10 under 'last' (battery: product 76.81 / direct 79.73)
ev hard_synth_accel18_clip --interval 10 --ann-offsets 8 \
   --propagate incremental --set-network scale_cascade=last

# the intervention on the failure-set clip arm (battery arm 5 ckpt;
# product collapsed to 51.28 at k=10 there)
ev failure_synth_accel18_clip --propagate incremental \
   --set-network scale_cascade=last --ann-offsets 3,4
ev failure_synth_accel18_clip --interval 10 --ann-offsets 8 \
   --propagate incremental --set-network scale_cascade=last

# full k=5 offset curve of the eval-time intervention on the
# product-trained extreme checkpoint (rows 3/4 measured: 81.96/81.21)
ev extreme_synth_accel18_clip --propagate incremental \
   --set-network scale_cascade=last --offset-sweep

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

echo "=== r4 followup part 1 done $(date +%H:%M:%S) ==="
