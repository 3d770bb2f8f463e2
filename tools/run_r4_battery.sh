#!/bin/bash
# Round-4 accuracy battery (VERDICT r3 #2 + #3). Run detached on TPU:
#   setsid nohup bash tools/run_r4_battery.sh > /tmp/r4_battery.log 2>&1 &
#
# Two questions, one battery:
#  A. scale-cascade compounding + the propagation default (VERDICT #2):
#     retrain the extreme clip arm (checkpoints were in /tmp, wiped),
#     eval the cascade interventions (scale_cascade=mean1/clamp/last) in
#     incremental mode vs direct at k=5 AND k=10, and A/B a clip arm
#     TRAINED through direct; repeat the decision rows on the hard set.
#  B. flow-failure Accel-vs-DFF (VERDICT #3): new 'failure' generator
#     style (non-rigid, motion blur, thin structures, disocclusion
#     appearance change); DFF(pair) vs Accel-18(pair) vs Accel-18(clip)
#     at k=5 and k=10.
#
# Offset semantics: every row below uses --ann-offsets (the ANNOTATED
# offset after the keyframe — the quantity the results tables report).
# The first launch of this battery used --offsets with annotated values,
# which test.py interprets as KEY offsets (ann = k-1-key): at k=5,
# "--offsets 3,4" measured annotated offsets 1 and 0 — the rows where
# incremental/direct/cascade-interventions trivially agree. Third
# occurrence of this footgun (r3 max_disp sweep, r3 battery), hence the
# new flag.
#
# Each arm trains then IMMEDIATELY evals, so partial progress yields
# complete rows. Arm order is scientific priority. Training is skipped
# when the arm's final-epoch checkpoint (epoch 29) already exists.
set -u
cd "$(dirname "$0")/.."

gen () {  # gen <dir> <style>
  if [ ! -d "$1/cityscapes/leftImg8bit/val" ]; then
    python tools/make_synthetic_dataset.py --out "$1" --style "$2" \
        --snippets 48 --splits train
    python tools/make_synthetic_dataset.py --out "$1" --style "$2" \
        --snippets 16 --seed 100 --splits val
  fi
}
gen /tmp/cs_extreme extreme
gen /tmp/cs_failure failure
gen /tmp/cs_hard hard

train_one () {  # train_one <cfg> <ckpt_dir_for_skip>
  if [ -d "$2/29" ]; then
    echo "=== TRAIN $1 SKIPPED (checkpoint epoch 29 exists) ==="
    return 0
  fi
  echo "=== TRAIN $1 $(date +%H:%M:%S) ==="
  timeout 5400 python experiments/train.py --cfg experiments/cfgs/$1.yaml \
      --frequent 50 || echo "TRAIN $1 FAILED rc=$?"
}

ev () {  # ev <cfg> [extra args...]
  local cfg=$1; shift
  echo "=== EVAL $cfg $* $(date +%H:%M:%S) ==="
  timeout 3600 python experiments/test.py --cfg experiments/cfgs/$cfg.yaml \
      "$@" || echo "EVAL $cfg $* FAILED rc=$?"
}

# ---- arm 1: extreme clip arm (retrain) + every cascade/propagation row
train_one extreme_synth_accel18_clip \
    /tmp/accel_extreme_out/extreme_synth_accel18_clip/leftImg8bit_train/ext_accel18_clip
C=extreme_synth_accel18_clip
# k=5 baselines (reproduce r3 rows: incremental 78.8/76.3, direct 80.8/80.3
# at annotated offsets 3/4)
ev $C --propagate incremental --ann-offsets 3,4
ev $C --propagate direct --ann-offsets 3,4
# cascade interventions, incremental eval (the attack on finding 7)
for m in mean1 clamp last; do
  ev $C --propagate incremental --set-network scale_cascade=$m --ann-offsets 3,4
done
# k=10 crossover rows (r3: direct 77.6 vs incremental 60.5 at ann offset 8)
ev $C --interval 10 --ann-offsets 8 --propagate incremental
ev $C --interval 10 --ann-offsets 8 --propagate direct
for m in mean1 clamp last; do
  ev $C --interval 10 --ann-offsets 8 --propagate incremental \
     --set-network scale_cascade=$m
done

# ---- arm 2: flow-failure DFF (pair) — the Accel-vs-DFF left side
train_one failure_synth_dff \
    /tmp/accel_failure_out/failure_synth_dff/leftImg8bit_train/fail_dff
ev failure_synth_dff --offset-sweep
ev failure_synth_dff --interval 10 --ann-offsets 8

# ---- arm 3: flow-failure Accel-18 (pair) — the paper's comparison rung
train_one failure_synth_accel18 \
    /tmp/accel_failure_out/failure_synth_accel18/leftImg8bit_train/fail_accel18
ev failure_synth_accel18 --offset-sweep
ev failure_synth_accel18 --interval 10 --ann-offsets 8

# ---- arm 5: flow-failure Accel-18 (clip, flagship recipe)
train_one failure_synth_accel18_clip \
    /tmp/accel_failure_out/failure_synth_accel18_clip/leftImg8bit_train/fail_accel18_clip
ev failure_synth_accel18_clip --propagate incremental --offset-sweep
ev failure_synth_accel18_clip --propagate direct --ann-offsets 3,4
ev failure_synth_accel18_clip --interval 10 --ann-offsets 8 --propagate direct
ev failure_synth_accel18_clip --interval 10 --ann-offsets 8 --propagate incremental

# ---- arm 6: hard-set clip arm (the "both synth sets" decision rows)
train_one hard_synth_accel18_clip \
    /tmp/accel_hard_out/hard_synth_accel18_clip/leftImg8bit_train/hard_accel18_clip
ev hard_synth_accel18_clip --propagate incremental --ann-offsets 3,4
ev hard_synth_accel18_clip --propagate direct --ann-offsets 3,4
ev hard_synth_accel18_clip --interval 10 --ann-offsets 8 --propagate incremental
ev hard_synth_accel18_clip --interval 10 --ann-offsets 8 --propagate direct
for m in mean1 last; do
  ev hard_synth_accel18_clip --propagate incremental \
     --set-network scale_cascade=$m --ann-offsets 4
done
# ---- arm 4: clip objective TRAINED through direct (extreme set)
train_one extreme_synth_accel18_clip_direct \
    /tmp/accel_extreme_out/extreme_synth_accel18_clip_direct/leftImg8bit_train/ext_accel18_clipdir
ev extreme_synth_accel18_clip_direct --propagate direct --ann-offsets 0,3,4
ev extreme_synth_accel18_clip_direct --propagate incremental --ann-offsets 4
ev extreme_synth_accel18_clip_direct --interval 10 --ann-offsets 8 --propagate direct

echo "=== r4 battery done $(date +%H:%M:%S) ==="
