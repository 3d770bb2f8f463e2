#!/bin/bash
# Reproduce the flagship-recipe decision tables from a cold start
# (VERDICT r4 #5): one command a future session can run to regenerate
# the rows behind the shipped default (clip objective trained THROUGH
# direct propagation — config/defaults.py `propagate`).
#
#   bash tools/reproduce_flagship.sh [hard|extreme|failure ...]
#
# For each requested set (default: all three): generate the synthetic
# data if absent, train the Accel-18 clip-through-direct arm and the
# matched-recipe DFF control if their final checkpoints are absent, then
# evaluate the full k=5 offset curve and the k=10 off-8 cell via
# experiments/test.py. Expected numbers: BASELINE.md "Hard-set decision
# rows" / "The matched-recipe DFF control". Training both arms of one
# set takes ~25-35 min on a v5e chip; evals ~10 min.
set -u
cd "$(dirname "$0")/.."

ev () {
  local cfg=$1; shift
  echo "=== EVAL $cfg $* $(date +%H:%M:%S) ==="
  timeout 3600 python experiments/test.py --cfg experiments/cfgs/$cfg.yaml \
      "$@" || echo "EVAL $cfg $* FAILED rc=$?"
}

train_if_absent () {  # <cfg> <ckpt_dir>
  if [ -d "$2/29" ]; then
    echo "=== TRAIN $1 SKIPPED (checkpoint exists) ==="
    return 0
  fi
  echo "=== TRAIN $1 $(date +%H:%M:%S) ==="
  timeout 7200 python experiments/train.py --cfg experiments/cfgs/$1.yaml \
      --frequent 50 || echo "TRAIN $1 FAILED rc=$?"
}

gen_if_absent () {  # <style>
  if [ ! -d "/tmp/cs_$1/cityscapes" ]; then
    echo "=== GENERATE /tmp/cs_$1 ($1 style) ==="
    python tools/make_synthetic_dataset.py --out /tmp/cs_$1 --style $1 \
        --snippets 48 --splits train
    python tools/make_synthetic_dataset.py --out /tmp/cs_$1 --style $1 \
        --snippets 16 --seed 100 --splits val
  fi
}

declare -A ACCEL_PREFIX=(
  [hard]=/tmp/accel_hard_out/hard_synth_accel18_clip_direct/leftImg8bit_train/hard_accel18_clipdir
  [extreme]=/tmp/accel_extreme_out/extreme_synth_accel18_clip_direct/leftImg8bit_train/ext_accel18_clipdir
  [failure]=/tmp/accel_failure_out/failure_synth_accel18_clip_direct/leftImg8bit_train/failure_accel18_clipdir
)
declare -A DFF_PREFIX=(
  [hard]=/tmp/accel_hard_out/hard_synth_dff_clip_direct/leftImg8bit_train/hard_dff_clipdir
  [extreme]=/tmp/accel_extreme_out/extreme_synth_dff_clip_direct/leftImg8bit_train/ext_dff_clipdir
  [failure]=/tmp/accel_failure_out/failure_synth_dff_clip_direct/leftImg8bit_train/fail_dff_clipdir
)

sets=("$@")
[ ${#sets[@]} -eq 0 ] && sets=(hard extreme failure)

for s in "${sets[@]}"; do
  gen_if_absent "$s"
  train_if_absent "${s}_synth_accel18_clip_direct" "${ACCEL_PREFIX[$s]}"
  train_if_absent "${s}_synth_dff_clip_direct" "${DFF_PREFIX[$s]}"
  ev "${s}_synth_accel18_clip_direct" --propagate direct --offset-sweep
  ev "${s}_synth_accel18_clip_direct" --interval 10 --ann-offsets 8 \
     --propagate direct
  ev "${s}_synth_dff_clip_direct" --propagate direct --offset-sweep
  ev "${s}_synth_dff_clip_direct" --interval 10 --ann-offsets 8 \
     --propagate direct
done

echo "=== flagship reproduction done $(date +%H:%M:%S) ==="
