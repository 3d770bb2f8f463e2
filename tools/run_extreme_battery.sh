#!/bin/bash
# EXTREME-motion synthetic battery (VERDICT r2 #3). Run detached on TPU:
#   setsid nohup bash tools/run_extreme_battery.sh > /tmp/extreme_battery.log 2>&1 &
#
# Phases:
#  1. generate the extreme dataset (8-24 px/frame motion, fast occluders)
#  2. train the family ladder + clip arm on it
#  3. eval: k=5 offset sweep per arm; warp max_disp knee sweep (4/8/16) on
#     the accel arms; propagate-mode cross-check on the pair arm
set -u
cd "$(dirname "$0")/.."

DATA=/tmp/cs_extreme
OUT=/tmp/accel_extreme_out
mkdir -p "$OUT"

if [ ! -d "$DATA/cityscapes/leftImg8bit/val" ]; then
  python tools/make_synthetic_dataset.py --out $DATA --style extreme \
      --snippets 48 --splits train
  python tools/make_synthetic_dataset.py --out $DATA --style extreme \
      --snippets 16 --seed 100 --splits val
fi

train_one () {
  local cfg=$1
  echo "=== TRAIN $cfg $(date +%H:%M:%S) ==="
  timeout 5400 python experiments/train.py --cfg experiments/cfgs/$cfg.yaml \
      --frequent 50 || echo "TRAIN $cfg FAILED rc=$?"
}

eval_sweep () {
  local cfg=$1; shift
  echo "=== EVAL $cfg $* $(date +%H:%M:%S) ==="
  timeout 3600 python experiments/test.py --cfg experiments/cfgs/$cfg.yaml \
      --offset-sweep "$@" || echo "EVAL $cfg FAILED rc=$?"
}

# ---- phase 2: training (cheap arms first so partial progress is useful)
for cfg in extreme_synth_accel18 extreme_synth_dff extreme_synth_accel18_clip \
           extreme_synth_accel18_fast extreme_synth_accel34 \
           extreme_synth_accel50 extreme_synth_accel101; do
  train_one $cfg
done

# ---- phase 3: evals
# family ladder offset curves (k=5, offsets 0..4)
for cfg in extreme_synth_accel18 extreme_synth_dff extreme_synth_accel18_fast \
           extreme_synth_accel34 extreme_synth_accel50 extreme_synth_accel101; do
  eval_sweep $cfg
done
# clip arm under its own (incremental) semantics
eval_sweep extreme_synth_accel18_clip --propagate incremental
# propagation cross-checks at large motion: does incremental beat direct
# once per-step displacement is small but total displacement is large?
eval_sweep extreme_synth_accel18_clip --propagate direct
# warp max_disp knee (offset-4 is the largest displacement): 4 / 8 / 16
for d in 4 8 16; do
  echo "=== MAXDISP $d ==="
  timeout 1800 python experiments/test.py \
      --cfg experiments/cfgs/extreme_synth_accel18.yaml \
      --offsets 0 --warp-max-disp $d || echo "MAXDISP $d FAILED"
done
echo "=== battery done $(date +%H:%M:%S) ==="
