#!/bin/bash
# EXTREME-motion synthetic battery (VERDICT r2 #3). Run detached on TPU:
#   setsid nohup bash tools/run_extreme_battery.sh > /tmp/extreme_battery.log 2>&1 &
#
# Each arm is trained and IMMEDIATELY evaluated (offset sweep), so partial
# progress yields complete ladder rows. Arm order is scientific priority:
#  1. accel18 (pair)  — flagship pair arm; also feeds the max_disp knee sweep
#  2. dff             — the Accel-vs-DFF ordering (the paper's central claim)
#  3. accel18_clip    — incremental-vs-direct cross-check at large motion
#  4. accel18_fast    — the throughput preset under propagation stress
#  5. 34/50/101       — ladder completion (cheapest-last; skippable)
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

# ---- arm 1: flagship pair arm + the warp max_disp knee sweep
train_one extreme_synth_accel18
eval_sweep extreme_synth_accel18
# max_disp knee at the largest displacement (offset 4 via the sweep above
# used the model default); sweep 4/8/16 at offset 4 where the clamp bites
for d in 4 8 16; do
  echo "=== MAXDISP $d $(date +%H:%M:%S) ==="
  timeout 1800 python experiments/test.py \
      --cfg experiments/cfgs/extreme_synth_accel18.yaml \
      --offsets 4 --warp-max-disp $d || echo "MAXDISP $d FAILED"
done

# ---- arm 2: DFF (does Accel > DFF emerge once propagation is lossy?)
train_one extreme_synth_dff
eval_sweep extreme_synth_dff

# ---- arm 3: clip objective; incremental vs direct at large motion
train_one extreme_synth_accel18_clip
eval_sweep extreme_synth_accel18_clip --propagate incremental
eval_sweep extreme_synth_accel18_clip --propagate direct

# ---- arm 4: fast preset
train_one extreme_synth_accel18_fast
eval_sweep extreme_synth_accel18_fast

# ---- arms 5-7: backbone ladder completion
for cfg in extreme_synth_accel34 extreme_synth_accel50 extreme_synth_accel101; do
  train_one $cfg
  eval_sweep $cfg
done
echo "=== battery done $(date +%H:%M:%S) ==="
