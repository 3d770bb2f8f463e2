#!/usr/bin/env bash
# Round-3c measurement session: one-hot MXU warp on real TPU + composed-mode
# completion. Run detached:
#   setsid nohup bash tools/run_r3c_perf_session.sh > /tmp/perf_r3c.log 2>&1 &
#   echo $! > /tmp/perf_r3c.pid
set -u
cd "$(dirname "$0")/.."

log() { echo "##### $* $(date +%H:%M:%S)"; }

# 1) warp-variant A/B (onehot rows now lower on TPU: block-spec + precision fix)
log WARP variant bench
timeout 2400 python tools/bench_warp.py || echo "FAILED rc=$?"

# 2) DFF per-stage profile with the one-hot warp + fused scale epilogue
log PROFILE dff onehot fused-scale
timeout 2400 python tools/profile_group_step.py --config dff \
  --set warp_dtype=native --set warp_gather=onehot || echo "FAILED rc=$?"

# 3) mIoU-neutrality of the onehot+fused-scale lowering (bf16 tap weights)
#    vs the battery's recorded dff row (84.53 @ most-warped offset)
log NEUTRALITY dff onehot
timeout 1800 python experiments/test.py \
    --cfg experiments/cfgs/extreme_synth_dff.yaml --offsets 0 \
    --set-network warp_dtype=native --set-network warp_gather=onehot \
    || echo "FAILED rc=$?"

# 4) composed-mode k=10 crossover (cut off last session; incremental 60.5 /
#    direct 77.6 are the recorded comparators)
log COMPOSED k=10 crossover
timeout 1800 python experiments/test.py \
    --cfg experiments/cfgs/extreme_synth_accel18_clip.yaml \
    --interval 10 --offsets 1 --propagate composed || echo "FAILED rc=$?"

# 5) composed-mode group-step cost on the bench shape (eval-speed side)
log PROFILE accel18 composed
timeout 2400 python tools/profile_group_step.py --config accel18 \
  || echo "FAILED rc=$?"

# 6) headline bench preview with current defaults (BENCH_r03 dress rehearsal)
log BENCH preview
timeout 3600 python bench.py || echo "FAILED rc=$?"

log r3c done
