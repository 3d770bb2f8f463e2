#!/bin/bash
# Round-3 TPU perf session (VERDICT r2 #1/#3/#5 measurement batch). Waits
# for the extreme battery (if running) to release the chip, then:
#   1. corrected warp max_disp knee sweep (ann_pos k-1: --offsets 0 is the
#      KEY offset; the battery's --offsets 4 run evaluated the un-warped
#      ann_pos-0 row where max_disp is irrelevant)
#   2. per-stage profiles + lowering A/Bs (warp_dtype/warp_gather, the
#      folded downscale prologues)
#   3. B=8 clip-staging probes (probe_b8 serve/fused arms)
# Run detached:
#   setsid nohup bash tools/run_r3_perf_session.sh > /tmp/perf_r3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

# Wait for the battery: pass its REAL bash PID as $1 (read it from ps, not
# from a pid file — $! across a setsid fork recorded the wrong pid once and
# this session then ran concurrently with the battery). Belt-and-braces:
# also stop waiting once the log prints its done marker.
BATTERY_PID="${1:-}"
if [ -n "$BATTERY_PID" ]; then
  while kill -0 "$BATTERY_PID" 2>/dev/null \
        && ! grep -q "battery done" /tmp/extreme_battery.log 2>/dev/null; do
    sleep 60
  done
fi

log() { echo "##### $* $(date +%H:%M:%S)"; }

log MAXDISP sweep at ann_pos=4
for d in 4 8 16 32; do
  log MAXDISP $d
  timeout 1800 python experiments/test.py \
      --cfg experiments/cfgs/extreme_synth_accel18.yaml \
      --offsets 0 --warp-max-disp $d || echo "MAXDISP $d FAILED rc=$?"
done

log PROFILE dff baseline
timeout 2400 python tools/profile_group_step.py --config dff \
  || echo "FAILED rc=$?"
log PROFILE dff native+stacked
timeout 2400 python tools/profile_group_step.py --config dff \
  --set warp_dtype=native --set warp_gather=stacked || echo "FAILED rc=$?"
log PROFILE dff native+stacked+foldflow
timeout 2400 python tools/profile_group_step.py --config dff \
  --set warp_dtype=native --set warp_gather=stacked \
  --set fold_flow_downscale=true || echo "FAILED rc=$?"
log PROFILE fast clean
timeout 2400 python tools/profile_group_step.py --config accel18_fast \
  || echo "FAILED rc=$?"
log PROFILE fast folded
timeout 2400 python tools/profile_group_step.py --config accel18_fast \
  --set fold_update_downscale=true --set fold_flow_downscale=true \
  || echo "FAILED rc=$?"
log PROFILE accel18 foldflow
timeout 2400 python tools/profile_group_step.py --config accel18 \
  --set fold_flow_downscale=true || echo "FAILED rc=$?"

log PROBE_B8 arms
for arm in serve fused; do
  log PROBE_B8 $arm
  timeout 2400 python tools/probe_b8.py $arm || echo "B8 $arm FAILED rc=$?"
done
log perf session done

# serving-lowering mIoU-neutrality on the fresh extreme checkpoints
# (compare against the battery's recorded rows: dff off4 84.53, accel18
# off4 81.59)
log NEUTRALITY dff tuned
timeout 1800 python experiments/test.py \
    --cfg experiments/cfgs/extreme_synth_dff.yaml --offsets 0 \
    --set-network warp_dtype=native --set-network warp_gather=stacked \
    --set-network fold_flow_downscale=true || echo "FAILED rc=$?"
log NEUTRALITY accel18 tuned
timeout 1800 python experiments/test.py \
    --cfg experiments/cfgs/extreme_synth_accel18.yaml --offsets 0 \
    --set-network fold_flow_downscale=true || echo "FAILED rc=$?"
log NEUTRALITY fast tuned
timeout 1800 python experiments/test.py \
    --cfg experiments/cfgs/extreme_synth_accel18_fast.yaml --offsets 0 \
    --set-network fold_flow_downscale=true \
    --set-network fold_update_downscale=true || echo "FAILED rc=$?"
log neutrality done

# k=10 crossover: direct-vs-incremental at doubled group displacement
# (extreme set covers keyframes to annotated-8 -> ann_pos 8 = key offset 1)
for mode in incremental direct; do
  log KSWEEP clip k=10 $mode
  timeout 1800 python experiments/test.py \
      --cfg experiments/cfgs/extreme_synth_accel18_clip.yaml \
      --interval 10 --offsets 1 --propagate $mode || echo "FAILED rc=$?"
done
# and the max_disp clamp under the k=10 direct displacement
for d in 4 8 16; do
  log KSWEEP maxdisp $d k=10 direct
  timeout 1800 python experiments/test.py \
      --cfg experiments/cfgs/extreme_synth_accel18_clip.yaml \
      --interval 10 --offsets 1 --propagate direct --warp-max-disp $d \
      || echo "FAILED rc=$?"
done
log kweep done

# (appended mid-run) same-session clean accel18 baseline for the foldflow
# A/B (the 03:50 clean run predates the arg-slot fix), with the roofline
# columns added to the profiler
log PROFILE accel18 clean
timeout 2400 python tools/profile_group_step.py --config accel18 \
  || echo "FAILED rc=$?"
log appended profiles done

# (appended) one-hot MXU warp A/B + composed-propagation measurements
log WARP variant bench
timeout 2400 python tools/bench_warp.py || echo "FAILED rc=$?"
log PROFILE dff onehot fused-scale
timeout 2400 python tools/profile_group_step.py --config dff \
  --set warp_dtype=native --set warp_gather=onehot || echo "FAILED rc=$?"
log COMPOSED eval clip-checkpoint k=5 sweep
timeout 2400 python experiments/test.py \
    --cfg experiments/cfgs/extreme_synth_accel18_clip.yaml \
    --offset-sweep --propagate composed || echo "FAILED rc=$?"
log COMPOSED eval clip-checkpoint k=10 crossover point
timeout 1800 python experiments/test.py \
    --cfg experiments/cfgs/extreme_synth_accel18_clip.yaml \
    --interval 10 --offsets 1 --propagate composed || echo "FAILED rc=$?"
log appended r3b done
