#!/bin/bash
# Round-4 serialized TPU session: in-program kernel verdict, then the
# accuracy battery. Run detached:
#   setsid nohup bash tools/run_r4_tpu_session.sh > /tmp/r4_session.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "=== profile_group_step dff (dbuf onehot in-program verdict) $(date +%H:%M:%S) ==="
timeout 3600 python -u tools/profile_group_step.py --config dff \
    --set warp_dtype=native --set warp_gather=onehot --set warp_max_disp=4 \
    || echo "PROFILE dff FAILED rc=$?"

echo "=== r4 battery $(date +%H:%M:%S) ==="
bash tools/run_r4_battery.sh
