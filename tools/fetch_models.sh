#!/usr/bin/env bash
# Fetch + convert the reference's pretrained initialization weights.
#
# Reference counterpart (SURVEY.md §2 "Pretrained model fetch"): the
# reference's README directs a manual OneDrive download of
#   model/pretrained_model/resnet_v1_101-0000.params
#   model/pretrained_model/flownet-0000.params
# (MXNet NDArray containers) before training. This environment has zero
# egress, so this script documents the full provenance chain and performs
# it on machines with network access:
#
#   1. torchvision ImageNet ResNets (the public equivalent of the MSRA
#      resnet_v1 weights) -> converted onto DilatedResNet's param tree.
#   2. If you have the reference's own .params files (OneDrive links in
#      SamvitJ/Accel's README), drop them into model/pretrained_model/ and
#      this script converts them directly — the from-scratch MXNet parser in
#      tools/convert_params.py reads the container format without MXNet.
#
# Training then picks the converted files up via the cfg fields
#   network.pretrained / network.pretrained_flow / network.pretrained_update
# (see accel_tpu/core/pretrained.py and experiments/cfgs/*.yaml).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p model/pretrained_model

# --- path 1: reference MXNet containers, if present -----------------------
for f in model/pretrained_model/resnet_v1_101-0000.params \
         model/pretrained_model/flownet-0000.params; do
  if [ -f "$f" ]; then
    out="${f%.params}.npz"
    echo "converting $f -> $out"
    python tools/convert_params.py --mxnet "$f" --out "$out"
  fi
done

# --- path 2: torchvision ImageNet ResNets (needs network) ------------------
python - <<'EOF'
import os
try:
    import torch
    from torchvision.models import resnet18, resnet101
except ImportError as e:  # torchvision may be absent; torch is baked in
    raise SystemExit(f"torchvision unavailable ({e}); use path 1 instead")

os.makedirs("model/pretrained_model", exist_ok=True)
for depth, ctor in ((18, resnet18), (101, resnet101)):
    dst = f"model/pretrained_model/torch_resnet{depth}.pth"
    if os.path.exists(dst):
        continue
    try:
        sd = ctor(weights="IMAGENET1K_V1").state_dict()
    except Exception as e:
        raise SystemExit(f"download failed ({e}); no network?")
    torch.save(sd, dst)
    print("saved", dst)
EOF

for d in 18 101; do
  src="model/pretrained_model/torch_resnet${d}.pth"
  out="model/pretrained_model/resnet${d}_imagenet.npz"
  if [ -f "$src" ] && [ ! -f "$out" ]; then
    python tools/convert_params.py --torch "$src" --depth "$d" --out "$out"
  fi
done
echo "done; point cfg network.pretrained at the .npz files"
