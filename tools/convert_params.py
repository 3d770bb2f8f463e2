#!/usr/bin/env python
"""Pretrained-weight conversion into accel_tpu's flax param tree.

Reference counterpart (SURVEY.md §2 "Pretrained model fetch", §5
"Checkpoint / resume"): the reference initializes from MXNet
``resnet_v1_101-0000.params`` + ``flownet-0000.params`` files (OneDrive
downloads). Two import paths are provided:

1. :func:`load_mxnet_params` — parses the MXNet NDArray-list ``.params``
   container directly (dense fp32/fp16 tensors; no MXNet install needed).
2. :func:`convert_torch_resnet` — maps a torchvision ResNet ``state_dict``
   (torch is in the image) onto the ``DilatedResNet`` param tree.

Weight provenance is an open environment risk (zero egress — SURVEY.md §7);
these converters activate whenever a weights file is supplied.

Usage:
  python tools/convert_params.py --mxnet model/resnet_v1_101-0000.params --out out.msgpack
  python tools/convert_params.py --torch resnet18.pth --depth 18 --out out.msgpack
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# MXNet .params parsing lives in the package (runtime code needs it for
# pretrained init); re-exported here for the CLI surface.
from accel_tpu.utils.mxnet_io import load_mxnet_params  # noqa: E402,F401


# ---------------------------------------------------------------------------
# torchvision ResNet state_dict -> DilatedResNet param tree
# ---------------------------------------------------------------------------


def convert_torch_resnet(state_dict: dict, depth: int, stem: str = "conv7") -> tuple[dict, dict]:
    """Map a torchvision ResNet state_dict onto DilatedResNet's
    params/batch_stats trees (NCHW OIHW -> NHWC HWIO kernels).

    ``stem='s2d'`` embeds the 7x7/2 conv1 into the space-to-depth 4x4 form
    (exact; see models.resnet.embed_conv7_as_s2d).

    Returns (params, batch_stats) nested dicts matching
    ``DilatedResNet(depth, stem=stem).init(...)`` naming.
    """

    def k2flax(w):  # torch conv (O, I, kh, kw) -> flax (kh, kw, I, O)
        return np.transpose(np.asarray(w), (2, 3, 1, 0))

    params: dict = {}
    stats: dict = {}

    def put(tree, path, val):
        d = tree
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = np.asarray(val)

    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in state_dict.items()}

    if stem == "s2d":
        from accel_tpu.models.resnet import embed_conv7_as_s2d

        put(params, ("conv1_s2d", "kernel"),
            np.asarray(embed_conv7_as_s2d(k2flax(sd["conv1.weight"]))))
    else:
        put(params, ("conv1", "kernel"), k2flax(sd["conv1.weight"]))
    put(params, ("bn", "scale"), sd["bn1.weight"])  # stem norm
    put(params, ("bn", "bias"), sd["bn1.bias"])
    put(stats, ("bn", "mean"), sd["bn1.running_mean"])
    put(stats, ("bn", "var"), sd["bn1.running_var"])

    from accel_tpu.models.resnet import STAGE_PLANS

    kind, plan = STAGE_PLANS[depth]
    convs = ("conv1", "conv2") if kind == "basic" else ("conv1", "conv2", "conv3")
    for si, n_blocks in enumerate(plan):
        for bi in range(n_blocks):
            t = f"layer{si + 1}.{bi}"
            f = f"layer{si + 1}_block{bi}"
            for ci, cname in enumerate(convs, start=1):
                put(params, (f, cname, "kernel"), k2flax(sd[f"{t}.conv{ci}.weight"]))
                bn = f"{t}.bn{ci}"
                put(params, (f, f"bn{ci}", "scale"), sd[f"{bn}.weight"])
                put(params, (f, f"bn{ci}", "bias"), sd[f"{bn}.bias"])
                put(stats, (f, f"bn{ci}", "mean"), sd[f"{bn}.running_mean"])
                put(stats, (f, f"bn{ci}", "var"), sd[f"{bn}.running_var"])
            dk = f"{t}.downsample.0.weight"
            if dk in sd:
                put(params, (f, "downsample", "kernel"), k2flax(sd[dk]))
                bn = f"{t}.downsample.1"
                put(params, (f, "ds_bn", "scale"), sd[f"{bn}.weight"])
                put(params, (f, "ds_bn", "bias"), sd[f"{bn}.bias"])
                put(stats, (f, "ds_bn", "mean"), sd[f"{bn}.running_mean"])
                put(stats, (f, "ds_bn", "var"), sd[f"{bn}.running_var"])
    return params, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mxnet", help="MXNet .params file to parse")
    ap.add_argument("--torch", help="torch state_dict (.pth) to convert")
    ap.add_argument("--depth", type=int, default=101)
    ap.add_argument("--out", help="write converted tree (npz)")
    args = ap.parse_args()

    if args.mxnet:
        arg_p, aux_p = load_mxnet_params(args.mxnet)
        print(f"parsed {len(arg_p)} arg + {len(aux_p)} aux tensors")
        for k in list(arg_p)[:10]:
            print(f"  arg:{k} {arg_p[k].shape} {arg_p[k].dtype}")
        if args.out:
            np.savez(args.out, **{f"arg:{k}": v for k, v in arg_p.items()},
                     **{f"aux:{k}": v for k, v in aux_p.items()})
    elif args.torch:
        import torch

        sd = torch.load(args.torch, map_location="cpu", weights_only=True)
        params, stats = convert_torch_resnet(sd, args.depth)
        n = sum(np.asarray(x).size for x in _leaves(params))
        print(f"converted torchvision resnet{args.depth}: {n / 1e6:.1f}M params")
        if args.out:
            flat = {}
            _flatten("params", params, flat)
            _flatten("stats", stats, flat)
            np.savez(args.out, **flat)


def _leaves(d):
    for v in d.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


def _flatten(prefix, d, out):
    for k, v in d.items():
        key = f"{prefix}/{k}"
        if isinstance(v, dict):
            _flatten(key, v, out)
        else:
            out[key] = v


if __name__ == "__main__":
    main()
