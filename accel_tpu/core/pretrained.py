"""Pretrained-weight initialization: load + merge into the model variables.

Reference counterpart (SURVEY.md §3.2): ``train_end2end.py`` loads
``resnet_v1_101-0000.params`` and ``flownet-0000.params`` via
``lib/utils/load_model.py:load_param`` and merges both name->array dicts
into the freshly-initialized arg/aux params before ``mod.fit``; stages
listed in ``network.FIXED_PARAMS`` stay frozen (handled here by
``trainer.make_optimizer``'s mask).

Supported sources (``_load_named_arrays``):
- MXNet ``.params`` (the reference's format; ``{prefix}-{epoch:04d}.params``
  naming convention honored) — parsed by ``utils.mxnet_io``.
- ``.npz`` written by ``tools/convert_params.py`` (``arg:``/``aux:`` or
  ``params/``/``stats/`` key styles).
- torchvision ``.pth`` state_dicts (ResNet backbones), converted by
  ``tools.convert_params.convert_torch_resnet``.

Name resolution, per pretrained tensor, in order:
1. **Exact path** — '/'-joined path relative to the target submodule (e.g.
   ``layer1_block0/conv1/kernel``) or from the params root; checked against
   both the params and batch_stats collections. This is the round-trip
   format for weights produced inside this framework.
2. **Caffe/MSRA MXNet names** (``conv1_weight``, ``bn_conv1_gamma``,
   ``res2a_branch2a_weight``, ``bn4b22_branch2c_moving_mean``...) — the
   DFF-family pretrained ResNet naming [SURVEY.md provenance: C-high for
   resnet_v1_101; conv kernels transposed OIHW->HWIO]. Unmatched names are
   reported, not fatal (the reference file carries ImageNet fc1000 etc.).
"""

from __future__ import annotations

import os

import jax
import numpy as np


# ---------------------------------------------------------------------------
# tree helpers
# ---------------------------------------------------------------------------


def _is_mapping(v) -> bool:
    return hasattr(v, "items") and not hasattr(v, "shape")


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if _is_mapping(v):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _set_in(tree, path, value):
    d = tree
    for p in path[:-1]:
        d = d[p]
    d[path[-1]] = value


def _to_mutable(tree):
    if _is_mapping(tree):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


# ---------------------------------------------------------------------------
# Caffe/MSRA MXNet resnet_v1 name table
# ---------------------------------------------------------------------------


def _caffe_block_names(depth: int, n_blocks: int) -> list[str]:
    """Caffe ResNet block suffixes: letters for <=50 (res3a..res3d); 'a',
    'b1'..'bN' for 101/152 stages with many blocks (res4a, res4b1..b22)."""
    if depth >= 101 and n_blocks > 3:
        return ["a"] + [f"b{i}" for i in range(1, n_blocks)]
    return [chr(ord("a") + i) for i in range(n_blocks)]


def caffe_resnet_table(depth: int) -> dict[str, tuple[str, tuple[str, ...]]]:
    """mxnet param name -> (collection, path under the backbone module)."""
    from accel_tpu.models.resnet import STAGE_PLANS

    kind, plan = STAGE_PLANS[depth]
    convs = ("conv1", "conv2") if kind == "basic" else ("conv1", "conv2", "conv3")
    branches = ("branch2a", "branch2b") if kind == "basic" else (
        "branch2a", "branch2b", "branch2c"
    )
    table: dict[str, tuple[str, tuple[str, ...]]] = {
        "conv1_weight": ("params", ("conv1", "kernel")),
    }

    def bn(mx_base: str, path: tuple[str, ...]):
        table[f"{mx_base}_gamma"] = ("params", path + ("scale",))
        table[f"{mx_base}_beta"] = ("params", path + ("bias",))
        table[f"{mx_base}_moving_mean"] = ("batch_stats", path + ("mean",))
        table[f"{mx_base}_moving_var"] = ("batch_stats", path + ("var",))

    bn("bn_conv1", ("bn",))
    for si, n_blocks in enumerate(plan):
        stage = si + 2  # res2..res5
        for bi, blk in enumerate(_caffe_block_names(depth, n_blocks)):
            mod = f"layer{si + 1}_block{bi}"
            for conv, br in zip(convs, branches):
                table[f"res{stage}{blk}_{br}_weight"] = (
                    "params", (mod, conv, "kernel"),
                )
                bn(f"bn{stage}{blk}_{br}", (mod, conv.replace("conv", "bn")))
            table[f"res{stage}{blk}_branch1_weight"] = (
                "params", (mod, "downsample", "kernel"),
            )
            bn(f"bn{stage}{blk}_branch1", (mod, "ds_bn"))
    return table


# ---------------------------------------------------------------------------
# merge
# ---------------------------------------------------------------------------


def merge_pretrained(
    variables,
    arg_params: dict,
    aux_params: dict,
    submodule: tuple[str, ...] = (),
    depth: int | None = None,
    logger=None,
):
    """Merge name->array dicts into ``variables`` (returns a new dict plus a
    report). ``submodule`` roots relative paths / backbone-name translation
    (e.g. ``('ref_net', 'backbone')``); ``depth`` enables the Caffe table."""
    log = logger.info if logger else (lambda *_: None)
    params = _to_mutable(variables["params"])
    stats = _to_mutable(variables.get("batch_stats", {}))
    flat = {("params",) + k: v for k, v in _flatten(params).items()}
    flat.update({("batch_stats",) + k: v for k, v in _flatten(stats).items()})

    table = caffe_resnet_table(depth) if depth else {}
    matched, skipped_shape, unmatched = [], [], []

    def try_set(coll_path, arr, name, transpose):
        target = flat.get(coll_path)
        if target is None:
            return False
        a = np.asarray(arr)
        if transpose and a.ndim == 4:
            a = np.transpose(a, (2, 3, 1, 0))  # OIHW -> HWIO (always, for MXNet)
        if a.shape != target.shape:
            skipped_shape.append((name, a.shape, target.shape))
            return True  # matched a leaf but unusable; don't re-try elsewhere
        tree = params if coll_path[0] == "params" else stats
        _set_in(tree, coll_path[1:], np.asarray(a, dtype=np.asarray(target).dtype))
        matched.append(name)
        return True

    for name, arr in list(arg_params.items()) + [
        (n, a) for n, a in aux_params.items()
    ]:
        is_aux = name in aux_params and name not in arg_params
        done = False
        if "/" in name:  # exact-path style
            parts = tuple(name.split("/"))
            if parts[0] in ("params", "batch_stats"):
                candidates = [parts]
            else:
                colls = ("batch_stats",) if is_aux else ("params", "batch_stats")
                candidates = [
                    (c,) + submodule + parts for c in colls
                ] + [(c,) + parts for c in colls]
            for cand in candidates:
                if try_set(cand, arr, name, transpose=False):
                    done = True
                    break
        elif name in table:  # Caffe/MSRA backbone name
            coll, rel = table[name]
            done = try_set((coll,) + submodule + rel, arr, name, transpose=True)
        if not done:
            unmatched.append(name)

    report = {
        "matched": len(matched),
        "skipped_shape": skipped_shape,
        "unmatched": unmatched,
    }
    log(
        f"pretrained merge into /{'/'.join(submodule) or '(root)'}: "
        f"{len(matched)} tensors matched, {len(skipped_shape)} shape-skipped, "
        f"{len(unmatched)} unmatched"
    )
    if skipped_shape:
        log(f"  shape-skipped: {[s[0] for s in skipped_shape][:8]} ...")
    out = dict(variables)
    out["params"] = params
    if stats or "batch_stats" in variables:
        out["batch_stats"] = stats
    return out, report


# ---------------------------------------------------------------------------
# file loading + cfg entry point
# ---------------------------------------------------------------------------


def _load_named_arrays(path: str, epoch: int = 0, depth: int | None = None):
    """-> (arg_params, aux_params) name->ndarray."""
    if not os.path.exists(path):
        cand = f"{path}-{epoch:04d}.params"  # reference prefix convention
        if os.path.exists(cand):
            path = cand
        else:
            raise FileNotFoundError(f"pretrained file not found: {path} (or {cand})")
    if path.endswith(".params"):
        from accel_tpu.utils.mxnet_io import load_mxnet_params

        return load_mxnet_params(path)
    if path.endswith(".npz"):
        data = np.load(path)
        arg, aux = {}, {}
        for k in data.files:
            if k.startswith("arg:"):
                arg[k[4:]] = data[k]
            elif k.startswith("aux:"):
                aux[k[4:]] = data[k]
            elif k.startswith("params/"):
                arg[k[len("params/"):]] = data[k]
            elif k.startswith("stats/"):
                aux[k[len("stats/"):]] = data[k]
            else:
                arg[k] = data[k]
        return arg, aux
    if path.endswith((".pth", ".pt")):
        import torch

        from tools.convert_params import convert_torch_resnet

        sd = torch.load(path, map_location="cpu", weights_only=True)
        p, s = convert_torch_resnet(sd, depth or 101)
        return (
            {"/".join(k): v for k, v in _flatten(p).items()},
            {"/".join(k): v for k, v in _flatten(s).items()},
        )
    raise ValueError(f"unsupported pretrained format: {path}")


def apply_pretrained_cfg(cfg, variables, logger=None):
    """Consume ``network.pretrained`` / ``pretrained_flow`` /
    ``pretrained_update`` (+ ``pretrained_epoch``) — the reference driver's
    load_param+merge step. Returns (variables, reports)."""
    net = cfg.network
    epoch = int(net.get("pretrained_epoch", 0) or 0)
    reports = {}
    if (str(net.get("pretrained_flow", "") or "")
            and str(net.get("scale_field_norm", "none")) != "none"):
        msg = (
            "network.pretrained_flow is set but scale_field_norm="
            f"{net.get('scale_field_norm')!r}: reference FlowNet weights "
            "were trained with the raw (gain-covariant) scale field — set "
            "scale_field_norm: none for weight parity, or retrain the "
            "fusion/head under the normalized field"
        )
        (logger.warning if logger else print)(msg)
    jobs = [
        (str(net.get("pretrained", "") or ""), ("ref_net", "backbone"),
         int(net.ref_depth), "ref"),
        (str(net.get("pretrained_update", "") or ""), ("update_net", "backbone"),
         int(net.get("update_depth", 0) or 0), "update"),
        (str(net.get("pretrained_flow", "") or ""), ("flownet",), None, "flow"),
    ]
    for path, submodule, depth, tag in jobs:
        if not path:
            continue
        arg, aux = _load_named_arrays(path, epoch, depth)
        variables, rep = merge_pretrained(
            variables, arg, aux, submodule=submodule, depth=depth, logger=logger
        )
        reports[tag] = rep
    return variables, reports
