"""Predictor — the reference's public inference API — and pred_eval.

Reference counterpart (SURVEY.md §2 "Predictor (public API to match)"):

    Predictor(symbol, data_names, label_names, context, max_data_shapes,
              provide_data, provide_label, arg_params, aux_params)
    Predictor.predict(data_batch) -> [dict(output_name -> NDArray)]

from ``<net>/core/tester.py``. The constructor keeps the reference's
argument order/names (symbol -> apply_fn; context/provide_*/max_data_shapes
accepted for drop-in compatibility — shape rebinding is subsumed by jit's
shape-keyed compilation cache, the MutableModule equivalent).

``pred_eval`` mirrors the reference per-frame loop: keyframe -> run the key
predictor and cache the propagated tensor, else run the cur predictor with
the cache as an *input*; accumulate the confusion matrix; report mIoU and
net-vs-data timing (SURVEY.md §3.1).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Sequence

import jax
import numpy as np

from accel_tpu.core.metrics import SegConfusionAccumulator


class DataBatch:
    """Minimal mx.io.DataBatch mirror: named input arrays."""

    def __init__(self, data: Sequence[Any], provide_data=None, provide_label=None):
        self.data = list(data)
        self.provide_data = provide_data
        self.provide_label = provide_label


class Predictor:
    def __init__(
        self,
        symbol: Callable,  # apply_fn(variables, *data) -> dict[str, array]
        data_names: Sequence[str],
        label_names: Sequence[str] = (),
        context=None,
        max_data_shapes=None,
        provide_data=None,
        provide_label=None,
        arg_params=None,
        aux_params=None,
    ):
        self._apply = symbol
        self.data_names = tuple(data_names)
        self.label_names = tuple(label_names or ())
        # arg/aux params mirror MXNet's split; merged into one variables dict
        variables = {}
        if arg_params:
            variables["params"] = arg_params
        if aux_params:
            variables["batch_stats"] = aux_params
        # Pin params on device once: a checkpoint restore hands back HOST
        # (numpy) arrays, and jit re-transfers numpy args on EVERY call —
        # through the TPU tunnel that is ~90s of param upload per frame.
        self._variables = jax.device_put(variables if variables else arg_params)
        self._jitted = jax.jit(lambda v, *data: self._apply(v, *data))

    def predict(self, data_batch: DataBatch) -> list[dict]:
        """Returns [ {output_name: array} ] (one dict per sub-batch; this
        runtime always returns a single fused dict, matching the reference's
        single-context common case)."""
        out = self._jitted(self._variables, *data_batch.data)
        if not isinstance(out, dict):
            out = {"output": out}
        return [out]


def make_key_cur_predictors(
    model, variables, full_res_pred: bool = True, propagate: str = "direct"
):
    """Build the reference's two-executor inference pair (SURVEY.md §3.1:
    ``get_key_test_symbol`` / ``get_cur_test_symbol``) as Predictors.

    key predictor:  data -> {'prop': cached tensor, 'pred': argmax map}
    cur predictor:  (data, anchor_small, prop) -> same; ``anchor_small`` is
    the FlowNet-downscaled anchor frame (the caller carries it, like the
    reference's feat cache re-fed as input).

    ``propagate`` must match how the weights were trained
    (``cfg.network.propagate``): 'direct' anchors flow and warp at the
    keyframe — the cur predictor passes prop/anchor through unchanged, so
    the scale field is applied once per frame, matching the pair training
    objective. 'incremental' cascades frame-to-frame (the reference Accel
    semantics); under pair-trained weights the re-applied scale field
    compounds and corrupts predictions (round-1 measurement: 98.7 vs 2.6
    accuracy), hence 'direct' is the default.
    """
    if propagate not in ("direct", "incremental"):
        raise ValueError(f"propagate must be direct|incremental, got {propagate!r}")
    if (
        propagate == "incremental"
        and model.use_scale_field
        and model.scale_cascade in ("mean1", "clamp")
    ):
        # these cascade semantics need the cumulative scale product carried
        # as a second stream; the key/cur streaming protocol carries only
        # (prop, anchor_small). They are analysis modes (BASELINE.md r4
        # intervention table) — serve 'last' (the measured-best incremental
        # semantics) or 'product' (reference), or eval via pred_eval_clips.
        raise ValueError(
            f"scale_cascade={model.scale_cascade!r} is not representable in "
            "the key/cur streaming protocol under incremental propagation; "
            "use 'last' or 'product', or evaluate with pred_eval_clips"
        )
    import jax.numpy as jnp

    from accel_tpu.ops.upsample import resize_bilinear

    def _pred_from_scores(scores, hw):
        if not full_res_pred:
            return jnp.argmax(scores, -1).astype(jnp.uint8)
        from accel_tpu.ops.upsample_argmax import upsample_argmax_or_oracle

        return upsample_argmax_or_oracle(scores, tuple(hw))

    def key_fn(v, image):
        prop = model.apply(v, image, method="ref_propagated")
        scores = model.apply(v, prop, method="ref_scores_from_propagated")
        if model.family == "accel":
            upd = model.apply(v, image, method="update_scores")
            scores = model.apply(v, scores, upd, method="fuse")
        if model.family in ("dff", "accel"):
            # 'anchor_small' carries the next frame's flow anchor: the
            # downscaled frame, or (fold_flow_downscale) its conv1
            # anchor-half stem partial
            if model.fold_flow_downscale:
                small = model.apply(v, image, method="flow_stem_partials")[1]
            else:
                small = model.apply(v, image, method="downscale_for_flow")
        else:
            small = image
        return {
            "prop": prop,
            "anchor_small": small,
            "pred": _pred_from_scores(scores, image.shape[1:3]),
        }

    def cur_fn(v, image, anchor_small, prop):
        if model.fold_flow_downscale:
            parts = model.apply(v, image, method="flow_stem_partials")
            flow, scale = model.apply(
                v, parts[0], anchor_small, method="flow_pair_from_partials"
            )
            small = parts[1]
        else:
            small = model.apply(v, image, method="downscale_for_flow")
            flow, scale = model.apply(v, small, anchor_small, method="flow_pair")
        if (
            propagate == "incremental"
            and model.use_scale_field
            and model.scale_cascade == "last"
        ):
            # scale_cascade='last' (the shipped incremental serving
            # semantics — accel18_cityscapes_incremental.yaml): carry the
            # UNMODULATED tensor frame-to-frame and modulate only the
            # scored copy with the CURRENT step's normalized field — the
            # streaming mirror of pipeline.prop_step's cascade branch.
            # Before r5 this path silently served 'product' (the advisor's
            # r4 medium finding: up to ~25 mIoU off at k=10 vs the
            # semantics the cfg's numbers were measured under).
            s = model.apply(v, scale, method="norm_scale")
            warped = model.apply(
                v, prop, flow, s, method="warp",
                normalize_scale=False, modulate=False,
            )
            scored = warped * s.astype(warped.dtype)
        else:
            warped = model.apply(v, prop, flow, scale, method="warp")
            scored = warped
        scores = model.apply(v, scored, method="ref_scores_from_propagated")
        if model.family == "accel":
            upd = model.apply(v, image, method="update_scores")
            scores = model.apply(v, scores, upd, method="fuse")
        if propagate == "direct":
            # keyframe-anchored: carry the keyframe tensors through unchanged
            next_prop, next_anchor = prop, anchor_small
        else:
            next_prop, next_anchor = warped, small
        return {
            "prop": next_prop,
            "anchor_small": next_anchor,
            "pred": _pred_from_scores(scores, image.shape[1:3]),
        }

    key_p = Predictor(key_fn, ("data",), arg_params=variables.get("params"),
                      aux_params=variables.get("batch_stats"))
    cur_p = Predictor(cur_fn, ("data", "anchor_small", "prop"),
                      arg_params=variables.get("params"),
                      aux_params=variables.get("batch_stats"))
    return key_p, cur_p


def pred_eval(
    key_predictor: Predictor,
    cur_predictor: Predictor,
    test_iter,
    num_classes: int,
    key_interval: int,
    logger=None,
    vis: bool = False,
):
    """Reference-shaped per-frame eval loop.

    ``test_iter`` yields dicts per frame:
      {'data': (1,H,W,3) normalized frame, 'label': (1,H,W) or None,
       'is_key': bool}
    Predictors as built by :func:`make_key_cur_predictors`: the key
    predictor outputs {'prop', 'anchor_small', 'pred'}; the cur predictor
    takes (data, anchor_small, prop) and outputs the same — the cached
    tensors are carried by this loop and re-fed as inputs, exactly the
    reference's feat_key protocol.
    Returns (mIoU, per-class IoU, timing dict).
    """
    log = logger.info if logger else print
    acc = SegConfusionAccumulator(num_classes)
    t_data = t_net = 0.0
    n_frames = 0
    prop = anchor_small = None
    t0 = time.time()
    for frame in test_iter:
        t_data += time.time() - t0
        t1 = time.time()
        if frame["is_key"] or prop is None:
            out = key_predictor.predict(DataBatch([frame["data"]]))[0]
        else:
            out = cur_predictor.predict(
                DataBatch([frame["data"], anchor_small, prop])
            )[0]
        prop = out["prop"]
        anchor_small = out.get("anchor_small", anchor_small)
        pred = out["pred"]
        jax.block_until_ready(pred)
        t_net += time.time() - t1
        if frame.get("label") is not None:
            acc.update(pred, frame["label"])
        n_frames += 1
        if n_frames % 100 == 0:
            log(
                f"testing {n_frames} frames "
                f"data {t_data / n_frames:.4f}s net {t_net / n_frames:.4f}s"
            )
        t0 = time.time()
    miou, iou = acc.result()
    fps = n_frames / max(t_net, 1e-9)
    log(f"frames {n_frames}  net fps {fps:.2f}  mIoU {miou * 100:.2f}")
    return miou, iou, {"t_data": t_data, "t_net": t_net, "frames": n_frames, "fps": fps}


def pred_eval_clips(
    model,
    variables,
    clip_iter,
    num_classes: int,
    interval: int,
    propagate: str = "incremental",
    logger=None,
    upsample: str = "bilinear_logits",
    mesh=None,
    shard_spatial: bool = False,
):
    """Fast path: batched clip inference (one fused XLA program per clip
    batch via lax.scan) — the TPU-native replacement for the per-frame loop.

    ``clip_iter`` yields {'clip': (B,F,H,W,3) normalized,
                          'label': (B,F,H,W) int with 255 ignore everywhere
                          except annotated frames (or None)}.

    ``mesh`` (optional ``jax.sharding.Mesh``): shard each clip batch over
    the mesh's 'data' axis (params replicated) — batched multi-chip
    inference, the eval-surface counterpart of train.py's dp sharding
    (SURVEY.md §7 step 7 / BASELINE.md milestone config 5). B must be
    divisible by the data axis. ``shard_spatial`` additionally shards the
    image H axis over 'spatial' (XLA inserts conv halo exchanges).
    """
    from accel_tpu.core.pipeline import clip_predictions

    log = logger.info if logger else print
    acc = SegConfusionAccumulator(num_classes)
    # Checkpoint restores return host (numpy) trees; jit re-uploads numpy
    # args per call (~370MB of params per clip through the tunnel). Pin once.
    if mesh is not None:
        from accel_tpu.parallel.mesh import batch_sharding, replicated

        variables = jax.device_put(variables, replicated(mesh))
        clip_sharding = batch_sharding(
            mesh, spatial_axis=2 if shard_spatial else None
        )
    else:
        variables = jax.device_put(variables)
        clip_sharding = None

    @jax.jit
    def run(variables, clip):
        return clip_predictions(
            model, variables, clip, interval, propagate, upsample=upsample
        )

    t_net = 0.0
    n_frames = n_timed = 0
    first = True
    for item in clip_iter:
        clip = item["clip"]
        if clip_sharding is not None:
            if clip.shape[0] % mesh.shape["data"]:
                raise ValueError(
                    f"clip batch {clip.shape[0]} not divisible by mesh "
                    f"data axis {mesh.shape['data']} (set TEST.BATCH_IMAGES "
                    f"to a multiple)"
                )
            clip = jax.device_put(clip, clip_sharding)
        t1 = time.time()
        preds = run(variables, clip)
        preds.block_until_ready()
        if first:
            first = False  # first batch pays the jit compile; exclude from fps
        else:
            t_net += time.time() - t1
            n_timed += clip.shape[0] * clip.shape[1]
        n_frames += clip.shape[0] * clip.shape[1]
        natives = item.get("label_native")
        if natives is not None:
            # SCALES resized the frames: score at NATIVE GT resolution
            # (reference protocol — predictions upsampled to GT). Crop the
            # pad-to-multiple region, nearest-resize the annotated frame's
            # prediction to the GT shape, accumulate on host.
            from accel_tpu.data.image import resize_to

            ann_pos = int(item["ann_pos"])
            preds_host = np.asarray(preds)
            for b, nat in enumerate(natives):
                if nat is None:
                    # this clip's annotation already matched frame
                    # resolution — score it from the device-label path so
                    # mixed-size batches count every clip
                    if item.get("label") is not None:
                        acc.update(preds[b : b + 1], item["label"][b : b + 1])
                    continue
                ann, scaled_hw = nat
                p = preds_host[b, ann_pos, : scaled_hw[0], : scaled_hw[1]]
                p = resize_to(p, *ann.shape[:2], interp="nearest")
                acc.update(p[None], ann[None])
        elif item.get("label") is not None:
            acc.update(preds, item["label"])
    miou, iou = acc.result()
    fps = n_timed / max(t_net, 1e-9)
    log(f"frames {n_frames}  net fps {fps:.2f}  mIoU {miou * 100:.2f}")
    return miou, iou, {"t_net": t_net, "frames": n_frames, "fps": fps}
