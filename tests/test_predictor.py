"""Predictor API + pred_eval loop tests (the reference's public inference
surface, SURVEY.md §2 'Predictor (public API to match)')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accel_tpu.core.predictor import DataBatch, Predictor, pred_eval



def test_predictor_signature_and_predict(tiny_accel):
    m, variables = tiny_accel

    def apply_fn(v, image):
        prop = m.apply(v, image, method="ref_propagated")
        return {"prop": prop, "pred": jnp.argmax(prop, -1).astype(jnp.uint8)}

    pred = Predictor(
        apply_fn,
        data_names=("data",),
        label_names=(),
        context=None,
        max_data_shapes=[("data", (1, 128, 128, 3))],
        provide_data=[[("data", (1, 128, 128, 3))]],
        provide_label=[None],
        arg_params=variables["params"],
        aux_params=variables["batch_stats"],
    )
    out = pred.predict(DataBatch([jnp.zeros((1, 128, 128, 3))]))
    assert isinstance(out, list) and isinstance(out[0], dict)
    assert out[0]["prop"].shape == (1, 8, 8, 19)
    assert out[0]["pred"].shape == (1, 8, 8)


def test_pred_eval_loop(tiny_accel):
    """Key/cur predictor pair over a synthetic 10-frame video, interval 5 —
    the reference tester.py loop shape with the cache fed back as input."""
    from accel_tpu.core.predictor import make_key_cur_predictors

    m, variables = tiny_accel
    H = W = 128
    kp, cp = make_key_cur_predictors(m, variables)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((10, H, W, 3)), jnp.float32) * 0.1

    def gen():
        for i in range(10):
            yield {
                "data": frames[i : i + 1],
                "is_key": i % 5 == 0,
                "label": jnp.zeros((1, H, W), jnp.int32) if i % 5 == 4 else None,
            }

    miou, iou, stats = pred_eval(kp, cp, gen(), 19, 5)
    assert stats["frames"] == 10
    assert 0.0 <= miou <= 1.0


def test_pred_eval_matches_clip_scan(tiny_accel):
    """The per-frame Predictor loop and the fused clip-scan path produce the
    same predictions (two implementations of the same protocol)."""
    from accel_tpu.core.pipeline import clip_predictions
    from accel_tpu.core.predictor import make_key_cur_predictors

    m, variables = tiny_accel
    H = W = 128
    rng = np.random.default_rng(3)
    clip = jnp.asarray(rng.standard_normal((1, 4, H, W, 3)), jnp.float32) * 0.1

    scan_preds = np.asarray(clip_predictions(m, variables, clip, 4, "incremental"))

    kp, cp = make_key_cur_predictors(m, variables, propagate="incremental")
    loop_preds = []
    prop = anchor = None
    for i in range(4):
        if i == 0:
            out = kp.predict(DataBatch([clip[:, 0]]))[0]
        else:
            out = cp.predict(DataBatch([clip[:, i], anchor, prop]))[0]
        prop, anchor = out["prop"], out["anchor_small"]
        loop_preds.append(np.asarray(out["pred"]))
    loop_preds = np.stack(loop_preds, 1)
    # identical protocol -> identical argmax maps (tiny numeric slack may
    # flip ties, so compare fraction of agreeing pixels)
    agree = (scan_preds == loop_preds).mean()
    assert agree > 0.999, f"agreement {agree}"


def test_pred_eval_direct_mode_matches_clip_scan(tiny_accel):
    """Serving default ('direct') must reproduce the fused clip path's
    direct-mode predictions — the mode pair-trained weights require
    (ADVICE r1: the per-frame loop used to hardwire incremental, silently
    compounding the scale field under the default training recipe)."""
    from accel_tpu.core.pipeline import clip_predictions
    from accel_tpu.core.serving import VideoSegmenter

    m, variables = tiny_accel
    H = W = 128
    rng = np.random.default_rng(7)
    clip = jnp.asarray(rng.standard_normal((1, 4, H, W, 3)), jnp.float32) * 0.1

    scan_preds = np.asarray(clip_predictions(m, variables, clip, 4, "direct"))

    seg = VideoSegmenter(m, variables, interval=4)  # propagate defaults direct
    loop_preds = np.asarray(seg.push_clip(clip))
    agree = (scan_preds == loop_preds).mean()
    assert agree > 0.999, f"agreement {agree}"


def test_checkpoint_roundtrip(tiny_accel, tmp_path):
    from accel_tpu.config import default_config
    from accel_tpu.core.checkpoint import (
        latest_epoch,
        load_checkpoint,
        save_checkpoint,
    )
    from accel_tpu.core.trainer import init_train_state, make_optimizer

    m, variables = tiny_accel
    cfg = default_config()
    tx, _ = make_optimizer(cfg, 10)
    state = init_train_state(m, variables, tx)
    prefix = str(tmp_path / "ckpt")
    save_checkpoint(prefix, 0, jax.device_get(state))
    assert latest_epoch(prefix) == 0
    restored = load_checkpoint(prefix, 0, jax.device_get(state))
    for a, b in zip(jax.tree.leaves(state.variables), jax.tree.leaves(restored.variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_video_segmenter_streaming(tiny_accel):
    from accel_tpu.core.serving import VideoSegmenter

    m, variables = tiny_accel
    seg = VideoSegmenter(m, variables, interval=3)
    rng = np.random.default_rng(5)
    frames = jnp.asarray(rng.standard_normal((7, 1, 128, 128, 3)), jnp.float32) * 0.1
    preds = [np.asarray(seg.push_frame(frames[i])) for i in range(7)]
    assert all(p.shape == (1, 128, 128) and p.dtype == np.uint8 for p in preds)
    assert seg.is_keyframe_next is False  # t=7, next key at 9
    seg.reset()
    assert seg.is_keyframe_next


def test_push_group_matches_per_frame_loop(tiny_accel):
    """Group-granularity streaming (one dispatch per keyframe group) must
    reproduce the per-frame loop's predictions and keep the schedule
    consistent when mixing the two."""
    from accel_tpu.core.serving import VideoSegmenter

    m, variables = tiny_accel
    rng = np.random.default_rng(11)
    clip = jnp.asarray(rng.standard_normal((1, 4, 128, 128, 3)), jnp.float32) * 0.1

    seg_a = VideoSegmenter(m, variables, interval=4)
    loop_preds = np.asarray(seg_a.push_clip(clip))

    seg_b = VideoSegmenter(m, variables, interval=4)
    group_preds = np.asarray(seg_b.push_group(clip))
    agree = (loop_preds == group_preds).mean()
    assert agree > 0.999, f"agreement {agree}"

    # schedule stays keyframe-aligned after a group; mid-group push_group
    # is rejected
    assert seg_b.is_keyframe_next
    seg_b.push_frame(clip[:, 0])
    with pytest.raises(ValueError):
        seg_b.push_group(clip)
    with pytest.raises(ValueError):
        VideoSegmenter(m, variables, interval=4).push_group(clip[:, :2])


def test_checkpoint_overwrite_same_step(tiny_accel, tmp_path):
    """Re-running an epoch must overwrite its checkpoint: orbax raises
    StepAlreadyExistsError on step collision (force= only bypasses the
    save-interval policy), so save_checkpoint deletes the stale step first.
    Regression for the ladder reruns crashing on leftover /tmp state."""
    from accel_tpu.config import default_config
    from accel_tpu.core.checkpoint import load_checkpoint, save_checkpoint
    from accel_tpu.core.trainer import init_train_state, make_optimizer

    m, variables = tiny_accel
    cfg = default_config()
    tx, _ = make_optimizer(cfg, 10)
    state = init_train_state(m, variables, tx)
    prefix = str(tmp_path / "ckpt")
    state = jax.device_get(state)
    save_checkpoint(prefix, 3, state)

    bumped = jax.tree.map(lambda x: x + 1 if jnp.issubdtype(
        jnp.asarray(x).dtype, jnp.floating) else x, state)
    save_checkpoint(prefix, 3, bumped)  # must not raise
    restored = load_checkpoint(prefix, 3, state)
    a = jax.tree.leaves(restored.variables["params"])[0]
    b = jax.tree.leaves(state.variables["params"])[0]
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 0.5


def test_streaming_fold_flow_matches_standard(tiny_accel):
    """The key/cur streaming protocol with fold_flow_downscale (anchor
    cache carries the conv1 anchor-half partial) must agree with the
    standard path's predictions almost everywhere (edge-ring contract of
    ops/fold_downscale.py)."""
    from accel_tpu.core.serving import VideoSegmenter

    m, variables = tiny_accel
    m_fold = m.clone(fold_flow_downscale=True)
    rng = np.random.default_rng(11)
    clip = jnp.asarray(rng.standard_normal((1, 4, 128, 128, 3)), jnp.float32) * 0.1

    seg0 = VideoSegmenter(m, variables, interval=4)
    seg1 = VideoSegmenter(m_fold, variables, interval=4)
    p0 = np.asarray(seg0.push_clip(clip))
    p1 = np.asarray(seg1.push_clip(clip))
    agree = (p0 == p1).mean()
    assert agree > 0.97, f"agreement {agree}"


def test_streaming_incremental_last_matches_clip_scan(tiny_accel):
    """scale_cascade='last' in the key/cur streaming pair must match the
    clip-scan path's semantics (advisor r4 medium: the streaming server
    silently served 'product' — the cfg's own notes say up to ~25 mIoU
    off at k=10 vs the semantics the incremental serving numbers were
    measured under)."""
    from accel_tpu.core.pipeline import clip_predictions
    from accel_tpu.core.predictor import make_key_cur_predictors

    m, variables = tiny_accel
    m = m.clone(scale_cascade="last")
    H = W = 128
    rng = np.random.default_rng(11)
    clip = jnp.asarray(rng.standard_normal((1, 4, H, W, 3)), jnp.float32) * 0.1

    scan_preds = np.asarray(clip_predictions(m, variables, clip, 4, "incremental"))

    kp, cp = make_key_cur_predictors(m, variables, propagate="incremental")
    loop_preds = []
    prop = anchor = None
    for i in range(4):
        if i == 0:
            out = kp.predict(DataBatch([clip[:, 0]]))[0]
        else:
            out = cp.predict(DataBatch([clip[:, i], anchor, prop]))[0]
        prop, anchor = out["prop"], out["anchor_small"]
        loop_preds.append(np.asarray(out["pred"]))
    loop_preds = np.stack(loop_preds, 1)
    agree = (scan_preds == loop_preds).mean()
    assert agree > 0.999, f"agreement {agree}"


def test_streaming_rejects_unrepresentable_cascade(tiny_accel):
    """mean1/clamp cascade semantics need a cumulative-product stream the
    key/cur protocol doesn't carry — refuse loudly instead of silently
    serving different semantics."""
    from accel_tpu.core.predictor import make_key_cur_predictors

    m, variables = tiny_accel
    for mode in ("mean1", "clamp"):
        with pytest.raises(ValueError, match="streaming"):
            make_key_cur_predictors(
                m.clone(scale_cascade=mode), variables, propagate="incremental"
            )
    # fine under direct (single warp — no cascade)
    make_key_cur_predictors(
        m.clone(scale_cascade="mean1"), variables, propagate="direct"
    )
