"""Predictor API + pred_eval loop tests (the reference's public inference
surface, SURVEY.md §2 'Predictor (public API to match)')."""

import jax
import jax.numpy as jnp
import numpy as np

from accel_tpu.core.predictor import DataBatch, Predictor, pred_eval
from accel_tpu.ops.upsample import resize_bilinear


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
    m, variables = tiny_accel
    H = W = 128

    def key_fn(v, image):
        prop = m.apply(v, image, method="ref_propagated")
        upd = m.apply(v, image, method="update_scores")
        fused = m.apply(v, prop, upd, method="fuse")
        pred = jnp.argmax(resize_bilinear(fused, (H, W)), -1).astype(jnp.uint8)
        return {"prop": prop, "pred": pred}

    def cur_fn(v, image, anchor, prop):
        flow, scale = m.apply(v, image, anchor, method="flow")
        warped = m.apply(v, prop, flow, scale, method="warp")
        upd = m.apply(v, image, method="update_scores")
        fused = m.apply(v, warped, upd, method="fuse")
        pred = jnp.argmax(resize_bilinear(fused, (H, W)), -1).astype(jnp.uint8)
        return {"prop": warped, "pred": pred}

    kp = Predictor(key_fn, ("data",), arg_params=variables["params"],
                   aux_params=variables["batch_stats"])
    cp = Predictor(cur_fn, ("data", "data_anchor", "feat_cache"),
                   arg_params=variables["params"],
                   aux_params=variables["batch_stats"])

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((10, H, W, 3)), jnp.float32) * 0.1

    def gen():
        prev = None
        for i in range(10):
            f = frames[i : i + 1]
            yield {
                "data": f,
                "anchor": prev if prev is not None else f,
                "is_key": i % 5 == 0,
                "label": jnp.zeros((1, H, W), jnp.int32) if i % 5 == 4 else None,
            }
            prev = f

    miou, iou, stats = pred_eval(kp, cp, gen(), 19, 5)
    assert stats["frames"] == 10
    assert 0.0 <= miou <= 1.0


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
