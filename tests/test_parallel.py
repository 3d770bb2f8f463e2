"""Multi-chip sharding tests on the 8-device virtual CPU mesh — the thing
the reference never had (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from accel_tpu.parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch


def test_mesh_shapes():
    mesh = make_mesh(data=4, spatial=2)
    assert mesh.shape == {"data": 4, "spatial": 2}
    mesh = make_mesh(data=-1, spatial=2)
    assert mesh.shape["data"] == len(jax.devices()) // 2


def test_data_parallel_train_step(tiny_accel):
    from accel_tpu.config import default_config
    from accel_tpu.core.trainer import init_train_state, make_optimizer, make_train_step

    m, variables = tiny_accel
    # deep-copy: the train step donates its state, and on the virtual CPU
    # mesh device_put may alias the source buffer as one replica shard —
    # without the copy, donation would delete the session fixture's arrays
    variables = jax.tree.map(jnp.array, variables)
    mesh = make_mesh(data=8, spatial=1)
    cfg = default_config()
    tx, _ = make_optimizer(cfg, epoch_size=100)
    state = init_train_state(m, variables, tx)
    step = make_train_step(m, tx, num_classes=19, mesh=mesh)

    rng = np.random.default_rng(0)
    batch = {
        "data": jnp.asarray(rng.standard_normal((8, 128, 128, 3)), jnp.float32) * 0.1,
        "data_ref": jnp.asarray(rng.standard_normal((8, 128, 128, 3)), jnp.float32) * 0.1,
        "eq_flag": jnp.zeros((8,)),
        "label": jnp.asarray(rng.integers(0, 19, (8, 128, 128)), jnp.int32),
    }
    batch = shard_batch(mesh, batch)
    state = jax.device_put(state, replicated(mesh))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def _clip_batch(rng, B=4, F=3, H=128, W=128):
    label = np.full((B, F, H, W), 255, np.int32)
    label[:, -1] = rng.integers(0, 19, (B, H, W))
    return {
        "clip": jnp.asarray(rng.standard_normal((B, F, H, W, 3)), jnp.float32) * 0.1,
        "label": jnp.asarray(label),
    }


def test_clip_objective_train_step_on_mesh(tiny_accel):
    """The SHIPPED default training recipe (clip objective + incremental
    cascade under scale_cascade='last' — the r5 default on the tiny_accel
    fixture — + remat, config/defaults.py) under dp and dp x sp sharding:
    loss and grads must match the single-device run (VERDICT r3 #5 — the
    multi-chip green light previously certified only the pair fallback).
    The clip backward (scan + per-frame jax.checkpoint + cascaded warps) is
    exactly the program that can diverge under SPMD partitioning."""
    from accel_tpu.core.pipeline import clip_loss_and_stats

    m, variables = tiny_accel
    rng = np.random.default_rng(7)
    batch = _clip_batch(rng)

    def loss_fn(params, b):
        v = dict(variables)
        v["params"] = params
        loss, _ = clip_loss_and_stats(
            m, v, b, 19, propagate="incremental", remat=True, aux_weight=0.5
        )
        return loss

    grad_fn = jax.value_and_grad(loss_fn)
    l1, g1 = jax.jit(grad_fn)(variables["params"], batch)
    l1 = float(l1)
    g1 = jax.tree.map(np.asarray, g1)

    for data, spatial in ((4, 1), (4, 2)):
        mesh = make_mesh(data=data, spatial=spatial)
        sharded = shard_batch(mesh, batch, spatial=spatial > 1)
        p_rep = jax.device_put(variables["params"], replicated(mesh))
        lm, gm = jax.jit(grad_fn, out_shardings=replicated(mesh))(p_rep, sharded)
        np.testing.assert_allclose(float(lm), l1, rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), b, rtol=1e-4, atol=1e-5
            ),
            gm, g1,
        )


def test_clip_through_direct_train_step_on_mesh(tiny_accel):
    """The r4 recipe variant (clip objective THROUGH direct propagation,
    accel18_cityscapes_direct.yaml — the stateless-serving pick) stays
    mesh-certified after the r5 default flip: dp grads match
    single-device."""
    from accel_tpu.core.pipeline import clip_loss_and_stats

    m, variables = tiny_accel
    batch = _clip_batch(np.random.default_rng(11))

    def loss_fn(params, b):
        v = dict(variables)
        v["params"] = params
        loss, _ = clip_loss_and_stats(
            m, v, b, 19, propagate="direct", remat=True, aux_weight=0.5
        )
        return loss

    grad_fn = jax.value_and_grad(loss_fn)
    l1, g1 = jax.jit(grad_fn)(variables["params"], batch)
    mesh = make_mesh(data=4, spatial=1)
    sharded = shard_batch(mesh, batch)
    p_rep = jax.device_put(variables["params"], replicated(mesh))
    lm, gm = jax.jit(grad_fn, out_shardings=replicated(mesh))(p_rep, sharded)
    np.testing.assert_allclose(float(lm), float(l1), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        gm, g1,
    )


def test_clip_objective_full_train_step_runs_on_mesh(tiny_accel):
    """make_train_step with the shipped objective/propagate/remat knobs
    executes on the 8-device mesh (optimizer update + donation included)."""
    from accel_tpu.config import default_config
    from accel_tpu.core.trainer import init_train_state, make_optimizer, make_train_step

    m, variables = tiny_accel
    variables = jax.tree.map(jnp.array, variables)  # donation (see above)
    mesh = make_mesh(data=4, spatial=2)
    cfg = default_config()
    tx, _ = make_optimizer(cfg, epoch_size=100)
    state = init_train_state(m, variables, tx)
    step = make_train_step(
        m, tx, num_classes=19, mesh=mesh, objective="clip",
        propagate="incremental", remat=True,
    )
    batch = shard_batch(mesh, _clip_batch(np.random.default_rng(8)), spatial=True)
    state = jax.device_put(state, replicated(mesh))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_dp_matches_single_device(tiny_accel):
    """Gradient allreduce over the mesh gives the same loss as one device."""
    from accel_tpu.core.pipeline import pair_loss

    m, variables = tiny_accel
    rng = np.random.default_rng(1)
    batch = {
        "data": jnp.asarray(rng.standard_normal((4, 128, 128, 3)), jnp.float32) * 0.1,
        "data_ref": jnp.asarray(rng.standard_normal((4, 128, 128, 3)), jnp.float32) * 0.1,
        "eq_flag": jnp.zeros((4,)),
        "label": jnp.asarray(rng.integers(0, 19, (4, 128, 128)), jnp.int32),
    }
    l_single = float(pair_loss(m, variables, batch, 19))

    mesh = make_mesh(data=4, spatial=1)
    sharded = shard_batch(mesh, batch)
    v_rep = jax.device_put(variables, replicated(mesh))
    l_mesh = float(
        jax.jit(lambda v, b: pair_loss(m, v, b, 19))(v_rep, sharded)
    )
    np.testing.assert_allclose(l_mesh, l_single, rtol=1e-5)


def test_pred_eval_clips_sharded_matches_single_device(tiny_accel):
    """The eval surface (pred_eval_clips) under a data-sharded mesh must
    bit-match the single-device run on the same fixtures — batched
    multi-chip inference as the DRIVER exposes it (VERDICT r2 #2 /
    BASELINE.md milestone config 5)."""
    from accel_tpu.core.predictor import pred_eval_clips

    m, variables = tiny_accel
    rng = np.random.default_rng(9)
    items = []
    for _ in range(2):
        label = np.full((4, 3, 128, 128), 255, np.int32)
        label[:, 2] = rng.integers(0, 19, (4, 128, 128))
        items.append({
            "clip": np.asarray(
                rng.standard_normal((4, 3, 128, 128, 3)), np.float32) * 0.1,
            "label": label,
        })

    miou_1, iou_1, stats_1 = pred_eval_clips(
        m, variables, iter(items), 19, 3, "direct")

    mesh = make_mesh(data=4, spatial=1)
    miou_m, iou_m, stats_m = pred_eval_clips(
        m, variables, iter(items), 19, 3, "direct", mesh=mesh)
    assert stats_m["frames"] == stats_1["frames"] == 24
    assert miou_m == miou_1
    np.testing.assert_array_equal(iou_m, iou_1)

    # spatial axis too (data x spatial = 4 x 2)
    mesh2 = make_mesh(data=4, spatial=2)
    miou_s, iou_s, _ = pred_eval_clips(
        m, variables, iter(items), 19, 3, "direct", mesh=mesh2,
        shard_spatial=True)
    assert miou_s == miou_1

    # indivisible batch -> loud error, not silent wrong sharding
    import pytest

    with pytest.raises(ValueError):
        pred_eval_clips(m, variables, iter([{
            "clip": items[0]["clip"][:3], "label": items[0]["label"][:3],
        }]), 19, 3, "direct", mesh=mesh)


def test_spatial_sharding_inference(tiny_accel):
    """H-axis (spatial) sharding: XLA inserts halo exchanges for convs and
    the result matches unsharded inference."""
    from accel_tpu.core.pipeline import clip_logits

    m, variables = tiny_accel
    clip = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 2, 128, 128, 3)), jnp.float32
    ) * 0.1
    ref = np.asarray(clip_logits(m, variables, clip, interval=2))

    mesh = make_mesh(data=2, spatial=4)
    clip_sh = jax.device_put(clip, batch_sharding(mesh, spatial_axis=2))
    v_rep = jax.device_put(variables, replicated(mesh))
    out = np.asarray(
        jax.jit(lambda v, c: clip_logits(m, v, c, interval=2))(v_rep, clip_sh)
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)
