import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accel_tpu.core.pipeline import clip_logits, clip_predictions, pair_loss


def test_clip_scan_shapes(tiny_accel):
    m, variables = tiny_accel
    clip = jnp.ones((1, 10, 128, 128, 3)) * 0.1
    lg = clip_logits(m, variables, clip, interval=5)
    assert lg.shape == (1, 10, 8, 8, 19)
    pr = clip_predictions(m, variables, clip, interval=5)
    assert pr.shape == (1, 10, 128, 128)
    assert pr.dtype == jnp.uint8


def test_interval_1_equals_per_frame(tiny_accel):
    """interval=1 -> every frame is a keyframe: Accel == fuse(ref, update)
    per frame, no flow/warp in the path (SURVEY.md §4 property tests)."""
    m, variables = tiny_accel
    rng = jax.random.PRNGKey(0)
    clip = jax.random.normal(rng, (1, 2, 128, 128, 3)) * 0.1
    lg = clip_logits(m, variables, clip, interval=1)
    for f in range(2):
        frame = clip[:, f]
        ref = m.apply(variables, frame, method="ref_propagated")
        upd = m.apply(variables, frame, method="update_scores")
        exp = m.apply(variables, ref, upd, method="fuse")
        np.testing.assert_allclose(np.asarray(lg[:, f]), np.asarray(exp), atol=1e-5)


def test_keyframe_output_equals_pair_eq_path(tiny_accel):
    """First frame of a group == the eq_flag=1 training-pair output."""
    m, variables = tiny_accel
    img = jax.random.normal(jax.random.PRNGKey(7), (1, 128, 128, 3)) * 0.1
    clip = jnp.stack([img, img], axis=1)
    lg = clip_logits(m, variables, clip, interval=2)
    pair = m.apply(variables, img, img, jnp.ones((1,)), train=False)
    np.testing.assert_allclose(np.asarray(lg[:, 0]), np.asarray(pair), atol=1e-5)


def test_static_frames_propagation_consistency(tiny_accel):
    """On a static clip (identical frames), zero-init flow keeps the warped
    reference exactly equal to the keyframe reference -> all frames of a
    group produce identical logits."""
    m, variables = tiny_accel
    img = jax.random.normal(jax.random.PRNGKey(8), (1, 128, 128, 3)) * 0.1
    clip = jnp.repeat(img[:, None], 4, axis=1)
    lg = clip_logits(m, variables, clip, interval=4)
    for f in range(1, 4):
        np.testing.assert_allclose(
            np.asarray(lg[:, f]), np.asarray(lg[:, 0]), atol=1e-4
        )


def test_pair_loss_finite_and_decreases_on_step(tiny_accel):
    m, variables = tiny_accel
    rng = jax.random.PRNGKey(1)
    batch = {
        "data": jax.random.normal(rng, (1, 128, 128, 3)) * 0.1,
        "data_ref": jax.random.normal(rng, (1, 128, 128, 3)) * 0.1,
        "eq_flag": jnp.zeros((1,)),
        "label": jax.random.randint(jax.random.PRNGKey(2), (1, 128, 128), 0, 19),
    }
    loss = float(pair_loss(m, variables, batch, 19))
    assert np.isfinite(loss)
    # one SGD step on params lowers the loss
    grads = jax.grad(
        lambda p: pair_loss(
            m, {"params": p, "batch_stats": variables["batch_stats"]}, batch, 19
        )
    )(variables["params"])
    new_params = jax.tree.map(lambda p, g: p - 0.5 * g, variables["params"], grads)
    loss2 = float(
        pair_loss(
            m, {"params": new_params, "batch_stats": variables["batch_stats"]},
            batch, 19,
        )
    )
    assert loss2 < loss


def test_direct_mode_matches_pair_training_objective(tiny_accel):
    """Regression for the round-1 eval bug: a pair-trained model must be
    evaluated with 'direct' propagation — frame i of a group equals the
    training pair forward (cur=frame_i, key=frame_0). 'incremental' mode
    under the reference's PRODUCT cascade re-applies the scale field per
    step and diverges once the scale is not identity (it compounds),
    which silently destroyed eval mIoU. Pinned to scale_cascade='product'
    — the semantics this regression documents — after the r5 default
    flipped to 'last' (which removes exactly that compounding)."""
    m, variables = tiny_accel
    m = m.clone(scale_cascade="product")
    # perturb the flow + scale heads so the warp/scale path is non-trivial
    import flax

    params = flax.core.unfreeze(jax.tree.map(lambda x: x, variables["params"]))
    fn = params["flownet"]
    fn["scale_field"]["bias"] = fn["scale_field"]["bias"] * 0.0 + 0.7
    fn["predict_flow2"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(9), fn["predict_flow2"]["kernel"].shape) * 0.1
    )
    v2 = dict(variables)
    v2["params"] = params

    clip = jax.random.normal(jax.random.PRNGKey(10), (1, 3, 128, 128, 3)) * 0.1
    lg_direct = clip_logits(m, v2, clip, interval=3, propagate="direct")
    # frame 2 via the training pair forward (eq=0: key=frame0, cur=frame2)
    pair = m.apply(v2, clip[:, 2], clip[:, 0], jnp.zeros((1,)), train=False)
    np.testing.assert_allclose(
        np.asarray(lg_direct[:, 2]), np.asarray(pair), atol=2e-3
    )
    # incremental differs at frame 2 (scale applied twice)
    lg_inc = clip_logits(m, v2, clip, interval=3, propagate="incremental")
    assert np.abs(np.asarray(lg_inc[:, 2]) - np.asarray(lg_direct[:, 2])).max() > 1e-3


def test_aux_loss_supervises_branches(tiny_accel):
    from accel_tpu.core.pipeline import pair_loss_and_stats

    m, variables = tiny_accel
    rng = jax.random.PRNGKey(2)
    batch = {
        "data": jax.random.normal(rng, (1, 128, 128, 3)) * 0.1,
        "data_ref": jax.random.normal(rng, (1, 128, 128, 3)) * 0.1,
        "eq_flag": jnp.zeros((1,)),
        "label": jax.random.randint(jax.random.PRNGKey(3), (1, 128, 128), 0, 19),
    }
    l0, _ = pair_loss_and_stats(m, variables, batch, 19, aux_weight=0.0)
    l1, _ = pair_loss_and_stats(m, variables, batch, 19, aux_weight=0.5)
    assert float(l1) > float(l0)  # aux terms add supervised signal
    assert np.isfinite(float(l1))


def test_nearest_pred_upsample_mode(tiny_accel):
    m, variables = tiny_accel
    clip = jax.random.normal(jax.random.PRNGKey(11), (1, 2, 128, 128, 3)) * 0.1
    ref = clip_predictions(m, variables, clip, 2, "direct")
    fast = clip_predictions(m, variables, clip, 2, "direct", upsample="nearest_pred")
    assert fast.shape == ref.shape and fast.dtype == ref.dtype
    # with random weights logits are near-ties, so the two upsampling modes
    # disagree often; just check substantial overlap + mechanics (trained
    # models agree away from class boundaries)
    assert (np.asarray(fast) == np.asarray(ref)).mean() > 0.5


def test_clip_loss_grad_flows_through_cascade(tiny_accel):
    """Clip-unrolled objective (VERDICT r1 #5): the annotated frame's CE
    must backprop through the cascaded warps — nonzero flow-head gradients
    even when only the LAST frame of the clip carries labels."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from accel_tpu.core.pipeline import clip_loss_and_stats

    m, variables = tiny_accel
    rng = np.random.default_rng(0)
    B, F, H, W = 1, 3, 128, 128
    clip = jnp.asarray(rng.standard_normal((B, F, H, W, 3)), jnp.float32) * 0.3
    label = np.full((B, F, H, W), 255, np.int32)
    label[:, -1] = rng.integers(0, 19, (B, H, W))
    batch = {"clip": clip, "label": jnp.asarray(label)}

    def loss_fn(params):
        v = dict(variables)
        v["params"] = params
        return clip_loss_and_stats(m, v, batch, 19, propagate="incremental")[0]

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    flow_g = grads["flownet"]
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(flow_g))
    assert gnorm > 0, "no gradient reached the flow network through the cascade"
    upd_g = grads["update_net"]
    assert sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(upd_g)) > 0


def test_clip_objective_train_step(tiny_accel):
    """One train step with objective='clip' on a TrainClipLoader-shaped
    batch runs and updates params."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from accel_tpu.config import default_config
    from accel_tpu.core.trainer import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    m, variables = tiny_accel
    # deep-copy: the train step donates its input state's buffers, and the
    # fixture is session-scoped
    variables = jax.tree.map(jnp.array, variables)
    cfg = default_config()
    tx, _ = make_optimizer(cfg, 10)
    state = init_train_state(m, variables, tx)
    step = make_train_step(
        m, tx, 19, objective="clip", propagate="incremental", aux_weight=0.25
    )
    rng = np.random.default_rng(1)
    label = np.full((1, 3, 128, 128), 255, np.int32)
    label[:, 1] = rng.integers(0, 19, (1, 128, 128))
    batch = {
        "clip": jnp.asarray(rng.standard_normal((1, 3, 128, 128, 3)), jnp.float32),
        "label": jnp.asarray(label),
    }
    before = [np.asarray(x).copy()
              for x in jax.tree.leaves(state.variables["params"]["flownet"])]
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    after = jax.tree.leaves(new_state.variables["params"]["flownet"])
    moved = sum(float(np.abs(np.asarray(a) - b).max()) for a, b in zip(after, before))
    assert moved > 0


def test_scale_field_mean1_gain_invariance(tiny_accel):
    """scale_field_norm='mean1' makes the warp invariant to the scale
    field's global gain — the degenerate direction that miscalibrates the
    un-warped keyframe/eq path through the shared head (offset-0 cliff,
    see BASELINE.md hard-synth findings)."""
    from accel_tpu.models.accel import AccelNet

    m, variables = tiny_accel
    m1 = AccelNet(
        family="accel", ref_depth=18, update_depth=18, num_classes=19,
        feat_stride=16, head_channels=32, dtype=jnp.float32,
        use_pallas_warp=False, scale_field_norm="mean1",
    )
    rng = jax.random.PRNGKey(0)
    prop = jax.random.normal(rng, (1, 8, 8, 19))
    flow = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 2)) * 0.5
    scale = 1.0 + 0.3 * jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 19))

    out_a = m1.apply(variables, prop, flow, scale, method="warp")
    out_b = m1.apply(variables, prop, flow, scale * 7.3, method="warp")
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-4)
    # and the raw ('none') semantics are gain-covariant, as in the reference
    out_c = m.apply(variables, prop, flow, scale, method="warp")
    out_d = m.apply(variables, prop, flow, scale * 7.3, method="warp")
    assert np.abs(np.asarray(out_d) - 7.3 * np.asarray(out_c)).max() < 1e-3


def test_chunked_group_step_is_exact(tiny_accel, monkeypatch):
    """Forcing the full-res chunking path (MAX_FULLRES_FRAMES_PER_DISPATCH
    below B*k) must reproduce the unchunked direct-mode group step bit-near:
    every chunked op is per-frame, so lax.map sequencing is exact."""
    import accel_tpu.core.pipeline as pl

    m, variables = tiny_accel
    clip = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 128, 128, 3)) * 0.1
    ref = clip_logits(m, variables, clip, interval=4, propagate="direct")
    monkeypatch.setattr(pl, "MAX_FULLRES_FRAMES_PER_DISPATCH", 2)
    chunked = clip_logits(m, variables, clip, interval=4, propagate="direct")
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(ref), atol=1e-6)


def test_incremental_batched_matches_sequential(tiny_accel):
    """The batched incremental group step (r3: one FlowNet call on all
    consecutive pairs + batched heads, sequential only in the warp cascade)
    must reproduce the sequential form (reached via remat=True) exactly —
    same ops, batched."""
    m, variables = tiny_accel
    clip = jax.random.normal(jax.random.PRNGKey(21), (2, 4, 128, 128, 3)) * 0.1
    batched = clip_logits(m, variables, clip, 4, propagate="incremental",
                          remat=False)
    sequential = clip_logits(m, variables, clip, 4, propagate="incremental",
                             remat=True)
    np.testing.assert_allclose(
        np.asarray(batched), np.asarray(sequential), atol=2e-5
    )


def test_input_scale_matches_premultiplied_clip(tiny_accel):
    """clip_logits(clip, input_scale=s) must equal clip_logits(clip * s):
    the scale is applied at every point of consumption instead of
    materializing the product (the bench harness relies on this to avoid
    staging a whole scaled clip — the measured B=8 OOM, BASELINE.md).
    Covers the batched direct path, the batched incremental path, and
    the remat'd (sequential) direct path."""
    m, variables = tiny_accel
    clip = jax.random.normal(jax.random.PRNGKey(9), (2, 4, 128, 128, 3)) * 0.1
    s = jnp.float32(1.37)
    for propagate, remat in (("direct", False), ("incremental", False),
                             ("direct", True)):
        ref = clip_logits(m, variables, clip * s, 4, propagate, remat)
        out = clip_logits(m, variables, clip, 4, propagate, remat,
                          input_scale=s)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5,
            err_msg=f"propagate={propagate} remat={remat}",
        )


# ---- composed-flow propagation (r3) ----------------------------------------


def test_composed_equals_direct_at_k2(tiny_accel):
    """With one non-key frame there is nothing to compose: composed ==
    direct == incremental exactly (same single flow/warp)."""
    m, variables = tiny_accel
    clip = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 128, 128, 3)) * 0.1
    lg_c = clip_logits(m, variables, clip, interval=2, propagate="composed")
    lg_d = clip_logits(m, variables, clip, interval=2, propagate="direct")
    np.testing.assert_allclose(np.asarray(lg_c), np.asarray(lg_d), atol=1e-5)


def test_composed_static_clip_consistency(tiny_accel):
    """Static frames -> zero-init flow -> composition of zero flows is zero
    flow: every frame of the group matches the keyframe logits."""
    m, variables = tiny_accel
    img = jax.random.normal(jax.random.PRNGKey(8), (1, 128, 128, 3)) * 0.1
    clip = jnp.repeat(img[:, None], 4, axis=1)
    lg = clip_logits(m, variables, clip, interval=4, propagate="composed")
    for f in range(1, 4):
        np.testing.assert_allclose(
            np.asarray(lg[:, f]), np.asarray(lg[:, 0]), atol=1e-4
        )


def test_compose_fields_translation_math(tiny_accel):
    """Composing constant integer translations sums them: k steps of
    (dx=1, dy=0) compose to (i+1, 0) in the interior (boundary cells
    zero-pad away, matching cascaded-warp semantics)."""
    from accel_tpu.core.pipeline import _compose_fields

    m, variables = tiny_accel
    B, k1, h, w = 1, 3, 8, 8
    flow = jnp.zeros((B, k1, h, w, 2)).at[..., 0].set(1.0)
    scale = jnp.ones((B, k1, h, w, 19))
    cflow, cscale = _compose_fields(m, variables, flow, scale)
    for i in range(k1):
        # interior columns: composed dx == i+1 (column x samples x+1, which
        # itself accumulated i more steps); cells whose source ran off the
        # right edge zero-pad
        interior = np.asarray(cflow[0, i, :, : w - 1 - i, 0])
        np.testing.assert_allclose(interior, i + 1, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cflow[..., 1]), 0.0, atol=1e-5)


def test_composed_batched_matches_sequential_remat(tiny_accel):
    """The batched composed group step must bit-match the sequential
    (remat) form — same contract the other two modes have."""
    m, variables = tiny_accel
    clip = jax.random.normal(jax.random.PRNGKey(11), (2, 4, 128, 128, 3)) * 0.1
    lg_b = clip_logits(m, variables, clip, interval=4, propagate="composed")
    lg_s = clip_logits(m, variables, clip, interval=4, propagate="composed",
                       remat=True)
    np.testing.assert_allclose(
        np.asarray(lg_b), np.asarray(lg_s), atol=1e-4, rtol=1e-4
    )


def test_composed_clip_loss_trains(tiny_accel):
    """clip objective under composed propagation: finite loss, finite grads
    through the field-composition cascade."""
    from accel_tpu.core.pipeline import clip_loss_and_stats

    m, variables = tiny_accel
    rng = np.random.default_rng(0)
    batch = {
        "clip": jnp.asarray(rng.standard_normal((1, 4, 128, 128, 3)), jnp.float32) * 0.1,
        "label": jnp.asarray(rng.integers(0, 19, (1, 4, 128, 128)), jnp.int32),
    }

    def loss_fn(v):
        out = clip_loss_and_stats(m, v, batch, 19, propagate="composed")
        return out[0] if isinstance(out, tuple) else out

    loss, grads = jax.value_and_grad(loss_fn)(variables)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)


# ---- scale_cascade interventions (r4) ---------------------------------------
# BASELINE.md extreme finding 7 isolated the incremental-vs-direct far-offset
# gap to the COMPOUNDING per-step scale product; network.scale_cascade carries
# the attacks on that mechanism (mean1 / clamp / last).


def test_cascade_post_semantics():
    from accel_tpu.core.pipeline import _CASCADE_CLAMP, _cascade_post

    x = jnp.asarray(
        np.random.default_rng(0).uniform(0.1, 5.0, (2, 4, 4, 3)), jnp.float32
    )
    m1 = _cascade_post(x, "mean1")
    np.testing.assert_allclose(
        np.asarray(jnp.mean(m1, axis=(1, 2, 3))), 1.0, atol=1e-5
    )
    cl = np.asarray(_cascade_post(x, "clamp"))
    assert cl.min() >= 1.0 / _CASCADE_CLAMP - 1e-6
    assert cl.max() <= _CASCADE_CLAMP + 1e-6
    np.testing.assert_array_equal(
        np.asarray(_cascade_post(x, "product")), np.asarray(x)
    )


def test_scale_cascade_last_equals_product_at_k2(tiny_accel):
    """One cascade step: nothing has compounded yet, and 'last' applies
    exactly the step's (norm'd) field — identical to the baked product."""
    m, variables = tiny_accel
    clip = jax.random.normal(jax.random.PRNGKey(31), (1, 2, 128, 128, 3)) * 0.1
    ref = clip_logits(m, variables, clip, 2, propagate="incremental")
    out = clip_logits(
        m.clone(scale_cascade="last"), variables, clip, 2,
        propagate="incremental",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_scale_cascade_batched_matches_remat(tiny_accel):
    """Every cascade mode: the batched incremental/composed group steps must
    reproduce their sequential (remat) forms — same contract as 'product'."""
    m, variables = tiny_accel
    clip = jax.random.normal(jax.random.PRNGKey(33), (2, 4, 128, 128, 3)) * 0.1
    for mode in ("mean1", "clamp", "last"):
        mm = m.clone(scale_cascade=mode)
        for propagate in ("incremental", "composed"):
            b = clip_logits(mm, variables, clip, 4, propagate=propagate)
            s = clip_logits(mm, variables, clip, 4, propagate=propagate,
                            remat=True)
            assert np.all(np.isfinite(np.asarray(b))), (mode, propagate)
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(s), atol=1e-4, rtol=1e-4,
                err_msg=f"mode={mode} propagate={propagate}",
            )


def test_scale_cascade_modes_differ_beyond_k2(tiny_accel):
    """At k>=3 the interventions actually change the cascade (guards against
    the knob silently mapping to 'product'). A randomly-initialized FlowNet
    predicts zero flow and scale==1 (heads zero-init), where every mode
    coincides — so drive _compose_fields with synthetic non-uniform fields."""
    from accel_tpu.core.pipeline import _compose_fields

    m, variables = tiny_accel
    rng = np.random.default_rng(5)
    B, k1, h, w = 1, 3, 8, 8
    flow = jnp.asarray(rng.uniform(-0.5, 0.5, (B, k1, h, w, 2)), jnp.float32)
    scale = jnp.asarray(
        np.exp(rng.normal(0, 0.6, (B, k1, h, w, 19))), jnp.float32
    )
    outs = {}
    for mode in ("product", "mean1", "clamp", "last"):
        _, cs = _compose_fields(
            m.clone(scale_cascade=mode), variables, flow, scale
        )
        outs[mode] = np.asarray(cs)
    for mode in ("mean1", "clamp", "last"):
        assert np.abs(outs[mode][:, -1] - outs["product"][:, -1]).max() > 1e-4, mode
    # the interventions hold their invariants on the LAST composed entry
    np.testing.assert_allclose(outs["mean1"][:, -1].mean(), 1.0, atol=1e-3)
    assert outs["clamp"][:, -1].max() <= 2.0 + 1e-5
    assert outs["clamp"][:, -1].min() >= 0.5 - 1e-5


@pytest.mark.parametrize("mode", ["mean1", "last"])
def test_scale_cascade_clip_loss_trains(tiny_accel, mode):
    """clip objective through a cascade intervention: finite loss + grads
    (a training arm through the fixed cascade must be viable — 'last' is
    the shipped-default candidate trained by the r4 follow-up arm)."""
    from accel_tpu.core.pipeline import clip_loss_and_stats

    m, variables = tiny_accel
    rng = np.random.default_rng(3)
    batch = {
        "clip": jnp.asarray(
            rng.standard_normal((1, 4, 128, 128, 3)), jnp.float32
        ) * 0.1,
        "label": jnp.asarray(rng.integers(0, 19, (1, 4, 128, 128)), jnp.int32),
    }
    mm = m.clone(scale_cascade=mode)

    def loss_fn(v):
        return clip_loss_and_stats(
            mm, v, batch, 19, propagate="incremental", remat=True
        )[0]

    loss, grads = jax.value_and_grad(loss_fn)(variables)
    assert np.isfinite(float(loss))
    assert all(
        np.all(np.isfinite(np.asarray(g)))
        for g in jax.tree_util.tree_leaves(grads)
    )
