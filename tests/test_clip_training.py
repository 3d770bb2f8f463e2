"""End-to-end regression for the clip-unrolled training objective
(VERDICT r1 #5): a model *trained* through the cascaded warps must no
longer collapse when *evaluated* with incremental (frame-to-frame)
propagation — the reference Accel's eval semantics (SURVEY.md §3.3,
Appendix B).

Round-1 background: pair-trained scale fields compound under cascade
(mIoU 98 -> 3, eval acc 2.6%), which forced eval to 'direct'. This test
starts from a deliberately non-identity scale field (bias 0.7 — the exact
compounding failure mode, cf. test_direct_mode_matches_pair_training_
objective), trains ~30 steps with ``clip_loss_and_stats`` on a moving
synthetic scene, and asserts incremental eval works. Deterministic seeds.
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np

from accel_tpu.core.pipeline import clip_loss_and_stats, clip_predictions

H = W = 128
F = 3
NC = 19


def _make_clips(rng, B):
    """Moving 3-band scene (band value + noise texture, up to 3 px/frame
    horizontal translation). Returns (clips (B,F,H,W,3), labels (B,F,H,W))."""
    clips = np.empty((B, F, H, W, 3), np.float32)
    labels = np.empty((B, F, H, W), np.int32)
    for b in range(B):
        base = np.zeros((H, W, 3), np.float32)
        lab = np.zeros((H, W), np.int32)
        thirds = [0, W // 3, 2 * W // 3, W]
        vals = [(-0.8, 0.2, 0.5), (0.6, -0.4, 0.1), (0.0, 0.7, -0.6)]
        for c in range(3):
            base[:, thirds[c] : thirds[c + 1]] = vals[c]
            lab[:, thirds[c] : thirds[c + 1]] = c
        base += rng.normal(0, 0.15, base.shape).astype(np.float32)
        shift0 = int(rng.integers(0, W))
        v = int(rng.integers(-3, 4))
        for f in range(F):
            s = shift0 + v * f
            clips[b, f] = np.roll(base, s, axis=1)
            labels[b, f] = np.roll(lab, s, axis=1)
    return clips, labels


def test_clip_trained_model_survives_incremental_eval(tiny_accel):
    import optax

    m, variables0 = tiny_accel
    # fresh copies (session fixture) + the known-corrupting scale init
    params = flax.core.unfreeze(jax.tree.map(jnp.array, variables0["params"]))
    params["flownet"]["scale_field"]["bias"] = (
        params["flownet"]["scale_field"]["bias"] * 0.0 + 0.7
    )
    extras = {k: v for k, v in variables0.items() if k != "params"}

    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.sgd(0.02, momentum=0.9))
    opt_state = tx.init(params)

    def loss_fn(params, batch):
        v = {**extras, "params": params}
        return clip_loss_and_stats(
            m, v, batch, NC, propagate="incremental"
        )[0]

    @jax.jit
    def step(params, opt_state, batch):
        loss, g = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def eval_acc(params, propagate):
        r = np.random.default_rng(1234)
        clips, labels = _make_clips(r, 2)
        pred = clip_predictions(
            m, {**extras, "params": params}, jnp.asarray(clips), F, propagate
        )
        return float((np.asarray(pred) == labels).mean())

    acc_pre = eval_acc(params, "incremental")

    rng = np.random.default_rng(0)
    B = 2
    for i in range(30):
        clips, labels = _make_clips(rng, B)
        # one annotated frame per clip (TrainClipLoader contract): 255
        # everywhere else, so the loss reaches it only through the cascade
        lab = np.full_like(labels, 255)
        for b in range(B):
            f = int(rng.integers(0, F))
            lab[b, f] = labels[b, f]
        batch = {"clip": jnp.asarray(clips), "label": jnp.asarray(lab)}
        params, opt_state, loss = step(params, opt_state, batch)
    assert np.isfinite(float(loss))

    acc_inc = eval_acc(params, "incremental")
    acc_dir = eval_acc(params, "direct")
    # collapse signature was acc ~0.03-0.04 (r1: 2.6%); trained-through-
    # cascade must be high in absolute terms AND track direct mode
    assert acc_inc > 0.5, f"incremental eval collapsed: {acc_inc:.3f} (pre {acc_pre:.3f})"
    assert acc_inc > 0.7 * acc_dir, (
        f"incremental ({acc_inc:.3f}) lags direct ({acc_dir:.3f}) — cascade "
        "training objective regressed"
    )


def test_remat_clip_objective_matches_exactly(tiny_accel):
    """TRAIN.remat is a scheduling/memory change only: loss and gradients
    of the clip objective must match the non-remat path (jax.checkpoint
    recomputes the same forwards)."""
    import numpy as np

    m, variables = tiny_accel
    rng = jax.random.PRNGKey(11)
    clip = jax.random.normal(rng, (1, 3, 128, 128, 3)) * 0.1
    label = np.full((1, 3, 128, 128), 255, np.int32)
    label[:, 1, 32:96, 32:96] = 4
    batch = {"clip": clip, "label": jnp.asarray(label)}

    def loss_of(params, remat):
        v = dict(variables)
        v["params"] = params
        loss, _ = clip_loss_and_stats(
            m, v, batch, num_classes=19, propagate="incremental", remat=remat
        )
        return loss

    p = variables["params"]
    l0, g0 = jax.value_and_grad(lambda p: loss_of(p, False))(p)
    l1, g1 = jax.value_and_grad(lambda p: loss_of(p, True))(p)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_remat_direct_mode_matches_batched_path(tiny_accel):
    """remat in direct mode forces the sequential group step; it must
    reproduce the batched fast path's logits."""
    import numpy as np
    from accel_tpu.core.pipeline import clip_logits

    m, variables = tiny_accel
    clip = jax.random.normal(jax.random.PRNGKey(12), (1, 4, 128, 128, 3)) * 0.1
    a = clip_logits(m, variables, clip, 4, propagate="direct", remat=False)
    b = clip_logits(m, variables, clip, 4, propagate="direct", remat=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
