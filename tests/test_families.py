"""Model-family coverage: dff (feature warp) and per-frame deeplab through
the clip pipeline (the accel family is covered everywhere else)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accel_tpu.core.pipeline import clip_logits, pair_loss
from accel_tpu.models.accel import AccelNet


@pytest.fixture(scope="module")
def tiny_dff():
    m = AccelNet(family="dff", ref_depth=18, num_classes=19, feat_stride=16,
                 head_channels=32, dtype=jnp.float32, use_pallas_warp=False)
    img = jnp.zeros((1, 128, 128, 3))
    v = m.init(jax.random.PRNGKey(0), img, img, jnp.ones((1,)), train=False)
    return m, v


def test_dff_propagates_features(tiny_dff):
    m, v = tiny_dff
    assert m.warp_tensor == "features"
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 128, 3)) * 0.1
    prop = m.apply(v, img, method="ref_propagated")
    assert prop.shape == (1, 8, 8, 32)  # fc6 features, not scores
    scores = m.apply(v, prop, method="ref_scores_from_propagated")
    assert scores.shape == (1, 8, 8, 19)


def test_dff_clip_direct_mode(tiny_dff):
    m, v = tiny_dff
    clip = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 128, 128, 3)) * 0.1
    lg = clip_logits(m, v, clip, interval=4, propagate="direct")
    assert lg.shape == (1, 4, 8, 8, 19)
    # static clip + zero-init flow: all frames identical to keyframe output
    static = jnp.repeat(clip[:, :1], 4, axis=1)
    lg_s = clip_logits(m, v, static, interval=4, propagate="direct")
    for f in range(1, 4):
        np.testing.assert_allclose(
            np.asarray(lg_s[:, f]), np.asarray(lg_s[:, 0]), atol=1e-4
        )


def test_dff_train_loss(tiny_dff):
    m, v = tiny_dff
    rng = jax.random.PRNGKey(3)
    batch = {
        "data": jax.random.normal(rng, (1, 128, 128, 3)) * 0.1,
        "data_ref": jax.random.normal(rng, (1, 128, 128, 3)) * 0.1,
        "eq_flag": jnp.zeros((1,)),
        "label": jnp.zeros((1, 128, 128), jnp.int32),
    }
    assert np.isfinite(float(pair_loss(m, v, batch, 19)))


def test_deeplab_family_clip():
    m = AccelNet(family="deeplab", ref_depth=18, num_classes=19,
                 head_channels=32, dtype=jnp.float32, use_pallas_warp=False)
    img = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), img, img, jnp.ones((1,)), train=False)
    clip = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 64, 64, 3)) * 0.1
    # deeplab ignores the interval (every frame is a keyframe)
    lg = clip_logits(m, v, clip, interval=3)
    assert lg.shape == (1, 3, 4, 4, 19)
    per_frame = m.apply(v, clip[:, 1], method="ref_propagated")
    np.testing.assert_allclose(np.asarray(lg[:, 1]), np.asarray(per_frame), atol=1e-5)
