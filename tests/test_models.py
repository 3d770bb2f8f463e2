import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accel_tpu.models.deeplab import DeepLab
from accel_tpu.models.flownet import FlowNetS
from accel_tpu.models.resnet import DilatedResNet


@pytest.mark.parametrize("depth,expect_c5", [(18, 512), (50, 2048)])
def test_resnet_shapes(depth, expect_c5):
    m = DilatedResNet(depth=depth, output_stride=16, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 4, 4, expect_c5)  # stride 16


def test_resnet_output_stride_8():
    m = DilatedResNet(depth=18, output_stride=8, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape[1:3] == (8, 8)


def test_deeplab_logits_shape_and_dtype():
    m = DeepLab(depth=18, num_classes=19, output_stride=16,
                head_channels=32, dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 4, 4, 19)
    assert y.dtype == jnp.float32
    full = m.apply(v, x, method="predict_full")
    assert full.shape == (2, 64, 64, 19)


def test_flownet_zero_init_flow_identity_scale():
    m = FlowNetS(scale_channels=19, dtype=jnp.float32)
    pair = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 6))
    v = m.init(jax.random.PRNGKey(0), pair)
    flow, scale = m.apply(v, pair)
    assert flow.shape == (1, 16, 16, 2)
    assert scale.shape == (1, 16, 16, 19)
    # zero-init heads: identity warp + identity modulation at init
    np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(scale), 1.0, atol=1e-6)


def test_fusion_init_is_average(tiny_accel):
    m, variables = tiny_accel
    rng = jax.random.PRNGKey(3)
    a = jax.random.normal(rng, (1, 8, 8, 19))
    b = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 19))
    fused = m.apply(variables, a, b, method="fuse")
    np.testing.assert_allclose(np.asarray(fused), np.asarray((a + b) / 2), atol=1e-5)


def test_pair_forward_eq_flag_uses_direct_path(tiny_accel):
    m, variables = tiny_accel
    img = jax.random.normal(jax.random.PRNGKey(5), (1, 128, 128, 3)) * 0.1
    # eq pair: cur == key, eq_flag=1 -> logits = fuse(ref_scores, update_scores)
    out = m.apply(variables, img, img, jnp.ones((1,)), train=False)
    ref = m.apply(variables, img, method="ref_propagated")
    upd = m.apply(variables, img, method="update_scores")
    fused = m.apply(variables, ref, upd, method="fuse")
    np.testing.assert_allclose(np.asarray(out), np.asarray(fused), atol=1e-5)
