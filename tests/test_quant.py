"""int8 serving quantization (ops/quant.py) correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from accel_tpu.ops.quant import int8_conv_general_dilated, quantize_symmetric


def test_quantize_symmetric_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 4, 8, 16)), jnp.float32)
    q, s = quantize_symmetric(x, axis=(3,))
    assert q.dtype == jnp.int8
    assert s.shape == (1, 1, 1, 16)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(x)).max()
    # worst-case quant step is max|w|/127 per channel
    step = (np.abs(np.asarray(x)).max(axis=(0, 1, 2)) / 127.0).max()
    assert err <= step * 0.5 + 1e-6


def test_int8_conv_close_to_float():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 24)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 24, 32)) * 0.1, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = int8_conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    rel = np.abs(np.asarray(got) - np.asarray(ref)).max() / np.abs(np.asarray(ref)).max()
    assert rel < 0.03, f"relative error {rel}"
    # strided + dilated variants keep the same geometry as the float path
    for kwargs in ({"window_strides": (2, 2)}, {"rhs_dilation": (2, 2)}):
        ws = kwargs.pop("window_strides", (1, 1))
        ref = jax.lax.conv_general_dilated(
            x, w, ws, "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"), **kwargs
        )
        got = int8_conv_general_dilated(
            x, w, ws, "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"), **kwargs
        )
        assert got.shape == ref.shape
        rel = np.abs(np.asarray(got) - np.asarray(ref)).max() / np.abs(np.asarray(ref)).max()
        assert rel < 0.03


def test_quantized_backbone_forward_close():
    """quantize=True must keep the same param tree (checkpoint compat) and
    produce outputs close to the float path."""
    from accel_tpu.models.resnet import DilatedResNet

    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 64, 64, 3)), jnp.float32)
    mf = DilatedResNet(depth=18, output_stride=16, norm="groupnorm", dtype=jnp.float32)
    mq = DilatedResNet(depth=18, output_stride=16, norm="groupnorm", dtype=jnp.float32,
                       quantize=True)
    variables = mf.init(jax.random.PRNGKey(0), x)
    ref = mf.apply(variables, x)
    got = mq.apply(variables, x)  # same tree restores into the quant model
    assert got.shape == ref.shape
    cos = float(
        (ref * got).sum()
        / (jnp.linalg.norm(ref.ravel()) * jnp.linalg.norm(got.ravel()) + 1e-9)
    )
    assert cos > 0.99, f"cosine {cos}"
