"""Fused-tap Pallas dilated conv (ops/dilated_pallas.py) exactness.

The kernel computes the same MACs as the direct ``rhs_dilation`` lowering
with f32 accumulation (like XLA's own TPU conv emitter), so eligible
shapes must match the lax oracle to float tolerance — forward AND both
gradients — and ineligible calls must fall through to the plain lowering.
Runs in Pallas interpreter mode on the CPU test backend; the same code
path compiles on TPU (measured in tools/bench_dilated_conv.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accel_tpu.ops.dilated_pallas import (
    _eligible,
    pallas_conv_general_dilated,
)


def _direct(x, w, d, strides=(1, 1), pad=None):
    pad = pad if pad is not None else [(d, d), (d, d)]
    return jax.lax.conv_general_dilated(
        x, w, strides, pad, rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _pallas(x, w, d, strides=(1, 1), pad=None):
    pad = pad if pad is not None else [(d, d), (d, d)]
    return pallas_conv_general_dilated(
        x, w, strides, pad, rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


# channel counts are multiples of the f32 tile caps (128) so the kernel
# path (not the fallback) is exercised; spatial dims exercise R=8 blocks
# at every model dilation, including d == R (the halo-window edge case)
ELIGIBLE = [
    (1, 16, 32, 128, 128, 2),
    (2, 16, 32, 256, 128, 4),
    (1, 24, 32, 128, 256, 6),
    (1, 16, 16, 128, 128, 8),   # d == R: window spans exactly 3 row-blocks
]


@pytest.mark.parametrize("b,h,w_,ci,co,d", ELIGIBLE)
def test_pallas_matches_direct(b, h, w_, ci, co, d):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w_, ci)), jnp.float32)
    ker = jnp.asarray(
        rng.standard_normal((3, 3, ci, co)) / np.sqrt(9 * ci), jnp.float32
    )
    assert _eligible(x, ker, d), "guard should admit this shape"
    ref = np.asarray(_direct(x, ker, d))
    got = np.asarray(_pallas(x, ker, d))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_pallas_bf16_matches_f32_oracle():
    rng = np.random.default_rng(1)
    x32 = rng.standard_normal((1, 16, 32, 128)).astype(np.float32)
    k32 = (rng.standard_normal((3, 3, 128, 128)) / np.sqrt(9 * 128)).astype(
        np.float32
    )
    ref = np.asarray(_direct(jnp.asarray(x32), jnp.asarray(k32), 2))
    got = np.asarray(
        _pallas(jnp.asarray(x32, jnp.bfloat16), jnp.asarray(k32, jnp.bfloat16), 2),
        np.float32,
    )
    # bf16 operands, f32 accumulation: error bounded by input quantization
    assert np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-6) < 0.04


def test_pallas_grads_match_direct():
    rng = np.random.default_rng(2)
    d = 2
    x = jnp.asarray(rng.standard_normal((1, 16, 32, 128)), jnp.float32)
    ker = jnp.asarray(
        rng.standard_normal((3, 3, 128, 128)) / np.sqrt(9 * 128), jnp.float32
    )

    def loss(conv):
        return lambda x, k: jnp.sum(jnp.sin(conv(x, k, d)))

    ga = jax.grad(loss(_direct), (0, 1))(x, ker)
    gb = jax.grad(loss(_pallas), (0, 1))(x, ker)
    for name, a, b in zip(("dx", "dw"), ga, gb):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-4, err_msg=name
        )


def test_pallas_fallback_paths_match_lax():
    """Every guard rejection must produce exactly the lax result."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 16, 32, 128)), jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((3, 3, 128, 64)) * 0.1, jnp.float32)

    # 1x1 (not 3x3)
    y = pallas_conv_general_dilated(
        x, k3[1:2, 1:2], (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    ref = jax.lax.conv_general_dilated(
        x, k3[1:2, 1:2], (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))

    # strided
    y = _pallas(x, k3, 2, strides=(2, 2))
    ref = _direct(x, k3, 2, strides=(2, 2))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))

    # undilated
    y = _pallas(x, k3, 1, pad=[(1, 1), (1, 1)])
    ref = _direct(x, k3, 1, pad=[(1, 1), (1, 1)])
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))

    # tile-unfriendly channel count
    xr = x[..., :100]
    kr = jnp.asarray(rng.standard_normal((3, 3, 100, 60)) * 0.1, jnp.float32)
    assert not _eligible(xr, kr, 2)
    y = _pallas(xr, kr, 2)
    ref = _direct(xr, kr, 2)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))

    # rows not divisible by the row-block
    xo = jnp.asarray(rng.standard_normal((1, 12, 32, 128)), jnp.float32)
    assert not _eligible(xo, k3, 2)
    y = _pallas(xo, k3, 2)
    ref = _direct(xo, k3, 2)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_resnet_pallas_knob_matches_direct():
    """network.dilated_conv='pallas' through the flax hook: same params,
    same outputs as the direct lowering on a dilated stage."""
    from accel_tpu.models.resnet import BasicBlock

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 16, 32, 128)), jnp.float32)
    kw = dict(width=128, dilation=2, norm="frozenbn", dtype=jnp.float32)
    m_direct = BasicBlock(dilated_conv="direct", **kw)
    m_pallas = BasicBlock(dilated_conv="pallas", **kw)
    variables = m_direct.init(jax.random.PRNGKey(0), x)
    a = m_direct.apply(variables, x)
    b = m_pallas.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-4
    )


def test_deeplab_pallas_fc6_knob_matches_auto():
    """dilated_conv='pallas_fc6' (nine-tap kernel on the atrous HEAD only,
    direct backbone — the surgical mode for the DFF non-key head) must
    reproduce the default lowering with the same params."""
    from accel_tpu.models.deeplab import DeepLab

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32) * 0.1
    kw = dict(depth=18, num_classes=19, output_stride=16, head_channels=128,
              head_dilation=6, norm="frozenbn", dtype=jnp.float32)
    m_auto = DeepLab(dilated_conv="auto", **kw)
    m_fc6 = DeepLab(dilated_conv="pallas_fc6", **kw)
    variables = m_auto.init(jax.random.PRNGKey(0), x)
    a = m_auto.apply(variables, x)
    b = m_fc6.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-4
    )
