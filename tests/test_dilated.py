"""Space-to-batch dilated conv lowering (ops/dilated.py) exactness.

The rewrite computes the same MACs per output pixel as the direct
``rhs_dilation`` lowering, so arrays must match to float tolerance at
every eligible shape — including H/W not divisible by the dilation (the
zero-fill + crop path) — and ineligible calls must fall through to the
plain lowering bit-for-bit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accel_tpu.ops.dilated import (
    s2b_conv_general_dilated,
    shift1x1_conv_general_dilated,
)


def _direct(x, w, d, strides=(1, 1), pad=None):
    pad = pad if pad is not None else [(d, d), (d, d)]
    return jax.lax.conv_general_dilated(
        x, w, strides, pad, rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize(
    "h,w_,d,k",
    [
        (16, 16, 2, 3),   # divisible
        (16, 32, 4, 3),   # divisible, rectangular
        (14, 22, 6, 3),   # NOT divisible by d (zero-fill + crop path)
        (9, 13, 2, 3),    # odd spatial
        (12, 12, 2, 5),   # 5x5 kernel, same padding = 2d
    ],
)
def test_s2b_matches_direct(h, w_, d, k):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, h, w_, 5)), jnp.float32)
    ker = jnp.asarray(rng.standard_normal((k, k, 5, 7)) * 0.2, jnp.float32)
    p = d * (k - 1) // 2
    ref = _direct(x, ker, d, pad=[(p, p), (p, p)])
    got = s2b_conv_general_dilated(
        x, ker, (1, 1), [(p, p), (p, p)], rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_s2b_bf16_matches_direct():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 24, 8)), jnp.bfloat16)
    ker = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.2, jnp.bfloat16)
    ref = np.asarray(_direct(x, ker, 2), np.float32)
    got = np.asarray(
        s2b_conv_general_dilated(
            x, ker, (1, 1), [(2, 2), (2, 2)], rhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        np.float32,
    )
    # identical MACs; only accumulation order can differ
    np.testing.assert_allclose(got, ref, atol=1e-2, rtol=1e-2)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(strides=(2, 2)),                       # strided: ineligible
        dict(rhs_dilation=(1, 1)),                   # dense: ineligible
        dict(rhs_dilation=(2, 3)),                   # anisotropic dilation
        dict(pad=[(0, 0), (0, 0)]),                  # valid padding
    ],
)
def test_fallback_paths_match_lax(kwargs):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 12, 12, 4)), jnp.float32)
    ker = jnp.asarray(rng.standard_normal((3, 3, 4, 6)) * 0.3, jnp.float32)
    strides = kwargs.get("strides", (1, 1))
    dil = kwargs.get("rhs_dilation", (2, 2))
    pad = kwargs.get("pad", [(2, 2), (2, 2)])
    ref = jax.lax.conv_general_dilated(
        x, ker, strides, pad, rhs_dilation=dil,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = s2b_conv_general_dilated(
        x, ker, strides, pad, rhs_dilation=dil,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize(
    "h,w_,d,f",
    [
        (16, 24, 6, 2),   # residual dilation 3
        (18, 24, 6, 3),   # residual dilation 2
        (16, 24, 4, 2),   # residual dilation 2
        (13, 22, 6, 2),   # non-divisible by f (zero-fill + crop)
    ],
)
def test_s2b_partial_factor_matches_direct(h, w_, d, f):
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, h, w_, 5)), jnp.float32)
    ker = jnp.asarray(rng.standard_normal((3, 3, 5, 7)) * 0.2, jnp.float32)
    ref = _direct(x, ker, d)
    got = s2b_conv_general_dilated(
        x, ker, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), _factor=f,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_s2b_non_divisor_factor_falls_back():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 12, 12, 4)), jnp.float32)
    ker = jnp.asarray(rng.standard_normal((3, 3, 4, 4)) * 0.3, jnp.float32)
    ref = _direct(x, ker, 3)
    got = s2b_conv_general_dilated(
        x, ker, (1, 1), [(3, 3), (3, 3)], rhs_dilation=(3, 3),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), _factor=2,  # 3 % 2 != 0
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_s2b_grad_matches_direct():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 10, 14, 3)), jnp.float32)
    ker = jnp.asarray(rng.standard_normal((3, 3, 3, 4)) * 0.3, jnp.float32)

    def loss(fn, x, k):
        y = fn(
            x, k, (1, 1), [(2, 2), (2, 2)], rhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(y * y)

    gx_ref, gk_ref = jax.grad(
        lambda x, k: loss(jax.lax.conv_general_dilated, x, k), argnums=(0, 1)
    )(x, ker)
    gx, gk = jax.grad(
        lambda x, k: loss(s2b_conv_general_dilated, x, k), argnums=(0, 1)
    )(x, ker)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize(
    "h,w_,d,k",
    [
        (16, 16, 2, 3),
        (14, 22, 6, 3),   # spatial not divisible by d
        (9, 13, 2, 3),    # odd spatial
        (12, 12, 2, 5),   # 5x5 kernel
    ],
)
def test_shift1x1_matches_direct(h, w_, d, k):
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, h, w_, 5)), jnp.float32)
    ker = jnp.asarray(rng.standard_normal((k, k, 5, 7)) * 0.2, jnp.float32)
    p = d * (k - 1) // 2
    ref = _direct(x, ker, d, pad=[(p, p), (p, p)])
    got = shift1x1_conv_general_dilated(
        x, ker, (1, 1), [(p, p), (p, p)], rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(strides=(2, 2)),
        dict(rhs_dilation=(1, 1)),
        dict(pad=[(0, 0), (0, 0)]),
    ],
)
def test_shift1x1_fallback_paths_match_lax(kwargs):
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 12, 12, 4)), jnp.float32)
    ker = jnp.asarray(rng.standard_normal((3, 3, 4, 6)) * 0.3, jnp.float32)
    strides = kwargs.get("strides", (1, 1))
    dil = kwargs.get("rhs_dilation", (2, 2))
    pad = kwargs.get("pad", [(2, 2), (2, 2)])
    ref = jax.lax.conv_general_dilated(
        x, ker, strides, pad, rhs_dilation=dil,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = shift1x1_conv_general_dilated(
        x, ker, strides, pad, rhs_dilation=dil,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_shift1x1_grad_matches_direct():
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal((1, 10, 14, 3)), jnp.float32)
    ker = jnp.asarray(rng.standard_normal((3, 3, 3, 4)) * 0.3, jnp.float32)

    def loss(fn, x, k):
        y = fn(
            x, k, (1, 1), [(2, 2), (2, 2)], rhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(y * y)

    gx_ref, gk_ref = jax.grad(
        lambda x, k: loss(jax.lax.conv_general_dilated, x, k), argnums=(0, 1)
    )(x, ker)
    gx, gk = jax.grad(
        lambda x, k: loss(shift1x1_conv_general_dilated, x, k), argnums=(0, 1)
    )(x, ker)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), atol=1e-3, rtol=1e-3)


def test_auto_resolves_to_direct_lowering():
    """'auto' is the measured per-backend policy: on TPU v5e the direct
    lowering won or tied every hot shape in-program (the one isolated
    microbench win — shift1x1 on the wide fc6 head — measured 4/4 slower
    inside the full model; ops/dilated.py docstring), so the model hook
    must hand flax its default conv path (None) for auto, with the
    rewrites only under their explicit knobs."""
    from accel_tpu.models.resnet import _pick_conv_fn

    assert _pick_conv_fn(False, "auto", 2) is None
    assert _pick_conv_fn(False, "direct", 4) is None
    assert _pick_conv_fn(False, "s2b", 2) is s2b_conv_general_dilated
    assert _pick_conv_fn(False, "s2b", 1) is None  # dense conv: no rewrite
    assert _pick_conv_fn(False, "shift1x1", 2) is shift1x1_conv_general_dilated
    assert _pick_conv_fn(False, "shift1x1", 1) is None


def test_model_s2b_matches_direct():
    """Whole-backbone equivalence: same params, both lowerings, os8."""
    from accel_tpu.models.resnet import DilatedResNet

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    kw = dict(depth=18, output_stride=8, norm="groupnorm", dtype=jnp.float32)
    m_direct = DilatedResNet(dilated_conv="direct", **kw)
    m_s2b = DilatedResNet(dilated_conv="s2b", **kw)
    variables = m_direct.init(jax.random.PRNGKey(0), x)
    a = np.asarray(m_direct.apply(variables, x))
    b = np.asarray(m_s2b.apply(variables, x))
    np.testing.assert_allclose(b, a, atol=2e-4, rtol=2e-4)
