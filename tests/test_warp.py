"""Warp kernel tests: oracle vs scipy, Pallas vs oracle, properties, grads
(SURVEY.md §4 'consequence for the rebuild' items 1 and 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import map_coordinates

from accel_tpu.ops.warp import bilinear_warp_pallas, bilinear_warp_xla
from accel_tpu.ops.warp_pallas import warp_pallas_fwd


def _scipy_warp(feat, flow):
    N, H, W, C = feat.shape
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    out = np.zeros_like(feat)
    for n in range(N):
        for c in range(C):
            out[n, :, :, c] = map_coordinates(
                feat[n, :, :, c],
                [yy + flow[n, :, :, 1], xx + flow[n, :, :, 0]],
                order=1, mode="constant",
            )
    return out


@pytest.fixture()
def rand_case():
    rng = np.random.default_rng(42)
    N, H, W, C = 2, 16, 24, 5
    feat = rng.standard_normal((N, H, W, C)).astype(np.float32)
    flow = np.clip(rng.standard_normal((N, H, W, 2)) * 3, -7, 7).astype(np.float32)
    return feat, flow


def test_oracle_matches_scipy_interior(rand_case):
    feat, flow = rand_case
    N, H, W, C = feat.shape
    out = np.asarray(bilinear_warp_xla(jnp.array(feat), jnp.array(flow)))
    ref = _scipy_warp(feat, flow)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    sy = yy[None] + flow[..., 1]
    sx = xx[None] + flow[..., 0]
    inside = (sy >= 0) & (sy <= H - 1) & (sx >= 0) & (sx <= W - 1)
    np.testing.assert_allclose(out[inside], ref[inside], atol=1e-5)


def test_pallas_matches_oracle(rand_case):
    feat, flow = rand_case
    a = np.asarray(bilinear_warp_xla(jnp.array(feat), jnp.array(flow)))
    b = np.asarray(warp_pallas_fwd(jnp.array(feat), jnp.array(flow), max_disp=8))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_zero_flow_is_identity(rand_case):
    feat, _ = rand_case
    zero = jnp.zeros((*feat.shape[:3], 2), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(warp_pallas_fwd(jnp.array(feat), zero, max_disp=4)), feat
    )
    np.testing.assert_allclose(
        np.asarray(bilinear_warp_xla(jnp.array(feat), zero)), feat, atol=1e-6
    )


def test_integer_flow_is_shift(rand_case):
    feat, _ = rand_case
    N, H, W, C = feat.shape
    fl = np.zeros((N, H, W, 2), np.float32)
    fl[..., 0] = 2
    fl[..., 1] = -3
    out = np.asarray(warp_pallas_fwd(jnp.array(feat), jnp.array(fl), max_disp=4))
    exp = np.zeros_like(feat)
    exp[:, 3:, : W - 2] = feat[:, : H - 3, 2:]
    np.testing.assert_array_equal(out, exp)


def test_pallas_custom_vjp_matches_oracle_grads(rand_case):
    feat, flow = rand_case
    feat_j, flow_j = jnp.array(feat), jnp.array(flow)

    def loss_pallas(f, fl):
        return jnp.sum(bilinear_warp_pallas(f, fl, 8) ** 2)

    def loss_oracle(f, fl):
        return jnp.sum(bilinear_warp_xla(f, jnp.clip(fl, -8, 8)) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(feat_j, flow_j)
    go = jax.grad(loss_oracle, argnums=(0, 1))(feat_j, flow_j)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(go[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(go[1]), atol=1e-4)


def test_bf16_feat(rand_case):
    feat, flow = rand_case
    out = warp_pallas_fwd(jnp.array(feat, jnp.bfloat16), jnp.array(flow), max_disp=8)
    assert out.dtype == jnp.bfloat16
    ref = bilinear_warp_xla(jnp.array(feat), jnp.array(flow))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.1, rtol=0.05
    )


def test_large_flow_clamped_not_nan():
    feat = jnp.ones((1, 8, 128, 3))
    flow = jnp.full((1, 8, 128, 2), 100.0)
    out = warp_pallas_fwd(feat, flow, max_disp=4)
    assert np.isfinite(np.asarray(out)).all()


def test_stacked_gather_matches_oracle(rand_case):
    """bilinear_warp_xla_stacked (one gather for all 4 taps — the
    wide-channel serving lowering) must match the 4-gather oracle exactly
    for f32 feat, including out-of-image zero padding."""
    from accel_tpu.ops.warp import bilinear_warp_xla_stacked

    feat, flow = rand_case
    a = np.asarray(bilinear_warp_xla(jnp.array(feat), jnp.array(flow)))
    b = np.asarray(bilinear_warp_xla_stacked(jnp.array(feat), jnp.array(flow)))
    np.testing.assert_allclose(a, b, atol=1e-6)
    # big flow: all source coords out of image -> zeros, no NaN
    big = jnp.full((*feat.shape[:3], 2), 1e4, jnp.float32)
    out = np.asarray(bilinear_warp_xla_stacked(jnp.array(feat), big))
    np.testing.assert_array_equal(out, np.zeros_like(feat))


def test_stacked_gather_bf16_and_grads(rand_case):
    from accel_tpu.ops.warp import bilinear_warp_xla_stacked

    feat, flow = rand_case
    out = bilinear_warp_xla_stacked(jnp.array(feat, jnp.bfloat16), jnp.array(flow))
    assert out.dtype == jnp.bfloat16
    ref = bilinear_warp_xla(jnp.array(feat), jnp.array(flow))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.1, rtol=0.05
    )
    # trace-differentiable, grads match the oracle's (f32)
    feat_j, flow_j = jnp.array(feat), jnp.array(flow)
    gs = jax.grad(lambda f, fl: jnp.sum(bilinear_warp_xla_stacked(f, fl) ** 2),
                  argnums=(0, 1))(feat_j, flow_j)
    go = jax.grad(lambda f, fl: jnp.sum(bilinear_warp_xla(f, fl) ** 2),
                  argnums=(0, 1))(feat_j, flow_j)
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(go[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(go[1]), atol=1e-4)


def test_warp_dtype_native_model_knob():
    """AccelNet.warp with warp_dtype='native' keeps bf16 through warp +
    scale-mod (the DFF serving-traffic knob) and stays close to the f32
    path; warp_gather='stacked' routes the one-gather lowering."""
    from accel_tpu.models.accel import AccelNet

    rng = np.random.default_rng(3)
    prop = jnp.asarray(rng.standard_normal((2, 8, 12, 32)), jnp.bfloat16)
    flow = jnp.asarray(rng.uniform(-2, 2, (2, 8, 12, 2)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (2, 8, 12, 32)), jnp.float32)

    def run(**kw):
        m = AccelNet(family="dff", ref_depth=18, num_classes=5,
                     use_pallas_warp=False, **kw)
        v = m.init(jax.random.PRNGKey(0), prop, flow, scale, method="warp")
        return m.apply(v, prop, flow, scale, method="warp")

    base = run()
    nat = run(warp_dtype="native", warp_gather="stacked")
    assert nat.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(nat, np.float32), np.asarray(base, np.float32),
        atol=0.15, rtol=0.08,
    )
