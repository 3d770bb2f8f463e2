"""Folded downscale-into-stem-conv lowering (ops/fold_downscale.py).

Contract: conv(kernel, downscale_noRenorm(x)) == folded_conv(kernel, x)
exactly (modulo f32 summation order); vs the shipped resize path
(jax.image.resize semantics, WITH edge renorm) only the outputs whose
receptive field touches the outermost downscaled-domain ring may differ.
"""

import jax
import jax.numpy as jnp
import numpy as np

from accel_tpu.ops.fold_downscale import fold_downscale_conv_fn
from accel_tpu.ops.upsample import _down_renorm, _down_taps


def _downscale_norenorm(x, f):
    """Oracle: triangle downscale WITHOUT edge renorm (numpy, NHWC)."""
    offs, t = _down_taps(f)

    def along(x, axis):
        n = x.shape[axis]
        pad = [(0, 0)] * x.ndim
        pad[axis] = (int(-offs[0]), int(offs[-1] - (f - 1)))
        xp = np.pad(x, pad)
        sl = [
            np.take(xp, np.arange(n // f) * f + j, axis=axis)
            for j in range(len(t))
        ]
        return sum(w * s for w, s in zip(t, sl))

    return along(along(x, 1), 2)


def _conv(x, k, stride, pad):
    return jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (stride, stride),
        ((pad, pad), (pad, pad)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_folded_conv_matches_two_stage():
    """Exact equality for every output whose conv window stays within the
    downscaled image ([0, n/f)); outputs whose window reaches the conv's
    zero padding differ by the folded kernel's phantom-row taps (the
    two-stage form zeroes whole out-of-range downscaled rows; the folded
    kernel's outer taps still catch the outermost ~1 valid pixel) — that
    ring must be bounded."""
    rng = np.random.default_rng(0)
    for (f, H, W, S, stride, pad) in [
        (2, 32, 48, 7, 2, 3),   # the update-branch stem shape class
        (4, 64, 64, 7, 2, 3),   # the flow-path factor
        (2, 24, 40, 3, 1, 1),   # small kernel, stride 1
    ]:
        x = rng.standard_normal((2, H, W, 3)).astype(np.float32)
        k = rng.standard_normal((S, S, 3, 8)).astype(np.float32)
        ref = np.asarray(_conv(_downscale_norenorm(x, f), k, stride, pad))
        fn = fold_downscale_conv_fn(f)
        out = np.asarray(fn(jnp.asarray(x), jnp.asarray(k), (stride, stride),
                            ((pad, pad), (pad, pad)),
                            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        assert out.shape == ref.shape, (f, H, W, S, stride, pad)

        def inner(n_out, n_d):
            o = np.arange(n_out)
            return (stride * o - pad >= 0) & (stride * o - pad + S <= n_d)

        in_h = inner(out.shape[1], H // f)
        in_w = inner(out.shape[2], W // f)
        core = in_h[None, :, None, None] & in_w[None, None, :, None]
        core = np.broadcast_to(core, out.shape)
        assert core.sum() > 0
        np.testing.assert_allclose(out[core], ref[core], atol=2e-4,
                                   err_msg=f"f={f} {H}x{W} S={S}/{stride}")
        # the ring deviates by at most ~one edge-tap contribution
        assert np.max(np.abs(out - ref)) < 1.0 * np.abs(k).sum() ** 0.5


def test_folded_vs_renormed_resize_edge_ring_only():
    """vs the shipped resize path the deviation must be confined to the
    output ring whose receptive field sees renormalized downscale rows."""
    rng = np.random.default_rng(1)
    f, S, stride, pad = 2, 7, 2, 3
    H, W = 64, 96
    x = rng.standard_normal((1, H, W, 3)).astype(np.float32)
    k = rng.standard_normal((S, S, 3, 4)).astype(np.float32)

    d = np.asarray(_downscale_norenorm(x, f))
    rh = _down_renorm(f, H).astype(np.float32)
    rw = _down_renorm(f, W).astype(np.float32)
    d_renorm = d * rh[None, :, None, None] * rw[None, None, :, None]
    ref = np.asarray(_conv(d_renorm, k, stride, pad))  # the resize path

    fn = fold_downscale_conv_fn(f)
    out = np.asarray(fn(jnp.asarray(x), jnp.asarray(k), (stride, stride),
                        ((pad, pad), (pad, pad)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    # renormed downscale rows: where _down_renorm != 1
    bad_h = np.nonzero(rh != 1.0)[0]
    bad_w = np.nonzero(rw != 1.0)[0]
    # conv output o reads downscaled rows [stride*o - pad, stride*o - pad + S)
    oh = out.shape[1]
    ow = out.shape[2]
    touched_h = np.array([
        any((stride * o - pad <= b < stride * o - pad + S) for b in bad_h)
        for o in range(oh)
    ])
    touched_w = np.array([
        any((stride * o - pad <= b < stride * o - pad + S) for b in bad_w)
        for o in range(ow)
    ])
    interior = ~touched_h[None, :, None, None] & ~touched_w[None, None, :, None]
    interior = np.broadcast_to(interior, out.shape)
    np.testing.assert_allclose(out[interior], ref[interior], atol=2e-4)
    # and the ring deviation exists but is bounded (sanity: same scale)
    assert np.max(np.abs(out - ref)) < 10.0


def test_model_fold_update_downscale():
    """AccelNet(fold_update_downscale=True) shares the param tree with the
    resize path and matches it away from the border."""
    from accel_tpu.models.accel import AccelNet

    kw = dict(family="accel", ref_depth=18, update_depth=18, num_classes=5,
              feat_stride=16, head_channels=64, update_input_downscale=2,
              norm="groupnorm", dtype=jnp.float32, use_pallas_warp=False)
    m0 = AccelNet(**kw)
    m1 = AccelNet(fold_update_downscale=True, **kw)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal((1, 64, 128, 3)), jnp.float32)
    v = m0.init(jax.random.PRNGKey(0), img, method="update_scores")
    v1 = m1.init(jax.random.PRNGKey(0), img, method="update_scores")
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v1)
    a = np.asarray(m0.apply(v, img, method="update_scores"))
    b = np.asarray(m1.apply(v, img, method="update_scores"))
    assert a.shape == b.shape
    # scores at stride 16 of a 64x128 image -> (1,4,8,5); the border ring
    # of the half-res image maps inside the stem's receptive field of
    # every score pixel here, so compare loosely overall and tightly at
    # the centre
    np.testing.assert_allclose(a[:, 1:-1, 1:-1], b[:, 1:-1, 1:-1],
                               atol=0.08, rtol=0.08)

    # differentiable end-to-end
    g = jax.grad(lambda vv: jnp.sum(
        m1.apply(vv, img, method="update_scores") ** 2))(v)
    gn = jax.tree_util.tree_reduce(
        lambda s, x: s + float(jnp.sum(jnp.abs(x))), g, 0.0)
    assert np.isfinite(gn) and gn > 0


def test_flownet_conv1_split_matches_pair():
    """_Conv1 kernel-half partials (fold=1: identity downscale) must sum to
    the standard pair conv exactly — the folded flow prologue's algebra."""
    from accel_tpu.models.flownet import FlowNetS

    rng = np.random.default_rng(4)
    net = FlowNetS(scale_channels=3, width_mult=0.5, dtype=jnp.float32)
    cur = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    anc = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    pair = jnp.concatenate([cur, anc], axis=-1)
    v = net.init(jax.random.PRNGKey(0), pair)
    c1 = net.apply(v, pair, method=lambda m, p: m.conv1(p))
    cp = net.apply(v, cur, method=lambda m, f: m.stem_partial(f, "cur", 1))
    ap = net.apply(v, anc, method=lambda m, f: m.stem_partial(f, "anchor", 1))
    np.testing.assert_allclose(np.asarray(cp + ap), np.asarray(c1),
                               atol=2e-5, rtol=1e-5)


def test_fold_flow_pipeline_matches_standard():
    """clip_predictions with fold_flow_downscale must track the standard
    (resize -> pair conv) path: same param tree, near-identical flow, and
    overwhelmingly identical predictions."""
    from accel_tpu.core.pipeline import clip_predictions
    from accel_tpu.models.accel import AccelNet

    kw = dict(family="accel", ref_depth=18, update_depth=18, num_classes=5,
              feat_stride=16, head_channels=64, flow_input_downscale=2,
              norm="groupnorm", dtype=jnp.float32, use_pallas_warp=False)
    m0 = AccelNet(**kw)
    m1 = AccelNet(fold_flow_downscale=True, **kw)
    rng = np.random.default_rng(5)
    # FlowNet needs its input (H/f) divisible by 64 -> 128x256 frames
    clip = jnp.asarray(rng.standard_normal((1, 4, 128, 256, 3)) * 0.3,
                       jnp.float32)
    v = m0.init(jax.random.PRNGKey(1), clip[:, 0], clip[:, 1])
    v1 = m1.init(jax.random.PRNGKey(1), clip[:, 0], clip[:, 1])
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v1)

    f0 = m0.apply(v, clip[:, 0], clip[:, 1], method="flow")
    f1 = m1.apply(v, clip[:, 0], clip[:, 1], method="flow")
    np.testing.assert_allclose(np.asarray(f0[0]), np.asarray(f1[0]),
                               atol=2e-3)

    p0 = np.asarray(clip_predictions(m0, v, clip, 4, "incremental"))
    p1 = np.asarray(clip_predictions(m1, v, clip, 4, "incremental"))
    assert p0.shape == p1.shape
    agree = (p0 == p1).mean()
    assert agree > 0.97, agree
