import jax.numpy as jnp
import numpy as np

from accel_tpu.ops.nms import bbox_overlaps, nms
from accel_tpu.ops.upsample import bilinear_upsample, resize_bilinear


def _np_nms(dets, thresh):
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        ovr = w * h / (areas[i] + areas[order[1:]] - w * h)
        order = order[1:][ovr <= thresh]
    return sorted(keep)


def test_nms_matches_reference_algorithm():
    rng = np.random.default_rng(0)
    for _ in range(5):
        n = 30
        x1 = rng.uniform(0, 50, n)
        y1 = rng.uniform(0, 50, n)
        dets = np.stack(
            [x1, y1, x1 + rng.uniform(5, 40, n), y1 + rng.uniform(5, 40, n),
             rng.uniform(0, 1, n)], axis=1
        ).astype(np.float32)
        keep = np.flatnonzero(np.asarray(nms(jnp.array(dets), 0.5))).tolist()
        assert keep == _np_nms(dets, 0.5)


def test_nms_max_out():
    dets = np.array(
        [[0, 0, 10, 10, 0.9], [100, 100, 110, 110, 0.8], [200, 200, 210, 210, 0.7]],
        np.float32,
    )
    keep = np.asarray(nms(jnp.array(dets), 0.5, max_out=2))
    assert keep.sum() == 2 and keep[0] and keep[1] and not keep[2]


def test_bbox_overlaps():
    a = jnp.array([[0, 0, 9, 9]], jnp.float32)
    b = jnp.array([[0, 0, 9, 9], [5, 5, 14, 14], [20, 20, 29, 29]], jnp.float32)
    iou = np.asarray(bbox_overlaps(a, b))[0]
    np.testing.assert_allclose(iou[0], 1.0)
    np.testing.assert_allclose(iou[1], 25.0 / 175.0, rtol=1e-6)
    np.testing.assert_allclose(iou[2], 0.0)


def test_resize_bilinear_matches_jax_image():
    import jax

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 8, 3)), jnp.float32)
    out = resize_bilinear(x, (16, 16))
    ref = jax.image.resize(x, (1, 16, 16, 3), "linear")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    up = bilinear_upsample(x, 4)
    assert up.shape == (1, 32, 32, 3)


def test_fast_downscale_matches_jax_image():
    """The alternative integer-factor downscale lowerings (env-selectable
    via ACCEL_DOWNSCALE; jax.image.resize stays the measured default) must
    match the jax.image.resize oracle at every factor the models use,
    including the renormalized boundary rows."""
    import jax

    rng = np.random.default_rng(1)
    for (h, w, oh, ow) in [
        (16, 32, 8, 16),    # f=2 (accel flow downscale)
        (64, 128, 16, 32),  # f=4 (dff/fast flow downscale)
        (24, 48, 12, 12),   # mixed factors (2, 4)
        (16, 16, 4, 16),    # one-axis downscale
        (30, 60, 15, 20),   # odd sizes (f=2, 3)
    ]:
        x = jnp.asarray(rng.standard_normal((2, h, w, 3)), jnp.float32)
        ref = jax.image.resize(x, (2, oh, ow, 3), "linear")
        fh, fw = h // oh, w // ow
        from accel_tpu.ops.upsample import downscale_bilinear

        for method in ("conv", "slice"):
            out = downscale_bilinear(x, fh, fw, method)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=1e-5,
                err_msg=f"{h}x{w} -> {oh}x{ow} [{method}]",
            )
