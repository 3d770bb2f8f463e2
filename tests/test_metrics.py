import jax.numpy as jnp
import numpy as np

from accel_tpu.core.metrics import (
    IGNORE_LABEL,
    SegConfusionAccumulator,
    confusion_matrix,
    miou_from_confusion,
    softmax_cross_entropy,
)


def _np_confusion(pred, label, nc):
    cm = np.zeros((nc, nc))
    for p, l in zip(pred.ravel(), label.ravel()):
        if l != IGNORE_LABEL and l < nc:
            cm[l, p] += 1
    return cm


def test_confusion_matrix_matches_numpy():
    rng = np.random.default_rng(0)
    nc = 7
    pred = rng.integers(0, nc, (4, 9, 11))
    label = rng.integers(0, nc, (4, 9, 11))
    label[rng.random(label.shape) < 0.2] = IGNORE_LABEL
    cm = np.asarray(confusion_matrix(jnp.array(pred), jnp.array(label), nc))
    np.testing.assert_allclose(cm, _np_confusion(pred, label, nc))


def test_miou_perfect_prediction():
    label = np.tile(np.arange(5), 20).reshape(10, 10)
    cm = confusion_matrix(jnp.array(label), jnp.array(label), 5)
    miou, iou = miou_from_confusion(cm)
    assert float(miou) == 1.0
    np.testing.assert_allclose(np.asarray(iou), 1.0)


def test_miou_absent_class_excluded():
    label = np.zeros((4, 4), np.int32)
    pred = np.zeros((4, 4), np.int32)
    cm = confusion_matrix(jnp.array(pred), jnp.array(label), 3)
    miou, _ = miou_from_confusion(cm)
    assert float(miou) == 1.0  # classes 1, 2 absent in GT -> excluded


def test_cross_entropy_ignore():
    nc = 4
    logits = jnp.zeros((1, 2, 2, nc))
    label = jnp.array([[[0, 1], [IGNORE_LABEL, IGNORE_LABEL]]])
    loss = float(softmax_cross_entropy(logits, label, nc))
    np.testing.assert_allclose(loss, np.log(nc), rtol=1e-6)


def test_cross_entropy_all_ignored_is_finite():
    nc = 4
    logits = jnp.zeros((1, 2, 2, nc))
    label = jnp.full((1, 2, 2), IGNORE_LABEL)
    assert np.isfinite(float(softmax_cross_entropy(logits, label, nc)))


def test_accumulator_streaming():
    rng = np.random.default_rng(1)
    nc = 5
    acc = SegConfusionAccumulator(nc)
    all_p, all_l = [], []
    for _ in range(3):
        p = rng.integers(0, nc, (2, 8, 8))
        l = rng.integers(0, nc, (2, 8, 8))
        acc.update(jnp.array(p), jnp.array(l))
        all_p.append(p)
        all_l.append(l)
    cm_ref = _np_confusion(np.stack(all_p), np.stack(all_l), nc)
    miou_ref, _ = miou_from_confusion(jnp.array(cm_ref))
    miou, _ = acc.result()
    np.testing.assert_allclose(miou, float(miou_ref), rtol=1e-6)
