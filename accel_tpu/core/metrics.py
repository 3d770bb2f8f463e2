"""Segmentation metrics, device-side.

Reference counterparts (SURVEY.md §2):
- ``lib/dataset/cityscape*.py:get_confusion_matrix`` — mIoU via confusion
  matrix over 19 train classes, ignore label 255.
- ``<net>/core/metric.py:FCNLogLossMetric`` — ignore-aware softmax CE metric.

TPU-native differences: the confusion matrix is accumulated on device as a
one-hot matmul (MXU-friendly — a (P, C) x (P, C) contraction instead of a
host-side histogram), and metrics are plain functional jnp so they ride
inside jit/scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_LABEL = 255


def confusion_matrix(pred: jnp.ndarray, label: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(num_classes, num_classes) confusion matrix; rows = GT, cols = pred.

    ``pred`` and ``label`` are integer maps of identical shape; pixels with
    ``label == IGNORE_LABEL`` are dropped. Implemented as a one-hot
    contraction so the accumulation runs on the MXU instead of a scatter.
    """
    pred = pred.reshape(-1)
    label = label.reshape(-1)
    valid = (label != IGNORE_LABEL) & (label < num_classes)
    # ignored pixels -> class 0 with weight 0
    l = jnp.where(valid, label, 0).astype(jnp.int32)
    p = jnp.where(valid, pred, 0).astype(jnp.int32)
    w = valid.astype(jnp.float32)
    oh_l = jax.nn.one_hot(l, num_classes, dtype=jnp.float32) * w[:, None]
    oh_p = jax.nn.one_hot(p, num_classes, dtype=jnp.float32)
    return oh_l.T @ oh_p


def miou_from_confusion(cm: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (mean IoU over classes present in GT, per-class IoU)."""
    gt = cm.sum(axis=1)
    pr = cm.sum(axis=0)
    tp = jnp.diag(cm)
    union = gt + pr - tp
    iou = jnp.where(union > 0, tp / jnp.maximum(union, 1e-12), 0.0)
    present = gt > 0
    miou = jnp.sum(jnp.where(present, iou, 0.0)) / jnp.maximum(present.sum(), 1)
    return miou, iou


def softmax_cross_entropy(
    logits: jnp.ndarray,
    label: jnp.ndarray,
    num_classes: int,
    loss_scale: float = 1.0,
    ohem_fraction: float | None = None,
) -> jnp.ndarray:
    """Per-pixel CE with ignore label 255, mean over valid pixels.

    ``logits``: (..., num_classes) float; ``label``: (...) int.
    Matches the reference's ``SoftmaxOutput(use_ignore=True, ignore_label=255,
    normalization='valid')`` semantics.

    ``ohem_fraction``: online hard example mining — keep only the hardest
    fraction of valid pixels (the reference's operator_py OHEM heritage,
    SURVEY.md §2, recast for segmentation). Implemented with a static-size
    top-k over the flattened loss map (jit-friendly).
    """
    valid = (label != IGNORE_LABEL) & (label < num_classes)
    l = jnp.where(valid, label, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, l[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    if ohem_fraction is not None and 0.0 < ohem_fraction < 1.0:
        flat = nll.reshape(-1)
        k = max(int(flat.shape[0] * ohem_fraction), 1)
        top, _ = jax.lax.top_k(flat, k)
        n_kept = jnp.minimum(valid.sum(), k)
        return loss_scale * top.sum() / jnp.maximum(n_kept, 1)
    return loss_scale * nll.sum() / jnp.maximum(valid.sum(), 1)


class FCNLogLossMetric:
    """Running ignore-aware CE metric (reference: core/metric.py).

    Host-side accumulator; feed it per-step (loss_sum, valid_count) pairs or
    logits/labels.
    """

    def __init__(self, name: str = "FCNLogLoss"):
        self.name = name
        self.reset()

    def reset(self):
        self.sum_metric = 0.0
        self.num_inst = 0

    def update(self, loss_sum: float, num_valid: int):
        self.sum_metric += float(loss_sum)
        self.num_inst += int(num_valid)

    def get(self) -> tuple[str, float]:
        return self.name, self.sum_metric / max(self.num_inst, 1)


class SegConfusionAccumulator:
    """Streaming confusion-matrix accumulator.

    The per-batch matrix is computed on device (f32 one-hot matmul — exact
    while every cell count stays below 2^24, i.e. up to ~16M valid pixels
    per cell per batch, far above any real batch), then accumulated into a
    host-side float64 matrix so full-dataset totals (~1e9 pixels on
    Cityscapes val) keep exact integer counts, matching the reference's
    integer histogram."""

    def __init__(self, num_classes: int):
        import numpy as np

        self.num_classes = num_classes
        self.cm = np.zeros((num_classes, num_classes), np.float64)

    def update(self, pred, label):
        import numpy as np

        batch_cm = confusion_matrix(pred, label, self.num_classes)
        self.cm += np.asarray(batch_cm, np.float64)

    def result(self) -> tuple[float, list[float]]:
        miou, iou = miou_from_confusion(jnp.asarray(self.cm))
        return float(miou), [float(x) for x in iou]
