"""Non-max suppression + bbox overlaps (detection-legacy parity).

Reference counterparts: ``lib/nms/`` (Cython + CUDA ``nms_kernel.cu``) and
``lib/bbox/bbox.pyx`` (SURVEY.md §2a items 3-4). These are DFF/R-FCN
detection heritage, built by init.sh but NOT on the segmentation path; they
are provided here in idiomatic jnp form for capability parity. The
O(N^2) mask formulation maps onto the VPU instead of the reference's
sequential CUDA bitmask kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bbox_overlaps(boxes: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix (N, K) for boxes (N,4) vs query (K,4), [x1,y1,x2,y2]
    (reference: bbox.pyx:bbox_overlaps_cython)."""
    area_b = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    area_q = (query[:, 2] - query[:, 0] + 1) * (query[:, 3] - query[:, 1] + 1)
    ix1 = jnp.maximum(boxes[:, None, 0], query[None, :, 0])
    iy1 = jnp.maximum(boxes[:, None, 1], query[None, :, 1])
    ix2 = jnp.minimum(boxes[:, None, 2], query[None, :, 2])
    iy2 = jnp.minimum(boxes[:, None, 3], query[None, :, 3])
    iw = jnp.maximum(ix2 - ix1 + 1, 0)
    ih = jnp.maximum(iy2 - iy1 + 1, 0)
    inter = iw * ih
    return inter / (area_b[:, None] + area_q[None, :] - inter)


def nms(dets: jnp.ndarray, thresh: float, max_out: int | None = None) -> jnp.ndarray:
    """Greedy NMS. dets (N, 5) = [x1,y1,x2,y2,score]; returns keep mask (N,)
    (reference: nms_wrapper / gpu_nms). Static shapes: a fori_loop over the
    score-sorted list with an alive mask — no dynamic output size inside jit;
    use the mask (or jnp.nonzero outside jit) to materialize indices."""
    n = dets.shape[0]
    order = jnp.argsort(-dets[:, 4])
    boxes = dets[order, :4]
    iou = bbox_overlaps(boxes, boxes)

    def body(i, alive):
        # suppress everything the i-th (if alive) overlaps above thresh
        suppress = (iou[i] > thresh) & alive[i]
        keep_self = jnp.zeros_like(alive).at[i].set(alive[i])
        return jnp.where(suppress, keep_self, alive)

    alive = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    keep_sorted = alive
    if max_out is not None:
        rank = jnp.cumsum(keep_sorted) - 1
        keep_sorted = keep_sorted & (rank < max_out)
    # map back to original order
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep
