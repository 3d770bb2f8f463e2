"""Host-side image preprocessing.

Reference counterpart: ``lib/utils/image.py`` (SURVEY.md §2 "Image utils"):
short-side ``resize`` capped at max size, BGR mean-subtract ``transform``,
``tensor_vstack`` batching; labels resized nearest.

The hot loops (bilinear resize, normalize, label LUT) dispatch to the C++
extension in ``accel_tpu/native`` when built (the reference's ``lib/``
native-extension role), with numpy/cv2 fallbacks.
"""

from __future__ import annotations

import numpy as np

from accel_tpu.native import native_ops


def resize(im: np.ndarray, target_size: int, max_size: int, interp: str = "bilinear"):
    """Scale so the short side == target_size, capped so long side <= max_size.

    Returns (resized_image, scale). Matches the reference's resize contract.
    """
    h, w = im.shape[:2]
    im_size_min = min(h, w)
    im_size_max = max(h, w)
    scale = float(target_size) / im_size_min
    if round(scale * im_size_max) > max_size:
        scale = float(max_size) / im_size_max
    out_h, out_w = int(round(h * scale)), int(round(w * scale))
    return resize_to(im, out_h, out_w, interp), scale


def resize_to(im: np.ndarray, out_h: int, out_w: int, interp: str = "bilinear"):
    if im.shape[0] == out_h and im.shape[1] == out_w:
        return im
    if interp == "nearest":
        ys = (np.arange(out_h) * (im.shape[0] / out_h)).astype(np.int64)
        xs = (np.arange(out_w) * (im.shape[1] / out_w)).astype(np.int64)
        return im[ys][:, xs]
    return native_ops.resize_bilinear(im, out_h, out_w)


def transform(im: np.ndarray, pixel_means, pixel_stds=(1.0, 1.0, 1.0)) -> np.ndarray:
    """uint8/float HWC (BGR order, as the reference loads via cv2) ->
    normalized float32 (1, H, W, C). NHWC is the TPU-native layout (the
    reference emits NCHW for MXNet)."""
    out = native_ops.normalize(im, np.asarray(pixel_means, np.float32),
                               np.asarray(pixel_stds, np.float32))
    return out[None]


def transform_inverse(im_tensor: np.ndarray, pixel_means, pixel_stds=(1.0, 1.0, 1.0)):
    """(1,H,W,C) normalized -> uint8 HWC BGR (reference debugging helper)."""
    im = im_tensor[0] * np.asarray(pixel_stds, np.float32) + np.asarray(
        pixel_means, np.float32
    )
    return np.clip(im, 0, 255).astype(np.uint8)


def map_labels(label: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """Apply a 256-entry labelId->trainId LUT (255 = ignore)."""
    return native_ops.map_labels(label, lut)


def tensor_vstack(tensor_list, pad: float = 0.0) -> np.ndarray:
    """Stack tensors along axis 0, zero-padding trailing dims to the max
    shape (reference: lib/utils/image.py:tensor_vstack)."""
    if len(tensor_list) == 1:
        return tensor_list[0]
    ndim = tensor_list[0].ndim
    dtype = tensor_list[0].dtype
    shapes = np.array([t.shape for t in tensor_list])
    out_shape = [int(shapes[:, 0].sum())] + [int(shapes[:, d].max()) for d in range(1, ndim)]
    out = np.full(out_shape, pad, dtype=dtype)
    pos = 0
    for t in tensor_list:
        sl = (slice(pos, pos + t.shape[0]),) + tuple(slice(0, s) for s in t.shape[1:])
        out[sl] = t
        pos += t.shape[0]
    return out
