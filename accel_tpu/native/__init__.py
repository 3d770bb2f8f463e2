"""Native host-preprocessing ops with numpy fallback.

``native_ops`` exposes resize_bilinear / normalize / map_labels backed by
the C++ extension (``_accel_native``) when built — build with
``bash init.sh`` — else by numpy equivalents with identical semantics
(half-pixel-center bilinear, matching jax.image.resize / cv2 INTER_LINEAR).
"""

from __future__ import annotations

import os
import sys

import numpy as np

_ext = None
try:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import _accel_native as _ext  # type: ignore
except ImportError:
    _ext = None
finally:
    sys.path.pop(0)


def available() -> bool:
    return _ext is not None


class _NumpyOps:
    @staticmethod
    def resize_bilinear(im: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
        squeeze = im.ndim == 2
        if squeeze:
            im = im[..., None]
        h, w, c = im.shape
        fy = np.clip((np.arange(out_h) + 0.5) * (h / out_h) - 0.5, 0, h - 1)
        fx = np.clip((np.arange(out_w) + 0.5) * (w / out_w) - 0.5, 0, w - 1)
        y0 = fy.astype(np.int64)
        x0 = fx.astype(np.int64)
        y1 = np.minimum(y0 + 1, h - 1)
        x1 = np.minimum(x0 + 1, w - 1)
        wy = (fy - y0)[:, None, None].astype(np.float32)
        wx = (fx - x0)[None, :, None].astype(np.float32)
        im = im.astype(np.float32)
        top = im[y0][:, x0] * (1 - wx) + im[y0][:, x1] * wx
        bot = im[y1][:, x0] * (1 - wx) + im[y1][:, x1] * wx
        out = top * (1 - wy) + bot * wy
        return out[..., 0] if squeeze else out

    @staticmethod
    def normalize(im: np.ndarray, means: np.ndarray, stds: np.ndarray) -> np.ndarray:
        return ((im.astype(np.float32) - means) / stds).astype(np.float32)

    @staticmethod
    def map_labels(label: np.ndarray, lut: np.ndarray) -> np.ndarray:
        return lut[label.astype(np.uint8)]


class _NativeOps:
    @staticmethod
    def resize_bilinear(im, out_h, out_w):
        im = np.ascontiguousarray(im)
        if im.dtype not in (np.uint8, np.float32):
            im = im.astype(np.float32)
        return _ext.resize_bilinear(im, int(out_h), int(out_w))

    @staticmethod
    def normalize(im, means, stds):
        im = np.ascontiguousarray(im)
        if im.dtype not in (np.uint8, np.float32):
            im = im.astype(np.float32)
        return _ext.normalize(im, np.ascontiguousarray(means, np.float32),
                              np.ascontiguousarray(stds, np.float32))

    @staticmethod
    def map_labels(label, lut):
        return _ext.map_labels(
            np.ascontiguousarray(label), np.ascontiguousarray(lut, np.uint8)
        )


native_ops = _NativeOps if available() else _NumpyOps
numpy_ops = _NumpyOps
