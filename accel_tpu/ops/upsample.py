"""Bilinear resize / upsampling.

Reference counterpart: the fixed-weight bilinear ``Deconvolution`` layer at
the end of the DeepLab symbol (``deeplab/symbols/resnet_v1_101_deeplab.py``,
SURVEY.md §2 "DeepLab symbol") and MXNet's image resizing in the data layer.

On TPU, ``jax.image.resize`` lowers to XLA ops that fuse cleanly; a
transposed conv with frozen bilinear weights would be equivalent FLOPs but
blocks fusion with the surrounding elementwise work, so resize is the
idiomatic form here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear-resize NHWC (or HWC) to spatial size ``out_hw``."""
    if x.ndim == 3:
        shape = (*out_hw, x.shape[-1])
    elif x.ndim == 4:
        shape = (x.shape[0], *out_hw, x.shape[-1])
    else:
        raise ValueError(f"expected 3D/4D NHWC, got {x.shape}")
    return jax.image.resize(x, shape, method="linear").astype(x.dtype)


def bilinear_upsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Upsample NHWC by an integer factor (reference: fixed bilinear deconv)."""
    n, h, w, c = x.shape
    return resize_bilinear(x, (h * factor, w * factor))
