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

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# Lowering for integer-factor bilinear downscales inside resize_bilinear.
# Default pending the TPU in-program A/B (tools/profile_group_step.py with
# ACCEL_DOWNSCALE set); 'resize' is the jax.image.resize baseline.
DOWNSCALE_METHOD = os.environ.get("ACCEL_DOWNSCALE", "resize")


@functools.lru_cache(maxsize=None)
def _down_taps(f: int):
    """Tap offsets, interior weights, and the boundary renorm recipe for
    jax.image.resize('linear') downscaling by an integer factor ``f``.

    resize-with-antialias at scale 1/f is a stride-``f`` correlation with
    the triangle kernel ``tri((j - x_i)/f)`` sampled at input positions
    ``x_i = f*i + (f-1)/2``, with out-of-range taps dropped and the row
    renormalized (verified against the resize matrix; only the first/last
    ``ceil(pad/f)`` output rows renormalize differently from the interior).
    """
    x0 = (f - 1) / 2.0
    lo = int(np.floor(x0 - f)) + 1
    hi = int(np.ceil(x0 + f)) - 1
    offs = np.arange(lo, hi + 1)
    w = np.maximum(0.0, 1.0 - np.abs((offs - x0) / f))
    w = w / w.sum()
    return offs, w


@functools.lru_cache(maxsize=None)
def _down_renorm(f: int, n: int):
    """(n//f,) per-output-row 1/sum(in-range weights); 1.0 in the interior."""
    offs, w = _down_taps(f)
    i = np.arange(n // f)[:, None]
    valid = (f * i + offs[None, :] >= 0) & (f * i + offs[None, :] < n)
    return 1.0 / (valid * w[None, :]).sum(axis=1)


def _downscale_axis(x: jnp.ndarray, f: int, axis: int) -> jnp.ndarray:
    """Exact jax.image.resize('linear') downscale by integer factor ``f``
    along ``axis``, as a sum of ``2f`` strided slices — avoiding the dense
    matmul against a mostly-zero interp matrix that jax.image.resize
    lowers to. On v5e this measured 10x SLOWER than the dense matmul
    (strided lane-dim slicing); see downscale_bilinear for the verdict."""
    n = x.shape[axis]
    n_out = n // f
    offs, w = _down_taps(f)
    pad_lo, pad_hi = int(-offs[0]), int(offs[-1] - (f - 1))
    pads = [(0, 0)] * x.ndim
    pads[axis] = (pad_lo, pad_hi)
    xp = jnp.pad(x, pads)
    acc = None
    for t in range(len(offs)):
        s = int(offs[t]) + pad_lo
        sl = jax.lax.slice_in_dim(
            xp, s, s + f * (n_out - 1) + 1, stride=f, axis=axis
        )
        term = sl * jnp.float32(w[t])
        acc = term if acc is None else acc + term
    renorm = _down_renorm(f, n)
    if not np.all(renorm == 1.0):
        shape = [1] * x.ndim
        shape[axis] = n_out
        acc = acc * jnp.asarray(renorm, jnp.float32).reshape(shape)
    return acc


def _downscale_conv(x: jnp.ndarray, fh: int, fw: int) -> jnp.ndarray:
    """Integer-factor bilinear downscale as ONE strided conv with the fixed
    separable triangle kernel (outer(w_h, w_w) ⊗ I_C), plus the separable
    edge-renormalization as an outer-product multiply at output resolution.
    Exact match to jax.image.resize('linear'); C=3 image stems are the
    layout XLA's conv emitter is best at, unlike strided lane slicing."""
    n_batched = x.ndim == 4
    if not n_batched:
        x = x[None]
    N, H, W, C = x.shape
    offs_h, w_h = _down_taps(fh)
    offs_w, w_w = _down_taps(fw)
    kh, kw = len(w_h), len(w_w)
    k2d = np.einsum("i,j->ij", w_h, w_w)  # (kh, kw)
    kernel = np.zeros((kh, kw, C, C), np.float32)
    for c in range(C):
        kernel[:, :, c, c] = k2d
    pad_h = (int(-offs_h[0]), int(offs_h[-1] - (fh - 1)))
    pad_w = (int(-offs_w[0]), int(offs_w[-1] - (fw - 1)))
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), jnp.asarray(kernel),
        window_strides=(fh, fw), padding=(pad_h, pad_w),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    rh = _down_renorm(fh, H)
    rw = _down_renorm(fw, W)
    if not (np.all(rh == 1.0) and np.all(rw == 1.0)):
        corr = np.einsum("i,j->ij", rh, rw).astype(np.float32)
        out = out * jnp.asarray(corr)[None, :, :, None]
    out = out.astype(x.dtype)
    return out if n_batched else out[0]


def downscale_bilinear(x: jnp.ndarray, fh: int, fw: int,
                       method: str = "conv") -> jnp.ndarray:
    """NHWC/HWC downscale by integer factors (fh, fw); numerically matches
    ``jax.image.resize(..., method='linear')`` (same taps/renorm, f32
    accumulation; summation order differs).

    ``method``: 'conv' (strided fixed-kernel conv) or 'slice' (strided
    slice-FMA). Measured verdict (tools/bench_downscale.py, v5e f32):
    'slice' loses everywhere (28.6 vs 2.5 ms per 20-frame call at f=4 —
    stride-f slicing along W crosses the lane dimension); 'conv' wins only
    the full-res f=2 cell and only by ~8% (7.9 vs 8.5 ms), while
    jax.image.resize wins f=4 and every half-res shape outright (3.0 vs
    8.8 ms at f=4, 0.7 vs 2.1 ms at 512x1024 f=2). A one-cell marginal
    isolated win does not flip a default (ops/dilated.py standing policy):
    resize stays the lowering; both variants remain env-selectable
    (ACCEL_DOWNSCALE) and exactness-tested. The "interp matrix is 95%
    zeros" intuition mis-guessed the bound — XLA's dense-matmul resize
    already runs near achievable bandwidth at these shapes."""
    if method == "conv":
        return _downscale_conv(x, fh, fw)
    h_axis = x.ndim - 3
    y = x.astype(jnp.float32)
    if fh > 1:
        y = _downscale_axis(y, fh, h_axis)
    if fw > 1:
        y = _downscale_axis(y, fw, h_axis + 1)
    return y.astype(x.dtype)


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear-resize NHWC (or HWC) to spatial size ``out_hw``."""
    if x.ndim == 3:
        shape = (*out_hw, x.shape[-1])
    elif x.ndim == 4:
        shape = (x.shape[0], *out_hw, x.shape[-1])
    else:
        raise ValueError(f"expected 3D/4D NHWC, got {x.shape}")
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    # Integer-factor downscales can route to an equivalent faster lowering
    # (in-program A/B per the ops/dilated.py standing policy before any
    # default flip). DOWNSCALE_METHOD: 'resize' = jax.image.resize (dense
    # interp-matrix matmuls), 'conv' = strided fixed-kernel conv,
    # 'slice' = strided slice-FMA (measured loser on TPU; see
    # downscale_bilinear).
    if (DOWNSCALE_METHOD != "resize" and oh <= h and ow <= w
            and h % oh == 0 and w % ow == 0):
        return downscale_bilinear(x, h // oh, w // ow, DOWNSCALE_METHOD)
    return jax.image.resize(x, shape, method="linear").astype(x.dtype)


def bilinear_upsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Upsample NHWC by an integer factor (reference: fixed bilinear deconv)."""
    n, h, w, c = x.shape
    return resize_bilinear(x, (h * factor, w * factor))
