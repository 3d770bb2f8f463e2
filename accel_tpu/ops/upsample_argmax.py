"""Fused bilinear-upsample + channel-argmax Pallas kernel (serving path).

Reference counterpart: the end of every test symbol — fixed-weight bilinear
``Deconvolution`` to input resolution followed by argmax on the host
(``deeplab/symbols/resnet_v1_101_deeplab.py`` + ``core/tester.pred_eval``,
SURVEY.md §3.3 step 7).  The reference materializes the full-resolution
19-channel score tensor; on TPU that is pure HBM waste — at 1024x2048x19
bf16 it is ~80 MB written + read per frame to produce an 8 MB uint8 class
map from a 300 KB stride-16 logits plane.

TPU-shaped reformulation: bilinear resize is linear and separable, so it is
exactly two small matmuls with interpolation matrices ``A (H, h)`` and
``B (w, W)`` extracted from ``jax.image.resize`` itself (resize applied to
the identity — guaranteeing the kernel matches the oracle's half-pixel /
edge-clamp semantics bit-for-bit up to sum order).  The kernel tiles output
rows, keeps the whole source plane in VMEM (it is tiny), runs the two
matmuls on the MXU per channel, and folds argmax into the channel loop as a
running (best, index) pair — the full-resolution logits never exist.

HBM traffic per frame: read ~300 KB logits + interp matrices, write H*W
int32 indices (cast to uint8 outside).  The MXU does ~64x the minimal
interpolation FLOPs (the interp matrices have <=2 nonzeros per row) — on
TPU those FLOPs are free next to the bandwidth saved.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from accel_tpu.ops.warp_pallas import _effective_platform


def resize_matrix(n_in: int, n_out: int, dtype=jnp.float32) -> jnp.ndarray:
    """(n_out, n_in) matrix M with M @ x == jax.image.resize(x, 'linear')
    along one axis.  Extracted from resize itself so the interpolation
    semantics (half-pixel centers, edge clamp) can never drift."""
    eye = jnp.eye(n_in, dtype=jnp.float32)
    # resize columns: (n_in, n_in) -> (n_out, n_in); row r holds the weights
    # of output sample r over the inputs.
    return jax.image.resize(eye, (n_out, n_in), method="linear").astype(dtype)


def _kernel(a_ref, b_ref, x_ref, o_ref, *, C: int):
    a = a_ref[...].astype(jnp.float32)  # (TR, h)
    b = b_ref[...].astype(jnp.float32)  # (w, W)
    best = jnp.full(o_ref.shape[1:], -jnp.inf, jnp.float32)
    idx = jnp.zeros(o_ref.shape[1:], jnp.int32)
    for c in range(C):  # static unroll; C is the class count (19/11)
        xc = x_ref[0, c].astype(jnp.float32)  # (h, w)
        rows = jax.lax.dot(a, xc, preferred_element_type=jnp.float32)
        y = jax.lax.dot(rows, b, preferred_element_type=jnp.float32)
        take = y > best  # strict: first max wins, matching jnp.argmax
        best = jnp.where(take, y, best)
        idx = jnp.where(take, c, idx)
    o_ref[0] = idx


@functools.partial(jax.jit, static_argnames=("out_hw", "row_block", "interpret"))
def _upsample_argmax_nchw(logits_nchw, out_hw, row_block, interpret):
    N, C, h, w = logits_nchw.shape
    H, W = out_hw
    TR = row_block
    a = resize_matrix(h, H)
    b = resize_matrix(w, W).T  # (w, W)
    grid = (N, H // TR)
    out = pl.pallas_call(
        functools.partial(_kernel, C=C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR, h), lambda n, i: (i, 0)),
            pl.BlockSpec((w, W), lambda n, i: (0, 0)),
            pl.BlockSpec((1, C, h, w), lambda n, i: (n, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TR, W), lambda n, i: (n, i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W), jnp.int32),
        interpret=interpret,
    )(a, b, logits_nchw)
    return out.astype(jnp.uint8)


def upsample_argmax(
    logits: jnp.ndarray,
    out_hw: tuple[int, int],
    *,
    row_block: int = 128,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """argmax(resize_bilinear(logits, out_hw), axis=-1) without the full-res
    intermediate.  ``logits``: (N, h, w, C) -> (N, H, W) uint8.

    Exact bilinear semantics (same interp weights as the oracle; the kernel
    accumulates in f32, so vs a bf16 oracle the only divergences are
    top-2-within-rounding ties).  Requires H % row_block == 0; callers with
    odd sizes use the oracle path (`clip_predictions` dispatches).
    """
    if interpret is None:
        interpret = _effective_platform() != "tpu"
    N, h, w, C = logits.shape
    H, W = out_hw
    if H % row_block != 0:
        raise ValueError(f"H={H} not divisible by row_block={row_block}")
    x = jnp.transpose(logits, (0, 3, 1, 2))  # channel-indexed planes
    return _upsample_argmax_nchw(x, (H, W), row_block, bool(interpret))


def upsample_argmax_vmem_bytes(
    h: int, w: int, W: int, C: int, row_block: int = 128, in_bytes: int = 4
) -> int:
    """Per-grid-step VMEM footprint estimate (f32 compute)."""
    return (
        row_block * h * 4  # A block
        + w * W * 4  # B
        + C * h * w * in_bytes  # source block (all C planes)
        + 3 * row_block * W * 4  # y, best, idx
    )


# leave headroom under the ~16 MB/core VMEM for double-buffered block
# staging and the compiler's own scratch
_VMEM_BUDGET = 12 * 1024 * 1024


def upsample_argmax_or_oracle(logits: jnp.ndarray, out_hw) -> jnp.ndarray:
    """The serving-tail dispatch policy, shared by clip_predictions, the
    key/cur predictors and bench: the fused kernel on TPU when the output
    rows align with the row block and the working set fits VMEM; the
    materializing XLA resize+argmax oracle otherwise (off-TPU the kernel
    would run interpreted — strictly worse than the oracle)."""
    H, W = int(out_hw[0]), int(out_hw[1])
    N, h, w, C = logits.shape
    fits = upsample_argmax_vmem_bytes(
        h, w, W, C, in_bytes=logits.dtype.itemsize
    ) <= _VMEM_BUDGET
    if _effective_platform() == "tpu" and H % 128 == 0 and W % 128 == 0 and fits:
        return upsample_argmax(logits, (H, W))
    from accel_tpu.ops.upsample import resize_bilinear

    return jnp.argmax(resize_bilinear(logits, (H, W)), axis=-1).astype(jnp.uint8)
