"""Space-to-batch lowering for atrous (dilated) convolutions.

The dilated 3x3 convs of the DeepLab recipe (reference:
``deeplab/symbols/resnet_v1_101_deeplab.py`` dilated stages + atrous fc6 —
SURVEY.md §2 "DeepLab symbol") lower on TPU as `rhs_dilation` convs. XLA's
direct lowering pays for the dilation holes in MXU tiling; the classic
space-to-batch rewrite is exact for stride-1 odd-kernel dilated convs:

    subsample the input into d*d phase grids  (N*d*d, H/d, W/d, C)
    run a DENSE KxK conv on all phases in one batch
    re-interleave the outputs

turning one dilated conv into a dense conv at d^2 x batch and 1/d^2
spatial — the MXU-friendly shape. Wired through flax's
``nn.Conv(conv_general_dilated=...)`` hook, so the parameter tree (and
every checkpoint) is unchanged; selection is a serving/arch knob
(``network.dilated_conv: s2b``), not a semantic change. Falls back to the
plain lowering for any conv the rewrite doesn't cover.

Measure before enabling: `tools/bench_dilated_conv.py` times direct vs s2b
(all factors) vs same-FLOPs dense per hot shape on the current backend.
Measured on TPU v5e (B=4, bf16, 2026-08-18), arms built exactly the way
flax ``nn.Conv`` lowers them (no forced f32 accumulation), TF/s
direct / best-s2b / dense:

    128x256  256->256  d=2   127 /  99 / 132
    128x256  512->512  d=4   109 / 111 / 125
    128x256  512->1024 d=6   153 / 151 / 148
    128x256 2048->1024 d=6   134 / 135 / 156
    128x256 1024->256  d=4    84 /  82 /  94
     64x128  512->512  d=2   165 / 142 / 254
     64x128 2048->1024 d=6   115 / 116 / 152
     64x128  512->1024 d=6   150 / 146 / 152

s2b is neutral-to-losing on every DeepLab hot shape on this backend — the
direct ``rhs_dilation`` lowering is already within ~2% of the best phase
decomposition, and the real gap to same-FLOPs dense (up to 35% at
64x128 d=2) is halo/tiling overhead that the rewrite doesn't recover. An
earlier measurement that showed 20-40% s2b wins forced
``preferred_element_type=f32`` on both arms, which disproportionately
slows the direct dilated lowering — it did not reflect what the models
run.

The shift1x1 tap decomposition (below) was then swept the same way
(2026-08-18, full table re-measured with shift1x1 + s2b arms): it loses
on every dilated *stage* shape (65-117 TF/s vs direct's 83-148 — nine
dispatches of shifted-operand traffic cost more than the halo overhead
they avoid), EXCEPT the wide atrous fc6 head at the os16 plane, where the
ISOLATED conv is a stable, 6/6-reproducible win:

    64x128, 2048->1024, d=6:  shift1x1 9.3ms/132 TF/s  direct 10.7ms/115

**That win does not transfer to the full program.** Routing exactly that
fc6 shape through shift1x1 inside the whole DeepLab-101 per-frame model
measured 4/4 runs SLOWER (10.1 vs 9.8 ms/frame, +3%) — in context XLA
fuses the fc6 producer/epilogue and lays out the 64x128x2048 operand for
the surrounding graph, and the nine pad/slice taps force materialized
copies the isolated microbench never pays. Shape-local microbench wins
must be re-measured in-program before wiring (this is the second lowering
whose isolated win evaporated in context — see the f32-accumulation
artifact above).

Model knob ``network.dilated_conv: auto`` (the default) therefore
resolves to the direct lowering on TPU; ``s2b`` (with ``_factor``) and
``shift1x1`` stay available as explicit, exactness-tested knobs for
backends where the trade differs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _as_pairs(padding):
    try:
        return tuple((int(lo), int(hi)) for lo, hi in padding)
    except TypeError:
        return None


def s2b_conv_general_dilated(
    lhs,
    rhs,
    window_strides,
    padding,
    lhs_dilation=None,
    rhs_dilation=None,
    dimension_numbers=None,
    feature_group_count=1,
    precision=None,
    _factor=None,
):
    """Drop-in for ``lax.conv_general_dilated`` (flax ``nn.Conv`` hook
    signature) that lowers stride-1 "same"-padded dilated convs via
    space-to-batch phase decomposition. Exact (same MACs per output pixel,
    zero padding included); differentiable (reshape/transpose/conv only).

    Rewrite applies when: rank-4 NHWC/HWIO, window_strides (1,1), no input
    dilation, feature_group_count 1, odd square kernel, rhs_dilation
    (d, d) with d > 1, and padding == d*(K-1)/2 per side (the "same"
    padding every DeepLab atrous conv uses). Anything else falls through to
    the plain lowering unchanged.

    ``_factor`` decomposes by f | d instead of the full d: f*f phase grids
    each carrying the residual dilation d/f (f == d gives dense phases).
    A tap at offset ±d in image space lands at offset ±d/f in phase space,
    so the per-phase conv is the same kernel at dilation d/f with its own
    "same" padding — exactness is unchanged. Useful when d doesn't divide
    H/W but a factor of it does, or when full decomposition makes the
    per-phase grid too small to tile well (fc6's d=6).
    """
    def fallback():
        return lax.conv_general_dilated(
            lhs, rhs, window_strides, padding,
            lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
            dimension_numbers=dimension_numbers,
            feature_group_count=feature_group_count, precision=precision,
        )

    if lhs.ndim != 4 or rhs.ndim != 4 or feature_group_count != 1:
        return fallback()
    d_pair = tuple(rhs_dilation) if rhs_dilation is not None else (1, 1)
    if d_pair[0] != d_pair[1] or d_pair[0] <= 1:
        return fallback()
    d = int(d_pair[0])
    if tuple(window_strides) != (1, 1):
        return fallback()
    if lhs_dilation is not None and tuple(lhs_dilation) != (1, 1):
        return fallback()
    dn = lax.conv_dimension_numbers(lhs.shape, rhs.shape, dimension_numbers)
    nhwc = lax.conv_dimension_numbers(lhs.shape, rhs.shape, ("NHWC", "HWIO", "NHWC"))
    if dn != nhwc:
        return fallback()
    kh, kw = rhs.shape[0], rhs.shape[1]
    if kh != kw or kh % 2 == 0:
        return fallback()
    pad = _as_pairs(padding)
    same = d * (kh - 1) // 2
    if pad != ((same, same), (same, same)):
        return fallback()

    f = d if _factor is None else int(_factor)
    if f <= 1 or d % f != 0:
        return fallback()
    r = d // f  # residual dilation carried by each phase grid

    n, h0, w0, c = lhs.shape
    o = rhs.shape[-1]
    h = -(-h0 // f) * f
    w = -(-w0 // f) * f
    x = lhs
    if (h, w) != (h0, w0):
        # zero-fill up to a multiple of f; contributions from the fill are
        # zero, exactly like the dilated conv's own zero padding — cropped
        # back below
        x = jnp.pad(x, ((0, 0), (0, h - h0), (0, w - w0), (0, 0)))
    # (N, H/f, f, W/f, f, C) -> (N*f*f, H/f, W/f, C): each of the f*f
    # phase grids sees the dilated taps at stride d/f (dense when f == d)
    x = x.reshape(n, h // f, f, w // f, f, c).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(n * f * f, h // f, w // f, c)
    p = r * (kh - 1) // 2
    y = lax.conv_general_dilated(
        x, rhs, (1, 1), ((p, p), (p, p)),
        rhs_dilation=(r, r) if r > 1 else None,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )
    y = y.reshape(n, f, f, h // f, w // f, o).transpose(0, 3, 1, 4, 2, 5)
    return y.reshape(n, h, w, o)[:, :h0, :w0]


def _shift2d(x, dy: int, dx: int):
    """out[n, y, x, c] = x[n, y+dy, x+dx, c], zero outside — the shifted
    view a conv tap at offset (dy, dx) reads under zero 'same' padding."""
    pad = ((0, 0), (max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0)), (0, 0))
    x = jnp.pad(x, pad)
    h, w = x.shape[1] - abs(dy), x.shape[2] - abs(dx)
    return lax.dynamic_slice_in_dim(
        lax.dynamic_slice_in_dim(x, max(dy, 0), h, axis=1), max(dx, 0), w, axis=2
    )


def shift1x1_conv_general_dilated(
    lhs,
    rhs,
    window_strides,
    padding,
    lhs_dilation=None,
    rhs_dilation=None,
    dimension_numbers=None,
    feature_group_count=1,
    precision=None,
):
    """Tap-decomposition lowering: a stride-1 "same"-padded dilated KxK conv
    as the sum over the K*K taps of a 1x1 conv (one clean MXU matmul per
    tap) on the correspondingly shifted input:

        y = sum_{i,j} shift(x, d*(i-c), d*(j-c)) @ W[i, j]

    Exact (identical MACs, zero padding included) and differentiable
    (pad/slice/conv/add only). Motivation: the measured direct-vs-dense gap
    on TPU v5e (up to 35% at 64x128, table above) is halo/tiling overhead
    inside XLA's dilated-conv emitter; each tap here is a dense
    spatial-points x channels matmul with no halo at all — the trade is K*K
    kernel launches + shifted-operand traffic vs that emitter overhead.
    Measure per backend with tools/bench_dilated_conv.py before enabling
    (``network.dilated_conv: shift1x1``).

    Same applicability guards as the s2b rewrite; ineligible convs fall
    through to the plain lowering.
    """
    def fallback():
        return lax.conv_general_dilated(
            lhs, rhs, window_strides, padding,
            lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
            dimension_numbers=dimension_numbers,
            feature_group_count=feature_group_count, precision=precision,
        )

    if lhs.ndim != 4 or rhs.ndim != 4 or feature_group_count != 1:
        return fallback()
    d_pair = tuple(rhs_dilation) if rhs_dilation is not None else (1, 1)
    if d_pair[0] != d_pair[1] or d_pair[0] <= 1:
        return fallback()
    d = int(d_pair[0])
    if tuple(window_strides) != (1, 1):
        return fallback()
    if lhs_dilation is not None and tuple(lhs_dilation) != (1, 1):
        return fallback()
    dn = lax.conv_dimension_numbers(lhs.shape, rhs.shape, dimension_numbers)
    nhwc = lax.conv_dimension_numbers(lhs.shape, rhs.shape, ("NHWC", "HWIO", "NHWC"))
    if dn != nhwc:
        return fallback()
    kh, kw = rhs.shape[0], rhs.shape[1]
    if kh != kw or kh % 2 == 0:
        return fallback()
    pad = _as_pairs(padding)
    same = d * (kh - 1) // 2
    if pad != ((same, same), (same, same)):
        return fallback()

    c = (kh - 1) // 2
    out = None
    for i in range(kh):
        for j in range(kw):
            xs = _shift2d(lhs, d * (i - c), d * (j - c))
            t = lax.conv_general_dilated(
                xs, rhs[i:i + 1, j:j + 1], (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
            )
            out = t if out is None else out + t
    return out




