"""Fold an integer-factor bilinear downscale into the consumer's first conv.

Motivation (tools/profile_group_step.py, v5e, B=4 k=5 @1024x2048): every
full-res C=3 image op runs at ~60 GB/s — ~1/10th of HBM bandwidth — because
3-channel tensors are lane-hostile, so the ``resize -> stem conv`` prologue
of a downscaled branch costs more than the stem itself (fast preset: the
update branch's half-res prologue is ~0.43 ms/frame, the flow prologue
~0.15 ms/frame). Downscale-then-conv is a composition of two linear maps,
so it folds into ONE strided conv on the full-res input whose kernel is the
(learned) stem kernel dilated by the factor and convolved with the fixed
triangle (antialiasing) taps:

    y[o] = sum_k w[k] * d(x)[s*o + k - q],   d(x)[i] = sum_j t[j] x[f*i + j - p]
         = sum_m W'[m] * x[f*s*o + m - (f*q + p)],  W'[m] = sum_k w[k] t[m - f*k]

i.e. composed stride ``f*s``, kernel support ``f*(S-1) + T``, padding
``f*q + p``. The downscaled image never materializes; the composed kernel
is built from the live param at trace time (einsum against a constant tap
matrix), so the transform is differentiable, checkpoint-compatible, and a
pure serving/lowering knob — exactly the ``nn.Conv(conv_general_dilated=…)``
hook pattern ops/quant.py uses.

Boundary semantics (two effects, both confined to the ring of outputs whose
conv window reaches outside the valid downscaled image):
1. ``jax.image.resize`` renormalizes edge rows whose triangle taps fall
   outside the image; a single conv cannot represent that per-row rescale.
2. The two-stage form's conv zero-padding zeroes whole OUT-OF-RANGE
   downscaled rows, while the folded kernel's outer taps still catch the
   outermost ~1 valid input pixel through the phantom row's triangle spill.
Every output whose window stays within ``[0, n/f)`` downscaled rows/cols is
exact vs downscale+conv (tests/test_fold_downscale.py). At 1024x2048 with
the f=2-folded 7x7/2 stem that ring is the outermost ~2 of 256 stem rows.

Measured verdict pending the in-program A/B (ops/dilated.py standing
policy): the composed kernel has ~f^2 x the stem FLOPs (16x16 vs 7x7 taps
at f=2), trading MXU time for the eliminated C=3 bandwidth passes.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from accel_tpu.ops.upsample import _down_taps


@functools.lru_cache(maxsize=None)
def _compose_matrix(f: int, S: int):
    """(S', S) matrix M with M[m, k] = t[m - f*k]; S' = f*(S-1) + T.

    Composes the factor-``f`` triangle downscale with an ``S``-tap conv
    along one axis: W'[m] = sum_k M[m, k] w[k].
    """
    offs, t = _down_taps(f)
    T = len(t)
    Sp = f * (S - 1) + T
    M = np.zeros((Sp, S), np.float32)
    for k in range(S):
        M[f * k : f * k + T, k] = t
    return M


def fold_downscale_conv_fn(f: int):
    """A ``lax.conv_general_dilated`` drop-in (flax ``nn.Conv`` hook) that
    applies the conv to a factor-``f`` bilinear-downscaled view of the
    input by composing the downscale into the kernel. The caller passes
    the FULL-res input; strides/padding arriving from the wrapped conv are
    rewritten per the composition algebra above. NHWC/HWIO only (the
    layouts flax emits)."""
    offs, _t = _down_taps(f)
    p_lo = int(-offs[0])
    p_hi = int(offs[-1] - (f - 1))

    def conv_fn(
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
        assert lhs_dilation is None or tuple(lhs_dilation) == (1, 1)
        assert rhs_dilation is None or tuple(rhs_dilation) == (1, 1)
        assert feature_group_count == 1
        Sh, Sw = rhs.shape[0], rhs.shape[1]
        Mh = jax.numpy.asarray(_compose_matrix(f, Sh))
        Mw = jax.numpy.asarray(_compose_matrix(f, Sw))
        rhs_c = jax.numpy.einsum(
            "mk,nl,klio->mnio", Mh, Mw, rhs.astype(jax.numpy.float32)
        ).astype(rhs.dtype)
        (qh_lo, qh_hi), (qw_lo, qw_hi) = padding
        return jax.lax.conv_general_dilated(
            lhs,
            rhs_c,
            window_strides=(f * window_strides[0], f * window_strides[1]),
            padding=((f * qh_lo + p_lo, f * qh_hi + p_hi),
                     (f * qw_lo + p_lo, f * qw_hi + p_hi)),
            dimension_numbers=dimension_numbers,
            precision=precision,
        )

    return conv_fn
