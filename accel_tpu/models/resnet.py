"""Dilated ResNet v1 backbones (18/34/50/101), NHWC, TPU-first.

Reference counterpart: the MXNet symbol builders
``deeplab/symbols/resnet_v1_101_deeplab.py`` and the ResNet-18/34/50 update
branches of the Accel fusion symbols (SURVEY.md §2 "DeepLab symbol",
"Accel fusion symbol"). Dilation pattern follows the DeepLab recipe: at
``output_stride=16`` stage 4 runs stride-1/dilation-2; at ``output_stride=8``
stages 3 and 4 run stride-1 with dilations 2 and 4.

TPU-first choices: NHWC layout (XLA's native conv layout on TPU), bfloat16
compute with float32 params/BN, ``conv_general_dilated`` via flax Conv
``kernel_dilation`` for the atrous convs (maps directly onto the MXU).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from accel_tpu.ops.dilated import (
    s2b_conv_general_dilated,
    shift1x1_conv_general_dilated,
)
from accel_tpu.ops.quant import int8_conv_general_dilated

STAGE_PLANS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class FrozenBatchNorm(nn.Module):
    """BN used as a fixed affine transform (MSRA codebases freeze BN stats
    and train only with pretrained means/vars; with from-scratch training
    this degenerates to a learned scale+bias, which is what we want under
    small per-chip batch sizes anyway)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        # fold to one per-channel FMA computed in f32 (params are tiny),
        # applied in the activation dtype so XLA fuses it into the conv
        # epilogue instead of round-tripping big activations through f32
        inv = scale / jnp.sqrt(var.value + 1e-5)
        shift = bias - mean.value * inv
        y = x * inv.astype(x.dtype) + shift.astype(x.dtype)
        return y.astype(self.dtype)


class _Conv1Params(nn.Module):
    """Param holder producing the SAME tree as nn.Conv(name='conv1') —
    the fused7 stem consumes the kernel directly (checkpoint-compatible
    with the conv7 stem)."""

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 3, 64),
            jnp.float32)


class _FoldedBNParams(nn.Module):
    """Param holder matching FrozenBatchNorm(name='bn')'s tree, returning
    the folded (inv, shift) affine instead of applying it."""

    @nn.compact
    def __call__(self):
        c = 64
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        inv = scale / jnp.sqrt(var.value + 1e-5)
        shift = bias - mean.value * inv
        return inv, shift


def make_norm(norm: str, dtype, train: bool):
    """norm: 'frozenbn' (reference behavior with pretrained stats),
    'batchnorm' (mutable running stats), or 'groupnorm' (batch-independent —
    the TPU-friendly from-scratch default: no cross-replica stat sync, no
    mutable state threading)."""
    if norm == "frozenbn":
        return lambda name=None: FrozenBatchNorm(dtype=dtype, name=name)
    if norm == "batchnorm":
        return lambda name=None: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=dtype, name=name,
        )
    if norm == "groupnorm":
        return lambda name=None: nn.GroupNorm(
            num_groups=None, group_size=16, epsilon=1e-5, dtype=dtype, name=name
        )
    raise ValueError(f"unknown norm {norm}")


def _pick_conv_fn(quantize: bool, dilated_conv: str, dilation: int):
    """Conv implementation for a block: int8 serving quantization takes
    precedence; 's2b' routes dilated 3x3 convs through the space-to-batch
    lowering (ops/dilated.py — exact, checkpoint-compatible; ineligible
    convs fall back to the plain lowering inside the hook); 'auto' (the
    default) is the measured per-backend policy — on TPU v5e the direct
    rhs_dilation lowering won or tied every hot shape IN-PROGRAM (the one
    isolated microbench win, shift1x1 on the wide fc6 head, measured 4/4
    slower inside the full model — ops/dilated.py docstring), so auto
    resolves to the plain flax path."""
    if quantize:
        return int8_conv_general_dilated
    if dilation > 1 and dilated_conv == "s2b":
        return s2b_conv_general_dilated
    if dilation > 1 and dilated_conv == "shift1x1":
        return shift1x1_conv_general_dilated
    if dilation > 1 and dilated_conv == "pallas":
        from accel_tpu.ops.dilated_pallas import pallas_conv_general_dilated

        return pallas_conv_general_dilated
    return None


class BasicBlock(nn.Module):
    width: int
    stride: int = 1
    dilation: int = 1
    norm: str = "frozenbn"
    dtype: Any = jnp.bfloat16
    quantize: bool = False
    dilated_conv: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = make_norm(self.norm, self.dtype, train)
        conv_fn = _pick_conv_fn(self.quantize, self.dilated_conv, self.dilation)
        residual = x
        y = nn.Conv(
            self.width, (3, 3), strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding=[(self.dilation, self.dilation)] * 2,
            use_bias=False, dtype=self.dtype, name="conv1",
                conv_general_dilated=conv_fn,
        )(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.width, (3, 3),
            kernel_dilation=(self.dilation, self.dilation),
            padding=[(self.dilation, self.dilation)] * 2,
            use_bias=False, dtype=self.dtype, name="conv2",
                conv_general_dilated=conv_fn,
        )(y)
        y = norm(name="bn2")(y)
        if residual.shape[-1] != self.width or self.stride != 1:
            residual = nn.Conv(
                self.width, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample",
                conv_general_dilated=conv_fn,
            )(residual)
            residual = norm(name="ds_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    width: int  # inner width; output is 4*width
    stride: int = 1
    dilation: int = 1
    norm: str = "frozenbn"
    dtype: Any = jnp.bfloat16
    quantize: bool = False
    dilated_conv: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = make_norm(self.norm, self.dtype, train)
        conv_fn = _pick_conv_fn(self.quantize, self.dilated_conv, self.dilation)
        out_ch = self.width * 4
        residual = x
        y = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1", conv_general_dilated=conv_fn)(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.width, (3, 3), strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding=[(self.dilation, self.dilation)] * 2,
            use_bias=False, dtype=self.dtype, name="conv2",
                conv_general_dilated=conv_fn,
        )(y)
        y = norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3", conv_general_dilated=conv_fn)(y)
        y = norm(name="bn3")(y)
        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = nn.Conv(
                out_ch, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample",
                conv_general_dilated=conv_fn,
            )(residual)
            residual = norm(name="ds_bn")(residual)
        return nn.relu(y + residual)


def space_to_depth(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/b, W/b, b*b*C); layout [dy, dx, c] innermost."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // block, block, w // block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // block, w // block, block * block * c)


def embed_conv7_as_s2d(w7: jnp.ndarray) -> jnp.ndarray:
    """Exactly embed a 7x7/stride-2 stem kernel (7,7,C,O) into the
    space-to-depth form: a (4,4,4C,O) stride-1 kernel over s2d(x, 2) with
    padding (2,1). Used by the weight converters; the equivalence is
    verified in tests."""
    k7 = jnp.asarray(w7)
    c, o = k7.shape[2], k7.shape[3]
    k4 = jnp.zeros((4, 4, 4 * c, o), k7.dtype)
    for u in range(-3, 4):
        a, dy = (u + 4) // 2 - 2, (u + 4) % 2
        for v in range(-3, 4):
            b, dx = (v + 4) // 2 - 2, (v + 4) % 2
            k4 = k4.at[a + 2, b + 2, (dy * 2 + dx) * c : (dy * 2 + dx + 1) * c, :].set(
                k7[u + 3, v + 3]
            )
    return k4


class DilatedResNet(nn.Module):
    """ResNet v1 trunk with DeepLab dilation; returns the C5 feature map.

    ``output_stride`` in {8, 16, 32}.

    ``stem``: 'conv7' = the classic 7x7/2 conv; 's2d' = space-to-depth(2) +
    4x4 conv — an exact reparametrization (every 7x7/2 map embeds; see
    ``embed_conv7_as_s2d``) that avoids the TPU-hostile 3-channel
    half-res conv (the MLPerf ResNet stem trick).
    """

    depth: int = 101
    output_stride: int = 16
    norm: str = "frozenbn"
    stem: str = "conv7"
    dtype: Any = jnp.bfloat16
    # int8 serving path for the residual stages (stem stays float: 3-ch
    # input, bandwidth-bound, and first-layer quantization costs the most
    # accuracy). Checkpoint-compatible — same param tree, weights are
    # quantized at trace time (ops/quant.py).
    quantize: bool = False
    # 'direct' | 's2b' | 'auto': lowering for the dilated stage convs (ops/dilated.py)
    dilated_conv: str = "auto"
    # >1: the caller passes a FULL-res input and the factor-f bilinear
    # downscale is folded into the stem conv (ops/fold_downscale.py) —
    # the downscaled image never materializes. Same param tree as the
    # resize+conv7 path (checkpoint-compatible); conv7 stem only.
    input_downscale: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_kind, plan = STAGE_PLANS[self.depth]
        block_cls = BasicBlock if block_kind == "basic" else Bottleneck
        norm = make_norm(self.norm, self.dtype, train)

        # stage strides/dilations per output stride
        if self.output_stride == 32:
            strides, dils = (1, 2, 2, 2), (1, 1, 1, 1)
        elif self.output_stride == 16:
            strides, dils = (1, 2, 2, 1), (1, 1, 1, 2)
        elif self.output_stride == 8:
            strides, dils = (1, 2, 1, 1), (1, 1, 2, 4)
        else:
            raise ValueError(f"bad output_stride {self.output_stride}")

        x = x.astype(self.dtype)
        if self.input_downscale > 1:
            if self.stem != "conv7":
                raise ValueError("input_downscale folding needs the conv7 stem")
            from accel_tpu.ops.fold_downscale import fold_downscale_conv_fn

            x = nn.Conv(
                64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                use_bias=False, dtype=self.dtype, name="conv1",
                conv_general_dilated=fold_downscale_conv_fn(self.input_downscale),
            )(x)
        elif self.stem == "s2d":
            x = space_to_depth(x, 2)
            x = nn.Conv(
                64, (4, 4), padding=[(2, 1), (2, 1)],
                use_bias=False, dtype=self.dtype, name="conv1_s2d",
            )(x)
        elif self.stem == "fused7":
            # fused Pallas stem (ops/fused_stem.py): conv7x7/2 + folded-BN
            # affine + relu in one kernel over a dense-lane input layout —
            # the r5 per-layer roofline's worst layer (1.6-5.6% of bound,
            # C=3 lane padding) attacked directly. Same param tree as the
            # conv7 stem (checkpoint-compatible); needs the affine-foldable
            # frozenbn norm. Norm/relu happen inside the kernel.
            if self.norm != "frozenbn":
                raise ValueError("stem='fused7' requires norm='frozenbn' "
                                 "(the BN must fold to a per-channel affine)")
            from accel_tpu.ops.fused_stem import fused_stem

            kernel = _Conv1Params(name="conv1")()
            inv, shift = _FoldedBNParams(name="bn")()
            x = fused_stem(x, kernel, inv, shift)
        else:
            x = nn.Conv(
                64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                use_bias=False, dtype=self.dtype, name="conv1",
            )(x)
        if self.stem != "fused7":
            x = norm(name="bn")(x)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        widths = (64, 128, 256, 512)
        for si, (n_blocks, w, s, d) in enumerate(zip(plan, widths, strides, dils)):
            for bi in range(n_blocks):
                x = block_cls(
                    width=w,
                    stride=s if bi == 0 else 1,
                    # DeepLab "multi-grid"-free recipe: uniform dilation per stage
                    dilation=d,
                    norm=self.norm,
                    dtype=self.dtype,
                    quantize=self.quantize,
                    dilated_conv=self.dilated_conv,
                    name=f"layer{si + 1}_block{bi}",
                )(x, train=train)
        return x
