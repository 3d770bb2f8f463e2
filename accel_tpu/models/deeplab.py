"""DeepLab (LargeFOV-style) segmentation head + per-frame model.

Reference counterpart: ``deeplab/symbols/resnet_v1_101_deeplab.py`` — dilated
backbone, an atrous fc6 conv, a 1x1 score conv to NUM_CLASSES, and a
fixed-weight bilinear upsample back to input resolution (SURVEY.md §2
"DeepLab symbol"). Score maps stay at feature stride until the very end so
the expensive pixels ride at low resolution.

The head is split into ``features`` (fc6) and ``scores`` (1x1 classifier)
because the DFF family caches-and-warps the fc6 *feature* tensor while Accel
caches-and-warps the *score* tensor (SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from accel_tpu.models.resnet import DilatedResNet
from accel_tpu.ops.upsample import resize_bilinear


class DeepLabHead(nn.Module):
    num_classes: int = 19
    head_channels: int = 1024
    head_dilation: int = 6
    dtype: Any = jnp.bfloat16
    quantize: bool = False
    dilated_conv: str = "auto"

    @nn.compact
    def __call__(self, feat, mode: str = "full"):
        """mode: 'full' = fc6+score, 'scores' = score only, 'features' = fc6 only."""
        from accel_tpu.models.resnet import _pick_conv_fn

        x = feat
        if mode in ("full", "features"):
            d = self.head_dilation
            x = nn.Conv(
                self.head_channels, (3, 3),
                kernel_dilation=(d, d), padding=[(d, d), (d, d)],
                dtype=self.dtype, name="fc6",
                conv_general_dilated=_pick_conv_fn(
                    self.quantize, self.dilated_conv, d
                ),
            )(x)
            x = nn.relu(x)
            if mode == "features":
                return x
        # score head in f32: 19 channels of logits feeding softmax/argmax
        x = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32, name="score")(
            x.astype(jnp.float32)
        )
        return x


class DeepLab(nn.Module):
    """Per-frame segmentation model (the reference's baseline family)."""

    depth: int = 101
    num_classes: int = 19
    output_stride: int = 16
    head_channels: int = 1024
    head_dilation: int = 6
    norm: str = "frozenbn"
    stem: str = "conv7"
    dtype: Any = jnp.bfloat16
    # int8 serving path (residual stages + fc6; stem and the 19-ch score
    # head stay float) — see ops/quant.py
    quantize: bool = False
    # 'direct' | 's2b' | 'auto': lowering for dilated convs (ops/dilated.py)
    dilated_conv: str = "auto"
    # >1: fold a factor-f bilinear input downscale into the stem conv
    # (ops/fold_downscale.py); the caller passes FULL-res images
    input_downscale: int = 1

    def setup(self):
        # 'pallas_fc6': the nine-tap Pallas kernel for the atrous fc6 HEAD
        # only, direct lowering in the backbone. The full-model 'pallas'
        # mode loses in-program because pallas_call is a fusion barrier and
        # the backbone's 23+ dilated blocks each pay a standalone
        # BN/relu/residual HBM pass (BASELINE.md r2); fc6's epilogue is just
        # relu -> 1x1 classifier, so the barrier penalty is minimal where
        # the halo win (d=6 on a wide conv) is largest.
        backbone_mode = (
            "auto" if self.dilated_conv == "pallas_fc6" else self.dilated_conv
        )
        head_mode = (
            "pallas" if self.dilated_conv == "pallas_fc6" else self.dilated_conv
        )
        self.backbone = DilatedResNet(
            depth=self.depth,
            output_stride=self.output_stride,
            norm=self.norm,
            stem=self.stem,
            dtype=self.dtype,
            quantize=self.quantize,
            dilated_conv=backbone_mode,
            input_downscale=self.input_downscale,
        )
        self.head = DeepLabHead(
            num_classes=self.num_classes,
            head_channels=self.head_channels,
            head_dilation=self.head_dilation,
            dtype=self.dtype,
            quantize=self.quantize,
            dilated_conv=head_mode,
        )

    def __call__(self, image, train: bool = False, mode: str = "full"):
        """image (N,H,W,3) normalized -> logits/features at feature stride."""
        feat = self.backbone(image, train=train)
        return self.head(feat, mode=mode)

    def scores_from_features(self, features):
        return self.head(features, mode="scores")

    def predict_full(self, image, train: bool = False):
        """Full-resolution logits (bilinear upsample of stride-level scores)."""
        score = self(image, train=train)
        return resize_bilinear(score, image.shape[1:3])
