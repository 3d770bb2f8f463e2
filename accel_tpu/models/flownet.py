"""FlowNet-S optical flow network with the DFF scale-field head.

Reference counterpart: the FlowNet half of
``dff_deeplab/symbols/resnet_v1_101_flownet_deeplab.py`` (SURVEY.md §2
"FlowNet symbol"): the FlowNet-"simple" encoder/decoder of Dosovitskiy et
al., run on the two frames concatenated channel-wise at reduced resolution,
plus the Deep-Feature-Flow addition of a per-pixel **scale field** that
elementwise-modulates the warped features (DFF paper, arXiv:1611.07715 §3).

Conventions here (weights are trained from scratch end-to-end through the
segmentation loss, so units are self-consistent):
- input: ``cat([cur, key], axis=-1)`` — the predicted flow maps a pixel of
  the *current* frame to its source location in the *key* frame, i.e. warp
  samples ``key_feat(p + flow(p))``.
- output flow is in pixels at the FlowNet *input* resolution, at 1/4 of
  that resolution spatially (standard FlowNet-S finest scale).
- final prediction convs are zero-initialised => identity warp at init,
  and the scale field is one-initialised => identity modulation.

Folded stem path (``stem_partial`` + ``from_conv1``): because conv1 is
linear in its 6 input channels, ``conv1(cat(d(cur), d(anchor)))`` splits
into two per-frame convs of the kernel halves, each with the factor-f
bilinear downscale folded in (ops/fold_downscale.py) — so group steps can
run the FlowNet prologue once per FRAME on full-res input (the downscaled
image and the 6-ch pair concat, both lane-hostile C<=6 full-res tensors,
never materialize) and combine partials per PAIR with a cheap add at 1/2f
resolution. ``_Conv1`` owns the parameters with nn.Conv-compatible
names/shapes/initializers, so checkpoints and init draws are unchanged.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class _Conv1(nn.Module):
    """FlowNet conv1 (7x7/2 on the 6-ch pair) with a splittable kernel.

    Parameters are named/shaped/initialized exactly as
    ``nn.Conv(features, (7,7), name='conv1')`` would create them, so the
    param tree (and every existing checkpoint) is unchanged.

    ``role``: 'pair' — the standard conv on ``cat(cur, anchor)`` input;
    'cur' / 'anchor' — apply ONE kernel half (in-channels 0:3 / 3:6) to a
    single full-res frame with a factor-``fold`` bilinear downscale folded
    into the kernel. The bias rides the 'cur' half only, so
    ``cur_part + anchor_part == conv1(pair)`` (interior-exact; edge ring
    per ops/fold_downscale.py).
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, role: str = "pair", fold: int = 1):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 6, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype
        x, k, b = x.astype(dt), kernel.astype(dt), bias.astype(dt)
        dn = ("NHWC", "HWIO", "NHWC")
        if role == "pair":
            y = jax.lax.conv_general_dilated(
                x, k, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn
            )
            return y + b
        from accel_tpu.ops.fold_downscale import fold_downscale_conv_fn

        half = k[:, :, :3, :] if role == "cur" else k[:, :, 3:, :]
        y = fold_downscale_conv_fn(fold)(
            x, half, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn
        )
        return y + b if role == "cur" else y


class FlowNetS(nn.Module):
    scale_channels: int = 19  # channels of the warped tensor to modulate
    use_scale_field: bool = True
    # uniform channel multiplier (DFF itself ships scaled-down FlowNets;
    # 0.5 quarters the FLOPs)
    width_mult: float = 1.0
    dtype: Any = jnp.bfloat16

    def setup(self):
        dt = self.dtype
        wm = lambda ch: max(int(ch * self.width_mult), 16)
        conv = lambda ch, k, s, name: nn.Conv(
            wm(ch), (k, k), strides=(s, s),
            padding=[(k // 2, k // 2)] * 2, dtype=dt, name=name,
        )
        predict = lambda ch, name: nn.Conv(
            ch, (3, 3), padding="SAME", dtype=jnp.float32,
            kernel_init=nn.initializers.zeros, name=name,
        )
        self.conv1 = _Conv1(wm(64), dtype=dt, name="conv1")
        self.conv2 = conv(128, 5, 2, "conv2")
        self.conv3 = conv(256, 5, 2, "conv3")
        self.conv3_1 = conv(256, 3, 1, "conv3_1")
        self.conv4 = conv(512, 3, 2, "conv4")
        self.conv4_1 = conv(512, 3, 1, "conv4_1")
        self.conv5 = conv(512, 3, 2, "conv5")
        self.conv5_1 = conv(512, 3, 1, "conv5_1")
        self.conv6 = conv(1024, 3, 2, "conv6")
        self.conv6_1 = conv(1024, 3, 1, "conv6_1")
        # "deconv" = 2x bilinear resize + 3x3 conv: same capacity as the
        # FlowNet-S 4x4/2 ConvTranspose but maps onto the MXU as a normal
        # conv (XLA transposed conv lowers poorly on TPU — measured 2.7ms
        # for the whole net at 512x1024 with deconvs, dominated by them)
        self.deconv5 = conv(512, 3, 1, "deconv5")
        self.deconv4 = conv(256, 3, 1, "deconv4")
        self.deconv3 = conv(128, 3, 1, "deconv3")
        self.deconv2 = conv(64, 3, 1, "deconv2")
        self.predict_flow6 = predict(2, "predict_flow6")
        self.predict_flow5 = predict(2, "predict_flow5")
        self.predict_flow4 = predict(2, "predict_flow4")
        self.predict_flow3 = predict(2, "predict_flow3")
        self.predict_flow2 = predict(2, "predict_flow2")
        if self.use_scale_field:
            # DFF scale modulation head: identity (==1) at init
            self.scale_field = nn.Conv(
                self.scale_channels, (3, 3), padding="SAME", dtype=jnp.float32,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.ones,
                name="scale_field",
            )

    def __call__(self, pair):
        """pair: (N, H, W, 6) = concat(cur, key). H, W divisible by 64.

        Returns (flow, scale): flow (N, H/4, W/4, 2), scale (N, H/4, W/4, S).
        """
        c1 = self.conv1(pair.astype(self.dtype))
        return self.from_conv1(c1)

    def stem_partial(self, frame, role: str, fold: int):
        """conv1 kernel-half partial of one FULL-res frame with the
        factor-``fold`` downscale folded in; see module docstring."""
        return self.conv1(frame, role=role, fold=fold)

    def from_conv1(self, c1_preact):
        """The FlowNet-S tail from the (pre-activation) conv1 output."""
        from accel_tpu.ops.upsample import bilinear_upsample

        dt = self.dtype

        def upconv(mod, x):
            return mod(bilinear_upsample(x, 2))

        def upflow(f):  # parameter-free 2x flow upsample; units are
            return bilinear_upsample(f, 2)  # FlowNet-input pixels at every level

        c1 = _leaky(c1_preact.astype(dt))
        c2 = _leaky(self.conv2(c1))
        c3 = _leaky(self.conv3(c2))
        c3 = _leaky(self.conv3_1(c3))
        c4 = _leaky(self.conv4(c3))
        c4 = _leaky(self.conv4_1(c4))
        c5 = _leaky(self.conv5(c4))
        c5 = _leaky(self.conv5_1(c5))
        c6 = _leaky(self.conv6(c5))
        c6 = _leaky(self.conv6_1(c6))

        flow6 = self.predict_flow6(c6.astype(jnp.float32))
        d5 = _leaky(upconv(self.deconv5, c6))
        cat5 = jnp.concatenate([c5, d5, upflow(flow6).astype(dt)], axis=-1)

        flow5 = self.predict_flow5(cat5.astype(jnp.float32))
        d4 = _leaky(upconv(self.deconv4, cat5))
        cat4 = jnp.concatenate([c4, d4, upflow(flow5).astype(dt)], axis=-1)

        flow4 = self.predict_flow4(cat4.astype(jnp.float32))
        d3 = _leaky(upconv(self.deconv3, cat4))
        cat3 = jnp.concatenate([c3, d3, upflow(flow4).astype(dt)], axis=-1)

        flow3 = self.predict_flow3(cat3.astype(jnp.float32))
        d2 = _leaky(upconv(self.deconv2, cat3))
        cat2 = jnp.concatenate([c2, d2, upflow(flow3).astype(dt)], axis=-1)

        flow2 = self.predict_flow2(cat2.astype(jnp.float32))

        if self.use_scale_field:
            scale = self.scale_field(cat2.astype(jnp.float32))
        else:
            scale = jnp.ones((*flow2.shape[:-1], self.scale_channels), jnp.float32)
        return flow2, scale
