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
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class FlowNetS(nn.Module):
    scale_channels: int = 19  # channels of the warped tensor to modulate
    use_scale_field: bool = True
    # uniform channel multiplier (DFF itself ships scaled-down FlowNets;
    # 0.5 quarters the FLOPs)
    width_mult: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pair):
        """pair: (N, H, W, 6) = concat(cur, key). H, W divisible by 64.

        Returns (flow, scale): flow (N, H/4, W/4, 2), scale (N, H/4, W/4, S).
        """
        from accel_tpu.ops.upsample import bilinear_upsample

        dt = self.dtype
        wm = lambda ch: max(int(ch * self.width_mult), 16)
        conv = lambda ch, k, s, name: nn.Conv(
            wm(ch), (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2, dtype=dt, name=name
        )
        # "deconv" = 2x bilinear resize + 3x3 conv: same capacity as the
        # FlowNet-S 4x4/2 ConvTranspose but maps onto the MXU as a normal
        # conv (XLA transposed conv lowers poorly on TPU — measured 2.7ms
        # for the whole net at 512x1024 with deconvs, dominated by them)
        upconv = lambda ch, name: (
            lambda x: nn.Conv(wm(ch), (3, 3), padding="SAME", dtype=dt, name=name)(
                bilinear_upsample(x, 2)
            )
        )
        predict = lambda ch, name: nn.Conv(
            ch, (3, 3), padding="SAME", dtype=jnp.float32,
            kernel_init=nn.initializers.zeros, name=name,
        )

        def upflow(f):  # parameter-free 2x flow upsample; units are
            return bilinear_upsample(f, 2)  # FlowNet-input pixels at every level

        x = pair.astype(dt)
        c1 = _leaky(conv(64, 7, 2, "conv1")(x))
        c2 = _leaky(conv(128, 5, 2, "conv2")(c1))
        c3 = _leaky(conv(256, 5, 2, "conv3")(c2))
        c3 = _leaky(conv(256, 3, 1, "conv3_1")(c3))
        c4 = _leaky(conv(512, 3, 2, "conv4")(c3))
        c4 = _leaky(conv(512, 3, 1, "conv4_1")(c4))
        c5 = _leaky(conv(512, 3, 2, "conv5")(c4))
        c5 = _leaky(conv(512, 3, 1, "conv5_1")(c5))
        c6 = _leaky(conv(1024, 3, 2, "conv6")(c5))
        c6 = _leaky(conv(1024, 3, 1, "conv6_1")(c6))

        flow6 = predict(2, "predict_flow6")(c6.astype(jnp.float32))
        d5 = _leaky(upconv(512, "deconv5")(c6))
        cat5 = jnp.concatenate([c5, d5, upflow(flow6).astype(dt)], axis=-1)

        flow5 = predict(2, "predict_flow5")(cat5.astype(jnp.float32))
        d4 = _leaky(upconv(256, "deconv4")(cat5))
        cat4 = jnp.concatenate([c4, d4, upflow(flow5).astype(dt)], axis=-1)

        flow4 = predict(2, "predict_flow4")(cat4.astype(jnp.float32))
        d3 = _leaky(upconv(128, "deconv3")(cat4))
        cat3 = jnp.concatenate([c3, d3, upflow(flow4).astype(dt)], axis=-1)

        flow3 = predict(2, "predict_flow3")(cat3.astype(jnp.float32))
        d2 = _leaky(upconv(64, "deconv2")(cat3))
        cat2 = jnp.concatenate([c2, d2, upflow(flow3).astype(dt)], axis=-1)

        flow2 = predict(2, "predict_flow2")(cat2.astype(jnp.float32))

        if self.use_scale_field:
            # DFF scale modulation head: identity (==1) at init
            scale = nn.Conv(
                self.scale_channels, (3, 3), padding="SAME", dtype=jnp.float32,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.ones,
                name="scale_field",
            )(cat2.astype(jnp.float32))
        else:
            scale = jnp.ones((*flow2.shape[:-1], self.scale_channels), jnp.float32)
        return flow2, scale
