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
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pair):
        """pair: (N, H, W, 6) = concat(cur, key). H, W divisible by 64.

        Returns (flow, scale): flow (N, H/4, W/4, 2), scale (N, H/4, W/4, S).
        """
        dt = self.dtype
        conv = lambda ch, k, s, name: nn.Conv(
            ch, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2, dtype=dt, name=name
        )
        deconv = lambda ch, name: nn.ConvTranspose(
            ch, (4, 4), strides=(2, 2), padding="SAME", dtype=dt, name=name
        )
        predict = lambda ch, name: nn.Conv(
            ch, (3, 3), padding="SAME", dtype=jnp.float32,
            kernel_init=nn.initializers.zeros, name=name,
        )

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
        d5 = _leaky(deconv(512, "deconv5")(c6))
        up6 = nn.ConvTranspose(2, (4, 4), strides=(2, 2), padding="SAME",
                               dtype=jnp.float32, name="upflow6")(flow6)
        cat5 = jnp.concatenate([c5, d5, up6.astype(dt)], axis=-1)

        flow5 = predict(2, "predict_flow5")(cat5.astype(jnp.float32))
        d4 = _leaky(deconv(256, "deconv4")(cat5))
        up5 = nn.ConvTranspose(2, (4, 4), strides=(2, 2), padding="SAME",
                               dtype=jnp.float32, name="upflow5")(flow5)
        cat4 = jnp.concatenate([c4, d4, up5.astype(dt)], axis=-1)

        flow4 = predict(2, "predict_flow4")(cat4.astype(jnp.float32))
        d3 = _leaky(deconv(128, "deconv3")(cat4))
        up4 = nn.ConvTranspose(2, (4, 4), strides=(2, 2), padding="SAME",
                               dtype=jnp.float32, name="upflow4")(flow4)
        cat3 = jnp.concatenate([c3, d3, up4.astype(dt)], axis=-1)

        flow3 = predict(2, "predict_flow3")(cat3.astype(jnp.float32))
        d2 = _leaky(deconv(64, "deconv2")(cat3))
        up3 = nn.ConvTranspose(2, (4, 4), strides=(2, 2), padding="SAME",
                               dtype=jnp.float32, name="upflow3")(flow3)
        cat2 = jnp.concatenate([c2, d2, up3.astype(dt)], axis=-1)

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
