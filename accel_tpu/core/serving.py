"""Streaming video-segmentation API for serving.

The reference exposes only batch eval (test.py); a production consumer
needs a stateful per-frame interface. ``VideoSegmenter`` owns the keyframe
schedule and the device-resident propagation cache (prop tensor + FlowNet
anchor) and exposes ``push_frame``:

    seg = VideoSegmenter(model, variables, interval=5)
    for frame in camera:                # (1, H, W, 3) normalized
        pred = seg.push_frame(frame)    # (1, H, W) uint8 class map

Both per-frame programs are jitted once; the cache never leaves HBM.
"""

from __future__ import annotations

import numpy as np

from accel_tpu.core.predictor import DataBatch, make_key_cur_predictors


class VideoSegmenter:
    def __init__(
        self,
        model,
        variables,
        interval: int = 5,
        full_res: bool = True,
        propagate: str = "direct",
    ):
        """``propagate`` must match the training objective
        (``cfg.network.propagate``): 'direct' (pair-trained, the default)
        anchors every non-key frame at the keyframe; 'incremental' cascades
        frame-to-frame (requires clip-trained weights — under pair-trained
        weights the re-applied scale field compounds)."""
        self.interval = int(interval)
        self.model = model
        self.propagate = propagate
        self._variables = variables
        self._full_res = full_res
        self._group_fn = None
        self._key_p, self._cur_p = make_key_cur_predictors(
            model, variables, full_res_pred=full_res, propagate=propagate
        )
        self.reset()

    def reset(self):
        """Drop the propagation state (e.g. on scene cut / new stream)."""
        self._t = 0
        self._prop = None
        self._anchor_small = None

    @property
    def is_keyframe_next(self) -> bool:
        return self._t % self.interval == 0 or self._prop is None

    def push_frame(self, frame):
        """frame (1, H, W, 3) normalized -> (1, H, W) uint8 prediction."""
        if self.is_keyframe_next or self.model.family == "deeplab":
            out = self._key_p.predict(DataBatch([frame]))[0]
        else:
            out = self._cur_p.predict(
                DataBatch([frame, self._anchor_small, self._prop])
            )[0]
        self._prop = out["prop"]
        self._anchor_small = out.get("anchor_small")
        self._t += 1
        return out["pred"]

    def push_clip(self, clip):
        """clip (1, F, H, W, 3) -> (1, F, H, W) uint8, streaming per frame
        (use core.pipeline.clip_predictions for the fused batch path)."""
        preds = [np.asarray(self.push_frame(clip[:, i])) for i in range(clip.shape[1])]
        return np.stack(preds, axis=1)

    def push_group(self, frames):
        """frames (B, k, H, W, 3), keyframe-first -> (B, k, H, W) uint8.

        Group-granularity streaming: ONE device dispatch per keyframe group
        instead of k (the per-frame loop pays a host round trip per frame —
        measured 6.8 fps through a tunneled backend vs 4-8 ms of actual
        device compute). The caller buffers k frames, trading k frames of
        latency for fused-clip throughput; the schedule must be at a group
        boundary (`is_keyframe_next`).
        """
        if frames.shape[1] != self.interval and self.model.family != "deeplab":
            raise ValueError(
                f"group length {frames.shape[1]} != interval {self.interval}"
            )
        if not self.is_keyframe_next:
            raise ValueError(
                "push_group mid-group: schedule is not at a keyframe "
                f"(t={self._t}, interval={self.interval}); reset() or finish "
                "the group with push_frame"
            )
        if self._group_fn is None:
            import jax

            from accel_tpu.core.pipeline import clip_predictions

            k = self.interval

            @jax.jit
            def run(variables, frames):
                return clip_predictions(
                    self.model, variables, frames, k, self.propagate,
                    full_res=self._full_res,
                )

            self._group_fn = run
        pred = self._group_fn(self._variables, frames)
        # groups are self-contained (each starts at its keyframe), so the
        # per-frame cache is simply invalidated and the clock advances
        self._t += frames.shape[1]
        self._prop = None
        self._anchor_small = None
        return pred
