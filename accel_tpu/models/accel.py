"""Accel: corrective-fusion video segmentation (the flagship model family).

Composes the three reference model families (SURVEY.md §0) in one module:

- ``deeplab``  — per-frame DeepLab only (reference ``deeplab/``)
- ``dff``      — keyframe features warped forward by FlowNet flow, shared
  score head (reference ``dff_deeplab/``; caches + warps the 1024-ch fc6
  *feature* tensor, DFF paper §3)
- ``accel``    — DFF propagation of the reference branch *score* map + a
  per-frame update branch + the 1x1 corrective-fusion conv
  (reference Accel symbols; Accel paper arXiv:1807.06667 §3)

All branches emit at feature stride; fusion and loss run at stride
resolution with a single bilinear upsample at the very end — the per-frame
non-key computation (flow -> warp -> scale-modulate -> update branch ->
fusion) is one fused XLA program, per BASELINE.json's north star.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from accel_tpu.models.deeplab import DeepLab
from accel_tpu.models.flownet import FlowNetS
from accel_tpu.ops.upsample import resize_bilinear
from accel_tpu.ops.warp import bilinear_warp, flow_to_feature_res


def _fusion_init(num_classes: int):
    """1x1 fusion kernel init: average the two score maps (0.5*I | 0.5*I)."""

    def init(key, shape, dtype=jnp.float32):
        assert shape == (1, 1, 2 * num_classes, num_classes), shape
        eye = jnp.eye(num_classes, dtype=dtype) * 0.5
        return jnp.concatenate([eye, eye], axis=0).reshape(shape)

    return init


class AccelNet(nn.Module):
    """Unified model for the deeplab / dff / accel families."""

    family: str = "accel"  # 'deeplab' | 'dff' | 'accel'
    ref_depth: int = 101
    update_depth: int = 18
    num_classes: int = 19
    feat_stride: int = 16
    head_channels: int = 1024
    head_dilation: int = 6
    flow_input_downscale: int = 2
    use_scale_field: bool = True
    norm: str = "frozenbn"
    dtype: Any = jnp.bfloat16
    use_pallas_warp: bool = True
    warp_max_disp: int = 8
    # warp numerics/lowering knobs (serving; A/B per the in-program policy
    # before any default flip):
    # warp_dtype:  'f32' (exact path — warp + scale-mod in float32) |
    #              'native' (keep the propagated tensor's storage dtype
    #              through the gather and scale-mod; halves the dominant
    #              non-key HBM traffic for DFF's 1024-ch features)
    # warp_gather: 'taps' (four take_along_axis ops) | 'stacked' (one
    #              gather for all four bilinear taps; see
    #              ops/warp.bilinear_warp_xla_stacked)
    warp_dtype: str = "f32"
    warp_gather: str = "taps"
    # fold the mean1 scale normalization's per-sample gain into the onehot
    # kernel's fused epilogue (SMEM scalar) instead of materializing the
    # normalized field before the pallas_call — see warp() (serving knob,
    # onehot + mean1 only; in-program A/B decides any default flip)
    warp_gain_fold: bool = False
    # fast-variant knobs (0 = inherit): the update branch may run at a
    # coarser output stride and/or a narrower fc6 head than the reference
    # branch — at 1024x2048 the dilated layer4 + 1024-wide fc6 of even a
    # ResNet-18 otherwise costs nearly a full ResNet-101 non-key frame
    update_feat_stride: int = 0
    update_head_channels: int = 0
    update_input_downscale: int = 1
    flow_width_mult: float = 1.0
    # fold the update branch's input downscale into its stem conv
    # (ops/fold_downscale.py) instead of materializing the half-res image
    # — kills the lane-hostile C=3 full-res resize pass (serving knob;
    # interior-exact, edge ring differs from the resize path by the
    # documented no-edge-renorm semantics)
    fold_update_downscale: bool = False
    # fold the FlowNet input downscale into conv1 per-frame kernel-half
    # partials (models/flownet.py _Conv1 + ops/fold_downscale.py); group
    # steps then never materialize the downscaled frames or the 6-ch pair
    fold_flow_downscale: bool = False
    # stem: 'conv7' (measured faster on v5e; XLA lowers the 7x7/2 stem
    # well) | 's2d' (exact space-to-depth reparametrization, optional)
    stem: str = "conv7"
    # scale-field calibration: 'none' (reference semantics — raw scale
    # field, required for reference-weight parity) | 'mean1' (divide by the
    # per-sample mean magnitude). The global gain of the DFF scale field is
    # a degenerate direction: the shared score head / fusion calibrates to
    # gain-scaled warped inputs, and the UNSCALED keyframe/eq path through
    # the same head is then miscalibrated by that factor. Measured on the
    # hard-synth pair recipe: learned mean 3.25 -> offset-0/interval-1 mIoU
    # cliff (42.9 vs 80.0 warped); 'mean1' keeps DFF's per-pixel relative
    # modulation while pinning the gain.
    scale_field_norm: str = "none"
    # CASCADE scale semantics (incremental/composed propagation only; r4 —
    # the r3 composed-mode probe isolated the incremental-vs-direct far-
    # offset gap to the COMPOUNDED per-step scale product, not resample
    # blur; BASELINE.md extreme finding 7):
    #   'product' — reference semantics: the propagated tensor carries the
    #               running product of every step's (normalized) scale field
    #   'mean1'   — product renormalized to global mean 1 after every step
    #               (isolates gain drift of the cascade)
    #   'clamp'   — product clamped per-pixel to [1/2, 2] (bounds the
    #               multiplicative variance growth)
    #   'last'    — no accumulation: only the CURRENT step's normalized
    #               scale modulates the scored tensor; the propagated carry
    #               stays unmodulated
    # Consumed by core/pipeline.py's incremental/composed group steps;
    # direct mode (single warp) is unaffected.
    # 'last' since r5 (measured-best trained-through AND eval semantics on
    # every synth set — BASELINE.md battery-2 rows); 'product' is the
    # reference's cumulative-product semantics (parity knob)
    scale_cascade: str = "last"
    # int8 serving quantization per branch (ops/quant.py): the keyframe
    # ref branch is the dominant cost of every propagation family and the
    # safest to quantize (its scores pass through fusion recalibration).
    # Checkpoint-compatible; serving-time knobs (network.quantize_ref /
    # network.quantize_update in cfg).
    quantize_ref: bool = False
    quantize_update: bool = False
    # 'direct' | 's2b' | 'auto': lowering for the dilated (atrous) convs in both
    # DeepLab branches — space-to-batch phase decomposition (ops/dilated.py;
    # exact, checkpoint-compatible). A serving/throughput knob for the os8
    # ladder; measure per backend with tools/bench_dilated_conv.py.
    dilated_conv: str = "auto"

    @property
    def warp_tensor(self) -> str:
        # DFF warps fc6 features (head applied per frame); Accel warps the
        # 19-ch reference score map (SURVEY.md §7 hard part 4).
        return "features" if self.family == "dff" else "scores"

    def setup(self):
        self.ref_net = DeepLab(
            depth=self.ref_depth,
            num_classes=self.num_classes,
            output_stride=self.feat_stride,
            head_channels=self.head_channels,
            head_dilation=self.head_dilation,
            norm=self.norm,
            stem=self.stem,
            dtype=self.dtype,
            quantize=self.quantize_ref,
            dilated_conv=self.dilated_conv,
            name="ref_net",
        )
        if self.family == "accel":
            fold = self.fold_update_downscale and self.update_input_downscale > 1
            self.update_net = DeepLab(
                depth=self.update_depth,
                num_classes=self.num_classes,
                output_stride=self.update_feat_stride or self.feat_stride,
                head_channels=self.update_head_channels or self.head_channels,
                head_dilation=self.head_dilation,
                norm=self.norm,
                stem=self.stem,
                dtype=self.dtype,
                quantize=self.quantize_update,
                dilated_conv=self.dilated_conv,
                input_downscale=self.update_input_downscale if fold else 1,
                name="update_net",
            )
            self.fusion = nn.Conv(
                self.num_classes, (1, 1), dtype=jnp.float32,
                kernel_init=_fusion_init(self.num_classes),
                name="fusion",
            )
        if self.family in ("dff", "accel"):
            scale_ch = (
                self.head_channels if self.warp_tensor == "features" else self.num_classes
            )
            self.flownet = FlowNetS(
                scale_channels=scale_ch,
                use_scale_field=self.use_scale_field,
                width_mult=self.flow_width_mult,
                dtype=self.dtype,
                name="flownet",
            )

    # ---- branch applications -------------------------------------------

    def ref_propagated(self, image, train: bool = False):
        """Keyframe pass of the reference branch -> the tensor that gets
        cached and warped (scores for accel, fc6 features for dff)."""
        mode = "features" if self.warp_tensor == "features" else "full"
        return self.ref_net(image, train=train, mode=mode)

    def ref_scores_from_propagated(self, prop):
        """Turn the propagated tensor into score logits."""
        if self.warp_tensor == "features":
            return self.ref_net.scores_from_features(prop)
        return prop

    def update_scores(self, image, train: bool = False):
        feat_hw = (image.shape[1] // self.feat_stride, image.shape[2] // self.feat_stride)
        ds = self.update_input_downscale
        if ds > 1 and not self.fold_update_downscale:
            image = resize_bilinear(image, (image.shape[1] // ds, image.shape[2] // ds))
        s = self.update_net(image, train=train)
        if s.shape[1:3] != feat_hw:
            s = resize_bilinear(s, feat_hw)
        return s

    def downscale_for_flow(self, frames):
        """(..., H, W, 3) full-res -> FlowNet-input resolution."""
        ds = self.flow_input_downscale
        h, w = frames.shape[-3] // ds, frames.shape[-2] // ds
        return resize_bilinear(frames, (h, w))

    def _flow_post(self, flow_small, scale_small, feat_hw):
        ds = self.flow_input_downscale
        flow = flow_to_feature_res(flow_small, feat_hw, ds / self.feat_stride)
        if self.warp_dtype == "native":
            # the scale-field resize to feature res is a dense-matmul pass
            # over head_channels-wide tensors (33 MB/frame f32 for DFF);
            # the native-dtype warp path keeps it in the storage dtype
            scale_small = scale_small.astype(self.dtype)
        scale = resize_bilinear(scale_small, feat_hw)
        return flow, scale

    def flow_pair(self, cur_small, anchor_small, train: bool = False):
        """Flow from already-downscaled frames (lets callers downscale each
        frame once instead of twice — as cur and as the next anchor)."""
        ds = self.flow_input_downscale
        pair = jnp.concatenate([cur_small, anchor_small], axis=-1)
        flow_small, scale_small = self.flownet(pair)
        feat_hw = (
            cur_small.shape[1] * ds // self.feat_stride,
            cur_small.shape[2] * ds // self.feat_stride,
        )
        return self._flow_post(flow_small, scale_small, feat_hw)

    def flow_stem_partials(self, frames):
        """Per-frame FlowNet conv1 kernel-half partials on FULL-res frames
        — the folded flow prologue (fold_flow_downscale; the downscaled
        frame and the 6-ch pair concat never materialize). Each frame is
        computed once per role; pairs combine with a cheap add at 1/2f res.
        """
        f = self.flow_input_downscale
        return (
            self.flownet.stem_partial(frames, "cur", f),
            self.flownet.stem_partial(frames, "anchor", f),
        )

    def flow_pair_from_partials(self, cur_part, anchor_part):
        """FlowNet from conv1 stem partials (see flow_stem_partials)."""
        flow_small, scale_small = self.flownet.from_conv1(cur_part + anchor_part)
        ds = self.flow_input_downscale
        feat_hw = (
            cur_part.shape[1] * 2 * ds // self.feat_stride,
            cur_part.shape[2] * 2 * ds // self.feat_stride,
        )
        return self._flow_post(flow_small, scale_small, feat_hw)

    def flow(self, cur, anchor, train: bool = False):
        """Flow mapping cur-frame pixels to their anchor-frame source, at
        feature resolution/units, plus the scale field at feature res.

        ``cur``/``anchor``: (N,H,W,3) normalized full-res frames.
        """
        if self.fold_flow_downscale:
            f = self.flow_input_downscale
            return self.flow_pair_from_partials(
                self.flownet.stem_partial(cur, "cur", f),
                self.flownet.stem_partial(anchor, "anchor", f),
            )
        return self.flow_pair(
            self.downscale_for_flow(cur), self.downscale_for_flow(anchor), train
        )

    def norm_scale_gain(self, scale):
        """mean1's per-sample gain 1/(|mean|+eps), shape (N,) f32 — the
        single source of the normalization formula for both the divide
        path (norm_scale) and the kernel-folded path (warp_gain_fold)."""
        m = jnp.mean(scale, axis=(1, 2, 3))
        return 1.0 / (jnp.abs(m).astype(jnp.float32) + 1e-6)

    def norm_scale(self, scale):
        """Scale-field gain normalization (network.scale_field_norm; the
        pair-recipe offset-0 cliff root cause — see BASELINE.md r2 A/B)."""
        if self.scale_field_norm == "mean1":
            g = self.norm_scale_gain(scale)
            scale = scale * g[:, None, None, None].astype(scale.dtype)
        return scale

    def warp(self, prop, flow, scale, normalize_scale=True, max_disp=None,
             modulate=True):
        # warp_dtype 'native' keeps the propagated tensor in its storage
        # dtype (bf16) through the gather — on DFF's 1024-ch features the
        # f32 round trips are the dominant non-key HBM traffic. 'f32'
        # (default) is the exactness/training path.
        # ``normalize_scale=False`` is for callers passing an already-
        # normalized (e.g. composed, core/pipeline.py) scale field;
        # ``max_disp`` overrides the kernel displacement bound (composed
        # flows carry up to (k-1)x the per-step displacement).
        # ``modulate=False`` skips the scale modulation entirely (the
        # scale_cascade != 'product' pipeline paths carry the UNMODULATED
        # tensor and apply their intervention at scoring time).
        x = prop if self.warp_dtype == "native" else prop.astype(jnp.float32)
        d = self.warp_max_disp if max_disp is None else max_disp
        if self.warp_gather == "onehot" and self.use_scale_field and modulate:
            # fused epilogue: the scale modulation multiplies inside the
            # one-hot matmul kernel before its single output write — the
            # unmodulated warped tensor never round-trips HBM
            # (VERDICT r2 #1's named fusion target)
            from accel_tpu.ops.warp_onehot import warp_onehot

            if (
                normalize_scale
                and self.warp_gain_fold
                and self.scale_field_norm == "mean1"
            ):
                # warp_gain_fold: mean1's 1/|mean| rides the kernel's
                # fused epilogue as a per-sample SMEM scalar instead of a
                # divide pass that materializes the normalized C-wide
                # field ahead of the pallas_call (which cannot fuse
                # producers). Numerics: the gain multiply happens in f32
                # in the epilogue vs the storage-dtype multiply — at
                # least as precise. Serving knob; in-program A/B decides
                # any default flip (standing policy).
                gain = self.norm_scale_gain(scale)
                return warp_onehot(x, flow, scale.astype(x.dtype), d,
                                   gain=gain)
            if normalize_scale:
                scale = self.norm_scale(scale)
            return warp_onehot(x, flow, scale.astype(x.dtype), d)
        warped = bilinear_warp(
            x, flow, use_pallas=self.use_pallas_warp,
            max_disp=d, gather=self.warp_gather,
        )
        if self.use_scale_field and modulate:
            if normalize_scale:
                scale = self.norm_scale(scale)
            if self.warp_dtype == "native":
                scale = scale.astype(warped.dtype)
            warped = warped * scale
        return warped

    def fuse(self, warped_ref_scores, update_scores):
        x = jnp.concatenate(
            [warped_ref_scores.astype(jnp.float32), update_scores.astype(jnp.float32)],
            axis=-1,
        )
        return self.fusion(x)

    # ---- train-time pair forward ---------------------------------------

    def __call__(self, cur, key, eq_flag=None, train: bool = False):
        """Training pair forward -> logits at feature stride.

        ``cur``: annotated frame (N,H,W,3); ``key``: its sampled keyframe;
        ``eq_flag``: (N,) 1.0 where cur == key (reference's eq_flag input —
        selects the un-warped path so early-training flow noise doesn't
        corrupt the task head; SURVEY.md §3.2).
        """
        if self.family == "deeplab":
            return self.ref_net(cur, train=train)

        prop_key = self.ref_propagated(key, train=train)
        flow, scale = self.flow(cur, key, train=train)
        warped = self.warp(prop_key, flow, scale)
        if eq_flag is not None:
            e = eq_flag.reshape(-1, 1, 1, 1).astype(jnp.float32)
            warped = e * prop_key.astype(jnp.float32) + (1.0 - e) * warped
        ref_scores = self.ref_scores_from_propagated(warped)

        if self.family == "dff":
            return ref_scores
        upd = self.update_scores(cur, train=train)
        return self.fuse(ref_scores, upd)


def build_model(cfg) -> AccelNet:
    """Model zoo entry: build an AccelNet from a config (reference: the
    per-network ``symbols/<name>.get_symbol`` dispatch, SURVEY.md L3)."""
    net = cfg.network
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[net.dtype]
    return AccelNet(
        family=net.name,
        ref_depth=int(net.ref_depth),
        update_depth=int(net.update_depth),
        num_classes=int(cfg.dataset.NUM_CLASSES),
        feat_stride=int(net.feat_stride),
        head_channels=int(net.head_channels),
        head_dilation=int(net.head_dilation),
        flow_input_downscale=int(net.flow_input_downscale),
        use_scale_field=bool(net.use_scale_field),
        norm=str(net.norm),
        dtype=dtype,
        use_pallas_warp=bool(net.use_pallas_warp),
        warp_max_disp=int(net.warp_max_disp),
        warp_dtype=str(net.get("warp_dtype", "f32") or "f32"),
        warp_gather=str(net.get("warp_gather", "taps") or "taps"),
        warp_gain_fold=bool(net.get("warp_gain_fold", False)),
        update_feat_stride=int(net.get("update_feat_stride", 0) or 0),
        update_head_channels=int(net.get("update_head_channels", 0) or 0),
        update_input_downscale=int(net.get("update_input_downscale", 1) or 1),
        fold_update_downscale=bool(net.get("fold_update_downscale", False)),
        fold_flow_downscale=bool(net.get("fold_flow_downscale", False)),
        flow_width_mult=float(net.get("flow_width_mult", 1.0) or 1.0),
        stem=str(net.get("stem", "conv7")),
        scale_field_norm=str(net.get("scale_field_norm", "none") or "none"),
        scale_cascade=str(net.get("scale_cascade", "product") or "product"),
        quantize_ref=bool(net.get("quantize_ref", False)),
        quantize_update=bool(net.get("quantize_update", False)),
        dilated_conv=str(net.get("dilated_conv", "auto") or "auto"),
    )
