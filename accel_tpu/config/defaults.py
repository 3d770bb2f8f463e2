"""Default configuration.

Field vocabulary follows the reference's ``<net>/config/config.py``
(SURVEY.md §5 "Config / flag system"): ``network.pretrained``,
``network.PIXEL_MEANS``, ``SCALES``, ``dataset.NUM_CLASSES``,
``TRAIN.{lr,lr_step,warmup,...,KEY_INTERVAL}``, ``TEST.KEY_FRAME_INTERVAL``,
``gpus``, ``output_path`` — extended with TPU-native knobs (mesh axes,
dtype policy, Pallas toggles) that have no reference counterpart.
"""

from accel_tpu.config.loader import Config


def make_defaults() -> Config:
    return Config(
        {
            # experiment identity
            "MXNET_VERSION": "",  # kept for yaml-compat; ignored
            "output_path": "./output",
            "symbol": "",  # reference name for the model builder
            "gpus": "0",  # reference field; maps to device/mesh selection
            "CLASS_AGNOSTIC": True,
            "SCALES": [[1024, 2048]],  # (short side, max size) per reference
            "default": {"frequent": 20, "kvstore": "device"},
            "network": {
                # model family: deeplab | dff | accel
                "name": "accel",
                # reference branch backbone depth (keyframe branch)
                "ref_depth": 101,
                # update branch depth (accel only): 18 | 34 | 50 | 101
                "update_depth": 18,
                "pretrained": "",
                "pretrained_flow": "",
                # optional pretrained backbone for the accel update branch
                "pretrained_update": "",
                "pretrained_epoch": 0,
                "PIXEL_MEANS": [103.06, 115.90, 123.15],  # BGR means (ref style)
                "PIXEL_STDS": [1.0, 1.0, 1.0],
                "IMAGE_STRIDE": 0,
                "FIXED_PARAMS": [],
                # output stride of the dilated backbone (8 or 16)
                "feat_stride": 16,
                # DeepLab head: fc6 dilation + width
                "head_dilation": 6,
                "head_channels": 1024,
                # FlowNet runs on inputs downscaled by this factor
                "flow_input_downscale": 2,
                # flow propagation: 'incremental' (prev->cur cascaded
                # warps — the Accel paper's own semantics and, paired
                # with scale_cascade='last' below, the MEASURED-BEST
                # flagship recipe), 'direct' (key->cur in one shot — DFF
                # semantics and the reference PAIR recipe's mode), or
                # 'composed' (r3 analysis mode: per-step flows composed
                # into one key->frame warp). MEASURED DECISION (r5 recipe
                # grid, superseding r4's direct flip): the clip objective
                # TRAINED THROUGH incremental propagation under 'last'
                # cascade semantics beats clip-through-direct at every
                # warped cell on all three synthetic sets (+1.8 to +4.4
                # at k=10) and is nearly gap-flat — BASELINE.md
                # "Battery-2 rows". Direct training (r4's winner, kept as
                # accel18_cityscapes_direct.yaml) remains the pick for
                # stateless direct serving; the r4 mechanism finding
                # (multi-gap supervision teaches FlowNet gap-scaled flow)
                # applies to both.
                "propagate": "incremental",
                # DFF scale-field modulation of warped maps
                "use_scale_field": True,
                # cascade-scale semantics for incremental/composed
                # propagation: 'product' (reference — every step's scale
                # field multiplies into the carried tensor) | 'mean1'
                # (cumulative product renormalized to global mean 1 per
                # step) | 'clamp' (product clipped to [1/2, 2] per pixel)
                # | 'last' (only the current step's field modulates; no
                # accumulation). MEASURED (r4 eval-time, r5
                # trained-through): the scale field's information is
                # per-step, not cumulative — multiplying histories
                # degrades it (up to 25 mIoU at k=10), and TRAINING
                # through 'last' is the best recipe on every synth set
                # (BASELINE.md battery-2 rows). Default 'last' since r5;
                # set 'product' for reference-semantics parity (the
                # *_incremental variant cfg ships it).
                "scale_cascade": "last",
                # 'mean1' pins the scale field's degenerate global gain
                # (from-scratch default; measured: unpinned gain drifts to
                # ~3.2 and miscalibrates the un-warped keyframe/eq path
                # through the shared head — offset-0 mIoU 42.9 vs 80.0).
                # Set 'none' for reference-weight parity (raw DFF field).
                "scale_field_norm": "mean1",
                # int8 serving quantization (backbone+fc6; stem and score
                # head stay float). MEASURED NEGATIVE on this toolchain
                # (BASELINE.md): XLA lowers int8 conv to a non-MXU fallback
                # — 3.7-7.9x SLOWER than bf16 despite the v5e MXU's nominal
                # 2x int8 rate. Accuracy-neutral; kept as the canonical
                # formulation for toolchains whose int8 conv hits the MXU.
                # Checkpoints are dtype-unchanged either way.
                "quantize_ref": False,
                "quantize_update": False,
                # norm layer: 'frozenbn' (reference behavior, for pretrained
                # stats), 'batchnorm', or 'groupnorm' (from-scratch default)
                "norm": "groupnorm",
                # compute dtype policy: 'bfloat16' | 'float32'
                "dtype": "bfloat16",
                # use the Pallas warp kernel (else pure-XLA gather oracle)
                "use_pallas_warp": True,
                # static max displacement (feature-res pixels) for the Pallas
                # roll-accumulate warp kernel. Unified at 8 (was 16 here vs 8
                # in the model/bench — VERDICT r2 #7): the r3 extreme-motion
                # probe (tools/probe_flow_magnitude.py) measured the learned
                # flow's max at 2.33 feature px (p99.9 2.29) on 8-24 px/frame
                # motion, for BOTH direct multi-frame and per-step warps —
                # FlowNet-S compresses multi-frame displacement rather than
                # scaling it, so 8 is ~4x the observed ceiling and the mIoU
                # knee sweep at d=4/8/16/32 was bit-identical (81.59).
                "warp_max_disp": 8,
                # warp numerics/lowering (serving knobs; see AccelNet):
                # 'f32'|'native' and 'taps'|'stacked'
                "warp_dtype": "f32",
                "warp_gather": "taps",
                # fast-variant knobs (0 = inherit from feat_stride /
                # head_channels): coarser update-branch stride / slimmer head
                "update_feat_stride": 0,
                "update_head_channels": 0,
                # FlowNet channel multiplier (DFF ships slimmed FlowNets)
                "flow_width_mult": 1.0,
                # update branch runs on 1/N-res input (1 = full res, paper)
                "update_input_downscale": 1,
                # fold that downscale into the update stem conv
                # (ops/fold_downscale.py; serving knob, interior-exact)
                "fold_update_downscale": False,
                # fold the FlowNet input downscale into per-frame conv1
                # kernel-half partials (models/flownet.py)
                "fold_flow_downscale": False,
                # stem: 'conv7' (default; XLA already lowers the 7x7/2 stem
                # well — measured faster than s2d on v5e) | 's2d' (exact
                # space-to-depth reparametrization, kept as an option)
                "stem": "conv7",
            },
            "dataset": {
                "dataset": "CityScape",
                "dataset_path": "./data/cityscapes",
                "image_set": "leftImg8bit_train",
                "test_image_set": "leftImg8bit_val",
                "root_path": "./data",
                "NUM_CLASSES": 19,
                "annotation_prefix": "gtFine",
            },
            "TRAIN": {
                "lr": 0.0005,
                "lr_step": "3.333",  # epochs at which lr decays (csv)
                "lr_factor": 0.1,
                "warmup": True,
                "warmup_lr": 0.00005,
                "warmup_step": 1000,
                "momentum": 0.9,
                "wd": 0.0005,
                "begin_epoch": 0,
                "end_epoch": 5,
                "model_prefix": "accel",
                "RESUME": False,
                "FLIP": True,
                "SHUFFLE": True,
                "BATCH_IMAGES": 1,
                # key/cur pair sampling offsets (frames before annotated frame)
                "MIN_OFFSET": -4,
                "MAX_OFFSET": 0,
                # crop for training (H, W); full-res eval
                "CROP_SIZE": [768, 768],
                "loss_scale": 1.0,
                # global-norm gradient clipping (0 = off; useful for
                # from-scratch training — the reference fine-tuned from
                # pretrained weights and didn't need it)
                "grad_clip": 0.0,
                # checkpoint every N epochs (reference saves every epoch)
                "checkpoint_interval": 1,
                # online hard example mining: keep this fraction of hardest
                # pixels (0 disables; reference operator_py OHEM heritage)
                "ohem_fraction": 0.0,
                # auxiliary CE weight on raw branch outputs (keeps the
                # keyframe path strong; 0 = reference behavior)
                "aux_loss_weight": 0.5,
                # training objective: 'clip' (cascade-unrolled CE through
                # CLIP_LENGTH frames — the reference's own incremental eval
                # semantics made trainable, and the measured-best recipe at
                # every offset on the hard-synth ladder; see
                # core/pipeline.clip_loss_and_stats) or 'pair' (the
                # reference's TRAINING recipe: single sampled warp per
                # example — keep for reference-weight parity, and pair it
                # with propagate='direct')
                "objective": "clip",
                # rematerialize per-frame forwards in the clip objective's
                # backward (jax.checkpoint): holds one frame's activations
                # instead of k — enables full-res / large-k clip training
                # within HBM at the cost of ~one recomputed forward
                # (measured: doubles the trainable full-res clip batch,
                # loss/grads bit-identical)
                "remat": True,
                "CLIP_LENGTH": 5,
            },
            "TEST": {
                "BATCH_IMAGES": 1,
                "KEY_FRAME_INTERVAL": 5,
                # offset of the annotated frame after the keyframe
                "KEY_FRAME_OFFSET": 0,
                "max_per_image": 300,
                "test_epoch": 5,
                # prediction upsampling: 'bilinear_logits' (reference
                # protocol) | 'nearest_pred' (cheaper serving mode)
                "upsample": "bilinear_logits",
                # eval-surface network overrides (dict of network.* fields)
                # applied by experiments/test.py ONLY — ship measured-best
                # SERVING lowerings (e.g. DFF's native+onehot+D4 warp) in
                # the cfg without touching the training defaults. CLI
                # --set-network still wins over these.
                "serving_network": None,
            },
            # TPU-native extensions (no reference counterpart)
            "tpu": {
                "mesh": {"data": -1, "spatial": 1},  # -1 = all remaining chips
                "donate_carry": True,
                "profile": False,
                "prefetch_depth": 2,
            },
        }
    )
