#!/usr/bin/env python
"""Evaluation driver: video mIoU + throughput at a keyframe interval.

Reference counterpart: ``<net>/test.py`` + ``function/test_*.py``
(SURVEY.md §3.1) — restores a checkpoint, runs the video eval loop,
prints per-class IoU / mIoU and net-vs-data timing.

Usage: python experiments/test.py --cfg experiments/cfgs/accel18_cityscapes.yaml
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def resolve_key_offsets(interval, ann_offsets=None, offsets=None,
                        offset_sweep=False, default_key_offset=0):
    """KEY_FRAME_OFFSET values to evaluate at ``interval``.

    The eval loop is keyed on the KEY offset (where the keyframe sits
    before the annotated frame) but every results table reports the
    ANNOTATED offset ``interval - 1 - key``. Sweep scripts passing
    annotated values to --offsets mis-aimed measurements in three
    separate sessions, so the conversion lives here, once, under test.
    """
    def _check(key_off, origin):
        # a key offset outside [0, interval-1] silently measures a
        # different protocol (e.g. an ann offset valid at k=10 reused at
        # k=5 resolves negative) — the exact mis-aimed-sweep class this
        # helper exists to prevent; refuse instead
        if not 0 <= key_off < interval:
            raise ValueError(
                f"{origin} resolves to KEY_FRAME_OFFSET={key_off}, outside "
                f"[0, {interval - 1}] at interval {interval}"
            )
        return key_off

    if ann_offsets:
        return [
            _check(interval - 1 - int(x), f"--ann-offsets value {x}")
            for x in str(ann_offsets).split(",")
        ]
    if offsets:
        return [
            _check(int(x), f"--offsets value {x}")
            for x in str(offsets).split(",")
        ]
    if offset_sweep:
        return list(range(interval))  # ann_pos sweeps k-1..0
    # the cfg default must be range-checked too: a TEST.KEY_FRAME_OFFSET
    # tuned for one interval silently mis-aims a --sweep/--interval row
    # at a smaller k (review r5)
    return [_check(int(default_key_offset), "cfg TEST.KEY_FRAME_OFFSET")]


def parse_args():
    p = argparse.ArgumentParser(description="Test Accel/DFF/DeepLab (TPU-native)")
    p.add_argument("--cfg", required=True)
    p.add_argument("--vis", action="store_true")
    p.add_argument("--ignore_cache", action="store_true")
    p.add_argument("--interval", type=int, default=None, help="override KEY_FRAME_INTERVAL")
    p.add_argument("--sweep", default=None,
                   help="csv of intervals to evaluate (reference-style interval sweep)")
    p.add_argument("--propagate", default=None,
                   choices=["direct", "incremental", "composed"],
                   help="override cfg.network.propagate for this eval")
    p.add_argument("--offset-sweep", action="store_true",
                   help="evaluate every annotated-frame offset 0..k-1 after "
                        "the keyframe (paper's mIoU-vs-offset curve, "
                        "SURVEY.md Appendix B)")
    p.add_argument("--offsets", default=None,
                   help="csv of KEY_FRAME_OFFSET values to evaluate (resume a "
                        "partial --offset-sweep without redoing finished rows). "
                        "NOTE: these are KEY offsets; the printed row is the "
                        "ANNOTATED offset interval-1-key. Prefer --ann-offsets.")
    p.add_argument("--ann-offsets", default=None,
                   help="csv of ANNOTATED-frame offsets after the keyframe "
                        "(the quantity every results table reports; converted "
                        "internally to KEY_FRAME_OFFSET = interval-1-ann). "
                        "Added after the key-offset semantics of --offsets "
                        "mis-aimed sweeps in two separate rounds.")
    p.add_argument("--quantize", action="store_true",
                   help="int8 serving quantization of both branches "
                        "(network.quantize_ref/quantize_update) for this "
                        "eval; checkpoints restore unchanged")
    p.add_argument("--set-network", action="append", default=[],
                   metavar="K=V",
                   help="override cfg.network fields for this eval (e.g. "
                        "--set-network warp_dtype=native --set-network "
                        "fold_flow_downscale=true) — serving-lowering "
                        "mIoU-neutrality checks on existing checkpoints")
    p.add_argument("--warp-max-disp", type=int, default=None,
                   help="override network.warp_max_disp (Pallas warp "
                        "displacement clamp, feature-res px) for this eval "
                        "— the extreme-motion knee sweep")
    p.add_argument("--max-items", type=int, default=None)
    p.add_argument("--random-weights", action="store_true",
                   help="skip checkpoint restore (pipeline smoke / timing)")
    p.add_argument("--force", action="store_true",
                   help="evaluate even when the requested semantics are a "
                        "measured-collapse mismatch against the checkpoint's "
                        "training provenance (e.g. a clip-through-direct "
                        "checkpoint under --propagate incremental: 31.97 vs "
                        "84.36 mIoU — BASELINE.md r4 decision table)")
    args, _unknown = p.parse_known_args()
    return args


def main():
    args = parse_args()
    import os as _os

    import jax

    if _os.environ.get("ACCEL_PLATFORM"):
        jax.config.update("jax_platforms", _os.environ["ACCEL_PLATFORM"])
    from accel_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    import jax.numpy as jnp

    from accel_tpu.config import load_config
    from accel_tpu.core.checkpoint import (
        check_eval_semantics,
        load_checkpoint,
        load_provenance,
        saved_epochs,
    )
    from accel_tpu.core.predictor import pred_eval_clips
    from accel_tpu.data.loader import TestClipLoader
    from accel_tpu.data.prefetch import PrefetchingIter
    from accel_tpu.models.accel import build_model
    from accel_tpu.parallel.mesh import make_mesh, mesh_from_cfg
    from accel_tpu.utils.logger import create_logger

    cfg = load_config(args.cfg)
    if args.interval:
        cfg.TEST.KEY_FRAME_INTERVAL = args.interval
    if args.quantize:
        cfg.network.quantize_ref = True
        cfg.network.quantize_update = True
    if args.warp_max_disp is not None:
        cfg.network.warp_max_disp = args.warp_max_disp
    # TEST.serving_network: measured-best serving lowerings shipped in the
    # cfg (e.g. DFF's native+onehot+D4 warp — 322.9 vs 308 fps,
    # mIoU-neutral); eval-surface only, so f32/taps stays the training
    # default. Applied before --set-network so explicit CLI flags win.
    for key, val in (cfg.TEST.get("serving_network") or {}).items():
        cfg.network[key] = val
    for kv in args.set_network:
        key, val = kv.split("=", 1)
        if val.lower() in ("true", "false"):
            cfg.network[key] = val.lower() == "true"
        else:
            try:
                cfg.network[key] = int(val)
            except ValueError:
                try:
                    cfg.network[key] = float(val)
                except ValueError:
                    cfg.network[key] = val
    cfg_name = os.path.splitext(os.path.basename(args.cfg))[0]
    logger, out_dir = create_logger(cfg.output_path, cfg_name, cfg.dataset.test_image_set)

    if cfg.dataset.dataset.lower().startswith("city"):
        from accel_tpu.data.cityscapes import Cityscape

        imdb = Cityscape(cfg.dataset.test_image_set, cfg.dataset.root_path, cfg.dataset.dataset_path)
    else:
        from accel_tpu.data.camvid import CamVid

        imdb = CamVid(cfg.dataset.test_image_set, cfg.dataset.root_path, cfg.dataset.dataset_path)

    model = build_model(cfg)
    side = 64 * int(cfg.network.flow_input_downscale)
    dummy = jnp.zeros((1, side, side, 3), jnp.float32)

    def _init_fn():
        return model.init(
            jax.random.PRNGKey(0), dummy, dummy, jnp.ones((1,)), train=False
        )

    train_dir = os.path.join(cfg.output_path, cfg_name, cfg.dataset.image_set)
    prefix = os.path.join(train_dir, cfg.TRAIN.model_prefix)
    steps = [] if args.random_weights else saved_epochs(prefix)
    if steps:
        from accel_tpu.core.trainer import init_train_state, make_optimizer

        # restoring a checkpoint needs only the state's SHAPE: eval_shape
        # traces init without executing it (a concrete init is minutes of
        # uncached eager XLA:CPU compiles for a 110M-param model, all of it
        # immediately overwritten by the restore)
        tx, _ = make_optimizer(cfg, 1)
        abstract = jax.eval_shape(
            lambda: init_train_state(model, _init_fn(), tx)
        )
        requested = int(cfg.TEST.test_epoch) - 1
        # largest saved step <= requested (checkpoint_interval > 1 means
        # not every epoch exists)
        epoch = max([s for s in steps if s <= requested], default=steps[0])
        if epoch > requested:
            # nothing at-or-below the request exists; substituting a LATER
            # (longer-trained) checkpoint changes what's being measured —
            # say so loudly rather than only in passing
            logger.warning(
                f"TEST.test_epoch={cfg.TEST.test_epoch} requested epoch "
                f"{requested} but earliest saved step is {epoch} "
                f"(saved: {steps}) — evaluating epoch {epoch} instead"
            )
        state = load_checkpoint(prefix, epoch, abstract)
        variables = state.variables
        logger.info(f"restored {prefix} epoch {epoch}")
    else:
        from accel_tpu.utils.host_init import host_init

        if not args.random_weights:
            logger.info("no checkpoint found — using random weights")
        variables = host_init(model, dummy, dummy, jnp.ones((1,)), train=False)

    # Batched multi-chip inference (SURVEY.md §7 step 7 / milestone 5):
    # the same mesh treatment train.py has. The clip batch shards over the
    # mesh 'data' axis; params are replicated. The data axis is clamped to
    # divide TEST.BATCH_IMAGES so single-clip eval on a pod still runs
    # (warn — raise BATCH_IMAGES to use every chip).
    import math

    mesh = mesh_from_cfg(cfg)
    test_b = int(cfg.TEST.BATCH_IMAGES)
    n_data = int(mesh.shape["data"])
    if test_b % n_data:
        g = math.gcd(test_b, n_data)
        logger.warning(
            f"TEST.BATCH_IMAGES={test_b} not divisible by mesh data axis "
            f"{n_data}; clamping data axis to {g} (raise BATCH_IMAGES to a "
            f"multiple of {n_data} to use every chip)"
        )
        mesh = make_mesh(g, int(mesh.shape["spatial"]))
    shard_spatial = int(mesh.shape["spatial"]) > 1

    propagate = args.propagate or str(cfg.network.propagate)
    # Eval-mode guardrail: the checkpoint records what it was trained with
    # (provenance.json next to the orbax steps); the measured-collapse
    # combinations raise unless --force, benign interventions warn. Absent
    # for pre-r5 checkpoints — checks skip.
    prov = None if (args.random_weights or not steps) else load_provenance(prefix)
    for msg in check_eval_semantics(prov, propagate, cfg.network,
                                    force=args.force):
        logger.warning(f"PROVENANCE: {msg}")
    intervals = (
        [int(x) for x in args.sweep.split(",")]
        if args.sweep else [int(cfg.TEST.KEY_FRAME_INTERVAL)]
    )
    for interval in intervals:
        cfg.TEST.KEY_FRAME_INTERVAL = interval
        offsets = resolve_key_offsets(
            interval, args.ann_offsets, args.offsets, args.offset_sweep,
            cfg.TEST.KEY_FRAME_OFFSET,
        )
        for key_offset in offsets:
            cfg.TEST.KEY_FRAME_OFFSET = key_offset
            loader = TestClipLoader(
                imdb, cfg, batch_clips=int(cfg.TEST.BATCH_IMAGES),
                max_items=args.max_items,
            )
            miou, iou, stats = pred_eval_clips(
                model, variables, PrefetchingIter(iter(loader)),
                int(cfg.dataset.NUM_CLASSES), interval, propagate, logger,
                upsample=str(cfg.TEST.upsample),
                mesh=mesh, shard_spatial=shard_spatial,
            )
            if len(intervals) == 1 and len(offsets) == 1:
                for n, v in zip(imdb.class_names, iou):
                    logger.info(f"{n:20s} IU {v * 100:6.2f}")
            logger.info(
                f"interval {interval} offset {loader.ann_pos}: "
                f"meanIU {miou * 100:.2f}  fps {stats['fps']:.2f}"
            )


if __name__ == "__main__":
    main()
