#!/usr/bin/env python
"""End-to-end training driver.

Reference counterpart: ``<net>/train_end2end.py`` (SURVEY.md §3.2) — one
shared driver for all three model families, selected by the experiment yaml
(``network.name``), instead of the reference's per-network copies.

Usage: python experiments/train.py --cfg experiments/cfgs/accel18_cityscapes.yaml
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Train Accel/DFF/DeepLab (TPU-native)")
    p.add_argument("--cfg", required=True, help="experiment yaml")
    p.add_argument("--frequent", type=int, default=None, help="log frequency")
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
        save_checkpoint,
        load_checkpoint,
        latest_epoch,
        provenance_from_cfg,
        save_provenance,
    )
    from accel_tpu.core.trainer import (
        fit,
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from accel_tpu.data.loader import TrainClipLoader, TrainPairLoader
    from accel_tpu.data.prefetch import PrefetchingIter
    from accel_tpu.models.accel import build_model
    from accel_tpu.parallel.mesh import mesh_from_cfg, replicated, shard_batch
    from accel_tpu.utils.logger import create_logger
    from accel_tpu.utils.metrics_writer import MetricsWriter

    cfg = load_config(args.cfg)
    cfg_name = os.path.splitext(os.path.basename(args.cfg))[0]
    logger, out_dir = create_logger(cfg.output_path, cfg_name, cfg.dataset.image_set)
    logger.info(f"config {args.cfg}\ndevices {jax.devices()}")

    # dataset + loader
    if cfg.dataset.dataset.lower().startswith("city"):
        from accel_tpu.data.cityscapes import Cityscape

        imdb = Cityscape(cfg.dataset.image_set, cfg.dataset.root_path, cfg.dataset.dataset_path)
    else:
        from accel_tpu.data.camvid import CamVid

        imdb = CamVid(cfg.dataset.image_set, cfg.dataset.root_path, cfg.dataset.dataset_path)

    objective = str(cfg.TRAIN.objective)
    loader = (
        TrainClipLoader(imdb, cfg) if objective == "clip" else TrainPairLoader(imdb, cfg)
    )
    epoch_size = loader.epoch_size

    # model + state
    from accel_tpu.utils.host_init import host_init

    model = build_model(cfg)
    # param shapes are resolution-independent: init at the smallest legal
    # size (FlowNet needs side/downscale divisible by 64)
    side = 64 * int(cfg.network.flow_input_downscale)
    dummy = jnp.zeros((1, side, side, 3), jnp.float32)
    variables = host_init(model, dummy, dummy, jnp.ones((1,)), train=False)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    logger.info(f"model {cfg.network.name} params {n_params / 1e6:.1f}M epoch_size {epoch_size}")

    # pretrained init (reference: load_param(resnet)+load_param(flownet)
    # merged before fit, SURVEY.md §3.2); FIXED_PARAMS freezing happens in
    # make_optimizer's mask
    if cfg.network.get("pretrained") or cfg.network.get("pretrained_flow") \
            or cfg.network.get("pretrained_update"):
        from accel_tpu.core.pretrained import apply_pretrained_cfg

        variables, _ = apply_pretrained_cfg(cfg, variables, logger)

    mesh = mesh_from_cfg(cfg)
    tx, _ = make_optimizer(cfg, epoch_size)
    state = init_train_state(model, variables, tx)

    prefix = os.path.join(out_dir, cfg.TRAIN.model_prefix)
    # record the training semantics next to the checkpoints BEFORE fit so
    # even interrupted runs carry them; experiments/test.py refuses the
    # measured-collapse eval combinations (see core/checkpoint.py)
    save_provenance(prefix, provenance_from_cfg(cfg))
    begin_epoch = int(cfg.TRAIN.begin_epoch)
    if cfg.TRAIN.RESUME:
        le = latest_epoch(prefix)
        if le is not None:
            state = load_checkpoint(prefix, le, state)
            begin_epoch = le + 1
            logger.info(f"resumed epoch {le}")

    state = jax.device_put(state, replicated(mesh))
    ohem = float(cfg.TRAIN.ohem_fraction) or None
    step = make_train_step(
        model, tx, int(cfg.dataset.NUM_CLASSES), float(cfg.TRAIN.loss_scale), mesh,
        ohem_fraction=ohem, aux_weight=float(cfg.TRAIN.aux_loss_weight),
        objective=objective, propagate=str(cfg.network.propagate),
        remat=bool(cfg.TRAIN.remat),
    )
    data_iter = PrefetchingIter(
        iter(loader), depth=int(cfg.tpu.prefetch_depth),
        transform=lambda b: shard_batch(mesh, b),
    )

    metrics_writer = MetricsWriter(os.path.join(out_dir, "metrics.jsonl"))
    state = fit(
        model, state, step, data_iter,
        epochs=int(cfg.TRAIN.end_epoch), epoch_size=epoch_size,
        logger=logger, frequent=args.frequent or int(cfg.default.frequent),
        epoch_end_callback=lambda e, s: (
            save_checkpoint(prefix, e, jax.device_get(s))
            if (e + 1) % max(int(cfg.TRAIN.checkpoint_interval), 1) == 0
            or e == int(cfg.TRAIN.end_epoch) - 1
            else None
        ),
        begin_epoch=begin_epoch,
        metrics_writer=metrics_writer,
    )
    logger.info("training done")


if __name__ == "__main__":
    main()
