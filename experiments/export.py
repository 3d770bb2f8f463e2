#!/usr/bin/env python
"""Export a trained model's serving program as a deployable artifact.

Packages the fused clip-inference program (scan-carried keyframe cache,
batched group step, fused upsample+argmax tail) plus — by default — the
checkpoint's weights into ONE ``jax.export`` StableHLO file that a serving
host can load without this repo's model code (``core/export.py``).

The reference's only "deployment" is re-running test.py under MXNet
(SURVEY.md §4); this is the TPU-native production packaging.

Usage:
  python experiments/export.py --cfg experiments/cfgs/accel18_cityscapes.yaml \
      --height 1024 --width 2048 --out /tmp/accel18.shlo
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Export serving artifact")
    p.add_argument("--cfg", required=True)
    p.add_argument("--out", required=True, help="output artifact path (.shlo)")
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=2048)
    p.add_argument("--interval", type=int, default=None,
                   help="override TEST.KEY_FRAME_INTERVAL")
    p.add_argument("--batch", default="b",
                   help="clip batch: an int for static, or a symbolic dim "
                        "name (default 'b' = batch-polymorphic artifact)")
    p.add_argument("--propagate", default=None,
                   choices=["direct", "incremental"])
    p.add_argument("--no-embed-params", dest="embed_params",
                   action="store_false",
                   help="keep parameters a call argument (small artifact, "
                        "one module serves many checkpoints)")
    p.add_argument("--platforms", default=None,
                   help="csv lowering platforms (e.g. 'tpu' to cross-export "
                        "from a CPU host); default = current backend")
    p.add_argument("--random-weights", action="store_true",
                   help="skip checkpoint restore (packaging smoke test)")
    return p.parse_args()


def main():
    args = parse_args()
    if os.environ.get("ACCEL_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["ACCEL_PLATFORM"])
    import jax
    import jax.numpy as jnp

    from accel_tpu.config import load_config
    from accel_tpu.core.checkpoint import load_checkpoint, saved_epochs
    from accel_tpu.core.export import export_serving
    from accel_tpu.models.accel import build_model
    from accel_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    cfg = load_config(args.cfg)
    cfg_name = os.path.splitext(os.path.basename(args.cfg))[0]
    model = build_model(cfg)
    side = 64 * int(cfg.network.flow_input_downscale)
    dummy = jnp.zeros((1, side, side, 3), jnp.float32)

    train_dir = os.path.join(cfg.output_path, cfg_name, cfg.dataset.image_set)
    prefix = os.path.join(train_dir, cfg.TRAIN.model_prefix)
    steps = [] if args.random_weights else saved_epochs(prefix)
    if steps:
        from accel_tpu.core.trainer import init_train_state, make_optimizer

        tx, _ = make_optimizer(cfg, 1)
        abstract = jax.eval_shape(
            lambda: init_train_state(
                model,
                model.init(jax.random.PRNGKey(0), dummy, dummy,
                           jnp.ones((1,)), train=False),
                tx,
            )
        )
        requested = int(cfg.TEST.test_epoch) - 1
        epoch = max([s for s in steps if s <= requested], default=steps[0])
        state = load_checkpoint(prefix, epoch, abstract)
        variables = state.variables
        print(f"restored {prefix} epoch {epoch}")
    else:
        from accel_tpu.utils.host_init import host_init

        if not args.random_weights:
            print("no checkpoint found — exporting random weights",
                  file=sys.stderr)
        variables = host_init(model, dummy, dummy, jnp.ones((1,)), train=False)

    interval = int(args.interval or cfg.TEST.KEY_FRAME_INTERVAL)
    propagate = args.propagate or str(cfg.network.propagate)
    try:
        batch = int(args.batch)
    except ValueError:
        batch = args.batch
    platforms = args.platforms.split(",") if args.platforms else None

    blob = export_serving(
        model, variables, (args.height, args.width), interval,
        propagate=propagate, batch=batch,
        upsample=str(cfg.TEST.upsample),
        embed_params=args.embed_params, platforms=platforms, path=args.out,
    )
    print(
        f"wrote {args.out}: {len(blob) / 1e6:.1f} MB, "
        f"clip=({batch},{interval},{args.height},{args.width},3), "
        f"propagate={propagate}, params "
        f"{'embedded' if args.embed_params else 'as argument'}"
    )


if __name__ == "__main__":
    main()
