#!/usr/bin/env python
"""Distribution of the learned flow's displacement at feature resolution —
the quantity ``network.warp_max_disp`` clamps (Pallas warp VMEM window,
ops/warp_pallas.py).

The max_disp knee sweep can only show a knee if the flow actually exceeds
the clamp; this probe measures, on a trained checkpoint and real val
clips, the |flow| percentiles per warp the eval would dispatch — both the
direct group warp (key -> annotated, the largest displacement) and the
incremental per-step warps. Runs fine on CPU:

  ACCEL_PLATFORM=cpu python tools/probe_flow_magnitude.py \
      --cfg experiments/cfgs/extreme_synth_accel18.yaml --clips 8
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--clips", type=int, default=8)
    ap.add_argument("--epoch", type=int, default=None)
    args = ap.parse_args()

    if os.environ.get("ACCEL_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["ACCEL_PLATFORM"])
    import jax
    import jax.numpy as jnp

    from accel_tpu.config.loader import load_config
    from accel_tpu.core.checkpoint import load_checkpoint, saved_epochs
    from accel_tpu.core.trainer import init_train_state, make_optimizer
    from accel_tpu.data.loader import TestClipLoader
    from accel_tpu.models.accel import build_model

    cfg = load_config(args.cfg)
    cfg_name = os.path.splitext(os.path.basename(args.cfg))[0]

    if cfg.dataset.dataset.lower().startswith("city"):
        from accel_tpu.data.cityscapes import Cityscape

        imdb = Cityscape(cfg.dataset.test_image_set, cfg.dataset.root_path,
                         cfg.dataset.dataset_path)
    else:
        from accel_tpu.data.camvid import CamVid

        imdb = CamVid(cfg.dataset.test_image_set, cfg.dataset.root_path,
                      cfg.dataset.dataset_path)

    model = build_model(cfg)
    side = 64 * int(cfg.network.flow_input_downscale)
    dummy = jnp.zeros((1, side, side, 3), jnp.float32)
    train_dir = os.path.join(cfg.output_path, cfg_name, cfg.dataset.image_set)
    prefix = os.path.join(train_dir, cfg.TRAIN.model_prefix)
    steps = saved_epochs(prefix)
    if not steps:
        print(f"no checkpoint under {prefix}", file=sys.stderr)
        return 1
    tx, _ = make_optimizer(cfg, 1)
    abstract = jax.eval_shape(lambda: init_train_state(
        model,
        model.init(jax.random.PRNGKey(0), dummy, dummy, jnp.ones((1,)),
                   train=False),
        tx,
    ))
    epoch = args.epoch if args.epoch is not None else max(steps)
    state = load_checkpoint(prefix, epoch, abstract)
    variables = state.variables
    print(f"restored {prefix} epoch {epoch}")

    # ann_pos = interval-1 (annotated frame farthest from the keyframe):
    # the direct warp's maximum displacement
    cfg.TEST.KEY_FRAME_OFFSET = 0
    k = int(cfg.TEST.KEY_FRAME_INTERVAL)
    loader = TestClipLoader(imdb, cfg, batch_clips=1, max_items=args.clips)

    flow_fn = jax.jit(lambda v, cur, anc: model.apply(
        v, cur, anc, method="flow")[0])

    def stats(name, mags):
        m = np.concatenate([x.ravel() for x in mags])
        qs = np.percentile(m, [50, 90, 99, 99.9])
        line = (f"{name:28s} n={m.size:8d}  p50 {qs[0]:6.2f}  p90 {qs[1]:6.2f}"
                f"  p99 {qs[2]:6.2f}  p99.9 {qs[3]:6.2f}  max {m.max():6.2f}")
        for d in (4, 8, 16, 32):
            line += f"  >{d}: {100.0 * float((m > d).mean()):.3f}%"
        print(line, flush=True)

    direct_mags, step_mags = [], []
    for i, batch in enumerate(loader):
        clip = jnp.asarray(batch["clip"])  # (B,F,H,W,3)
        key, ann = clip[:, 0], clip[:, loader.ann_pos]
        f = np.asarray(flow_fn(variables, ann, key), np.float32)
        direct_mags.append(np.abs(f))
        for t in range(1, loader.ann_pos + 1):
            f = np.asarray(
                flow_fn(variables, clip[:, t], clip[:, t - 1]), np.float32)
            step_mags.append(np.abs(f))
        if i + 1 >= args.clips:
            break

    print(f"== |flow| at feature res (stride {model.feat_stride}), "
          f"k={k}, ann_pos={loader.ann_pos}, {len(direct_mags)} clips ==")
    stats(f"direct key->ann ({loader.ann_pos} frames)", direct_mags)
    if step_mags:
        stats("incremental per-step (1 frame)", step_mags)
    return 0


if __name__ == "__main__":
    sys.exit(main())
