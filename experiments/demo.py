#!/usr/bin/env python
"""Demo: run the pipeline on a directory of frames, write colorized maps.

Reference counterpart: ``<net>/demo.py`` + bundled ``demo/`` frames
(SURVEY.md §3.4). Frames are consumed in sorted order as one video clip.

Usage:
  python experiments/demo.py --cfg experiments/cfgs/accel18_cityscapes.yaml \
      --frames demo/frames --out demo/output [--synthetic]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# standard Cityscapes 19-class palette (trainId -> BGR for cv2.imwrite)
CITYSCAPES_PALETTE = np.array(
    [
        [128, 64, 128], [244, 35, 232], [70, 70, 70], [102, 102, 156],
        [190, 153, 153], [153, 153, 153], [250, 170, 30], [220, 220, 0],
        [107, 142, 35], [152, 251, 152], [70, 130, 180], [220, 20, 60],
        [255, 0, 0], [0, 0, 142], [0, 0, 70], [0, 60, 100],
        [0, 80, 100], [0, 0, 230], [119, 11, 32],
    ],
    np.uint8,
)[:, ::-1]


def colorize(pred: np.ndarray) -> np.ndarray:
    pal = np.vstack([CITYSCAPES_PALETTE,
                     np.zeros((256 - len(CITYSCAPES_PALETTE), 3), np.uint8)])
    return pal[pred]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--frames", default="demo/frames")
    ap.add_argument("--out", default="demo/output")
    ap.add_argument("--synthetic", action="store_true",
                    help="generate synthetic frames if --frames is empty")
    args = ap.parse_args()

    import cv2
    import jax

    if os.environ.get("ACCEL_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ACCEL_PLATFORM"])
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from accel_tpu.config import load_config
    from accel_tpu.core.pipeline import clip_predictions
    from accel_tpu.data.image import transform
    from accel_tpu.models.accel import build_model

    cfg = load_config(args.cfg)
    k = int(cfg.TEST.KEY_FRAME_INTERVAL)

    paths = sorted(glob.glob(os.path.join(args.frames, "*.png"))) + sorted(
        glob.glob(os.path.join(args.frames, "*.jpg"))
    )
    if not paths and args.synthetic:
        os.makedirs(args.frames, exist_ok=True)
        rng = np.random.default_rng(0)
        base = rng.integers(0, 255, (256, 512, 3), np.uint8)
        for i in range(k * 2):
            frame = np.roll(base, shift=4 * i, axis=1)
            p = os.path.join(args.frames, f"frame_{i:04d}.png")
            cv2.imwrite(p, frame)
            paths.append(p)
    assert paths, f"no frames in {args.frames}"

    frames = [cv2.imread(p, cv2.IMREAD_COLOR) for p in paths]
    n_use = (len(frames) // k) * k
    frames = frames[:n_use]
    means = cfg.network.PIXEL_MEANS
    stds = cfg.network.PIXEL_STDS
    clip = np.stack([transform(f, means, stds)[0] for f in frames])[None]

    from accel_tpu.utils.host_init import host_init

    model = build_model(cfg)
    side = 64 * int(cfg.network.flow_input_downscale)
    dummy = jnp.zeros((1, side, side, 3), jnp.float32)
    variables = host_init(model, dummy, dummy, jnp.ones((1,)), train=False)
    preds = np.asarray(
        clip_predictions(model, variables, jnp.asarray(clip), k,
                         str(cfg.network.propagate))
    )[0]

    os.makedirs(args.out, exist_ok=True)
    for p, pred in zip(paths, preds):
        out_path = os.path.join(args.out, os.path.basename(p).replace(".", "_seg."))
        cv2.imwrite(out_path, colorize(pred))
    print(f"wrote {len(preds)} colorized maps to {args.out}")


if __name__ == "__main__":
    main()
