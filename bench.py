#!/usr/bin/env python
"""Benchmark: Cityscapes-res video segmentation throughput per chip.

Driver metric (BASELINE.json): Cityscapes val fps/chip at keyframe
interval 5; target >=10x the per-frame DeepLab-101 throughput.

Measures on the available device (TPU preferred):
  baseline — per-frame DeepLab-101 at 1024x2048
  subject  — Accel-18 (ResNet-101 keyframe branch + ResNet-18 update branch
             + corrective fusion) clip inference at keyframe interval 5

Weights are randomly initialized (throughput is weight-independent); frames
are synthetic at full Cityscapes resolution. Prints ONE JSON line.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _build(family: str, ref_depth: int, update_depth: int, use_pallas: bool):
    from accel_tpu.models.accel import AccelNet

    return AccelNet(
        family=family,
        ref_depth=ref_depth,
        update_depth=update_depth,
        num_classes=19,
        feat_stride=16,
        head_channels=1024,
        head_dilation=6,
        dtype=jnp.bfloat16,
        use_pallas_warp=use_pallas,
        warp_max_disp=8,
    )


def _init_variables(model, H, W):
    cur = jnp.zeros((1, H, W, 3), jnp.float32)
    eq = jnp.ones((1,))
    return model.init(jax.random.PRNGKey(0), cur, cur, eq, train=False)


def _time_fn(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--interval", type=int, default=5)
    ap.add_argument("--clip-batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--no-pallas", action="store_true")
    args = ap.parse_args()

    from accel_tpu.core.pipeline import clip_predictions

    H, W, k = args.height, args.width, args.interval
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = (not args.no_pallas) and on_tpu

    # ---- baseline: per-frame DeepLab-101 --------------------------------
    base_model = _build("deeplab", 101, 0, use_pallas)
    base_vars = _init_variables(base_model, H, W)
    frame = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)

    @jax.jit
    def per_frame(variables, image):
        from accel_tpu.ops.upsample import resize_bilinear

        logits = base_model.apply(variables, image, method="ref_propagated")
        return jnp.argmax(resize_bilinear(logits, (H, W)), axis=-1).astype(jnp.uint8)

    t_base = _time_fn(per_frame, base_vars, frame, iters=args.iters)
    base_fps = 1.0 / t_base

    # ---- subject: Accel-18 clip inference @ interval 5 -------------------
    model = _build("accel", 101, 18, use_pallas)
    variables = _init_variables(model, H, W)
    clip = jnp.asarray(
        rng.standard_normal((args.clip_batch, k, H, W, 3)), jnp.float32
    )

    @jax.jit
    def run_clip(variables, clip):
        return clip_predictions(model, variables, clip, k, "incremental")

    t_clip = _time_fn(run_clip, variables, clip, iters=args.iters)
    fps = (args.clip_batch * k) / t_clip

    print(
        json.dumps(
            {
                "metric": f"accel18_fps_per_chip_k{k}_{H}x{W}",
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / base_fps, 3),
                "baseline_deeplab101_fps": round(base_fps, 3),
                "backend": jax.default_backend(),
                "pallas_warp": use_pallas,
            }
        )
    )


if __name__ == "__main__":
    main()
