#!/usr/bin/env python
"""Warp-variant A/B at the bench shapes (VERDICT r2 #1: the warp stage runs
at 9-12% of its HBM roofline in the r3 per-stage profile — the largest
remaining non-key cost on DFF).

Variants on the DFF non-key batch (B*(k-1)=16, 64x128, 1024ch bf16):
  taps-f32      4-gather oracle on f32 copy (training default)
  taps-native   same, feat stays bf16
  stacked       one 4-tap gather, native dtype
  roll          masked-roll Pallas kernel (warp_pallas)
  onehot        one-hot MXU matmul kernel (warp_onehot, bf16 weights)
  onehot+scale  same with the scale modulation fused into the epilogue
For non-fused variants the scale multiply is timed WITH the warp (that is
what the group step dispatches); per-variant exactness vs the oracle is
printed alongside.

Run detached on TPU: setsid nohup python -u tools/bench_warp.py > /tmp/bench_warp.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    if os.environ.get("ACCEL_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ACCEL_PLATFORM"])
    from accel_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    from bench import SlopeMeter
    from accel_tpu.ops.warp import bilinear_warp_xla, bilinear_warp_xla_stacked
    from accel_tpu.ops.warp_pallas import warp_pallas_fwd
    from accel_tpu.ops.warp_onehot import warp_onehot_fwd

    rng = np.random.default_rng(0)
    for (N, H, W, C), tag in (((16, 64, 128, 1024), "dff-nonkey"),
                              ((16, 64, 128, 19), "accel-scores")):
        feat = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
        flow = jnp.asarray(rng.uniform(-2.3, 2.3, (N, H, W, 2)), jnp.float32)
        scale = jnp.asarray(rng.uniform(0.5, 1.5, (N, H, W, C)), jnp.float32)
        ref = np.asarray(
            bilinear_warp_xla(feat.astype(jnp.float32), flow) * scale,
            np.float32)

        variants = {
            "taps-f32": lambda v, b, s=None:
                bilinear_warp_xla((b if s is None else b * s).astype(
                    jnp.float32), v[0]) * v[1],
            "taps-native": lambda v, b, s=None:
                bilinear_warp_xla(b if s is None else b * s, v[0])
                * v[1].astype(jnp.bfloat16),
            "stacked": lambda v, b, s=None:
                bilinear_warp_xla_stacked(b if s is None else b * s, v[0])
                * v[1].astype(jnp.bfloat16),
            "roll-pallas": lambda v, b, s=None:
                warp_pallas_fwd(b if s is None else b * s, v[0], max_disp=4)
                * v[1].astype(jnp.bfloat16),
            "onehot": lambda v, b, s=None:
                warp_onehot_fwd(b if s is None else b * s, v[0], max_disp=4)
                * v[1].astype(jnp.bfloat16),
            "onehot+scale": lambda v, b, s=None:
                warp_onehot_fwd(b if s is None else b * s, v[0],
                                scale=v[1].astype(jnp.bfloat16), max_disp=4),
            "onehot-f32w": lambda v, b, s=None:
                warp_onehot_fwd(b if s is None else b * s, v[0], max_disp=4,
                                weights_dtype=jnp.float32)
                * v[1].astype(jnp.bfloat16),
        }
        # rank-1 restructure sweep: FLOPs scale with 2D+2 (not R); R only
        # moves the DMA halo. D=8 is the in-program warp_max_disp default.
        for r in (4, 8):
            for d in (4, 8):
                variants[f"onehot-R{r}D{d}"] = (
                    lambda v, b, s=None, r=r, d=d:
                    warp_onehot_fwd(b if s is None else b * s, v[0],
                                    max_disp=d, row_block=r)
                    * v[1].astype(jnp.bfloat16))
                variants[f"onehot+scale-R{r}D{d}"] = (
                    lambda v, b, s=None, r=r, d=d:
                    warp_onehot_fwd(b if s is None else b * s, v[0],
                                    scale=v[1].astype(jnp.bfloat16),
                                    max_disp=d, row_block=r))
        nbytes = (2 * N * H * W * C * 2 + N * H * W * (2 + C) * 4)
        print(f"== {tag} ({N},{H},{W},{C}) bf16; HBM roofline "
              f"{nbytes / 819e9 * 1e3:.3f} ms ==", flush=True)
        for name, fn in variants.items():
            try:
                out = np.asarray(fn((flow, scale), feat), np.float32)
                err = float(np.max(np.abs(out - ref)))
                m = SlopeMeter(fn, (flow, scale), feat, verbose=False).compile()
                t = min(m.draw() for _ in range(3))
                print(f"  {name:14s} {t * 1e3:8.3f} ms/call  "
                      f"{t * 1e3 / N:6.3f} ms/frame  max|err| {err:.4f}",
                      flush=True)
            except Exception as e:
                print(f"  {name:14s} FAILED: {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
