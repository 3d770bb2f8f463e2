#!/usr/bin/env python
"""Probe the B=8 clip-batch OOM (BASELINE.md): which program shapes fit.

Arms:
  serve   — plain clip_predictions on a raw (B,k,H,W,3) clip: the REAL
            serving program, no bench-harness multiply in front.
  bench   — the bench harness shape: lax.scan over per-step scales with a
            whole-clip ``base * s`` in the body (the allocator trace showed
            this staging f32[8,5,1024,2048,3] in a lane-padded layout).
  barrier — bench shape + jax.lax.optimization_barrier between the scaled
            clip and the serving fn, so layout assignment can't propagate a
            conv-preferred padded layout onto the materialized
            (LICM-hoisted) convert_multiply fusion root.
  fused   — bench shape with the scale passed through clip_predictions'
            ``input_scale`` (the shipped fix): the multiply happens inside
            the chunked per-frame loops where it fuses into the consuming
            convs, so no whole-clip scaled/converted temporary exists.

Each arm compiles AND runs one dispatch; success prints the peak-memory
cost analysis when available. Run arms in separate processes (a compile
OOM can poison the client).
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    if os.environ.get("ACCEL_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ACCEL_PLATFORM"])
    from accel_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("arm", choices=["serve", "bench", "barrier", "fused"])
    ap.add_argument("--clip-batch", type=int, default=8)
    ap.add_argument("--interval", type=int, default=5)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--input-dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    from accel_tpu.core.pipeline import clip_predictions
    from accel_tpu.models.accel import AccelNet
    from accel_tpu.utils.host_init import host_init

    B, k, H, W = args.clip_batch, args.interval, args.height, args.width
    on_tpu = jax.default_backend() == "tpu"
    model = AccelNet(
        family="accel", ref_depth=101, update_depth=18, num_classes=19,
        feat_stride=16, head_channels=1024, head_dilation=6,
        dtype=jnp.bfloat16, use_pallas_warp=on_tpu, warp_max_disp=8,
    )
    side = 64 * model.flow_input_downscale
    z = jnp.zeros((1, side, side, 3), jnp.float32)
    variables = host_init(model, z, z, jnp.ones((1,)), train=False)
    rng = np.random.default_rng(0)
    clip = jnp.asarray(
        rng.standard_normal((B, k, H, W, 3)), jnp.dtype(args.input_dtype)
    )

    def serve_fn(v, c, scale=None):
        return clip_predictions(model, v, c, k, "direct", input_scale=scale)

    if args.arm == "serve":
        fn = jax.jit(serve_fn)
        out = fn(variables, clip)
        jax.block_until_ready(out)
        compiled = fn.lower(variables, clip).compile()
    else:
        barrier = args.arm == "barrier"
        fused = args.arm == "fused"

        @jax.jit
        def run_n(v, base, scales):
            def body(acc, s):
                if fused:
                    out = serve_fn(v, base, scale=s)
                    return acc + jnp.sum(out.astype(jnp.int32)), ()
                x = base * s
                if barrier:
                    x = jax.lax.optimization_barrier(x)
                out = serve_fn(v, x)
                return acc + jnp.sum(out.astype(jnp.int32)), ()

            acc, _ = jax.lax.scan(body, jnp.int32(0), scales)
            return acc

        scales = jnp.asarray(rng.uniform(0.9, 1.1, (2,)), jnp.float32)
        out = run_n(variables, clip, scales)
        jax.block_until_ready(out)
        compiled = run_n.lower(variables, clip, scales).compile()

    try:
        mem = compiled.memory_analysis()
        print(f"PROBE OK arm={args.arm} B={B} "
              f"temp={getattr(mem, 'temp_size_in_bytes', None)} "
              f"args={getattr(mem, 'argument_size_in_bytes', None)}")
    except Exception:
        print(f"PROBE OK arm={args.arm} B={B} (no memory_analysis)")


if __name__ == "__main__":
    main()
