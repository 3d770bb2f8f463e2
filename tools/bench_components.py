#!/usr/bin/env python
"""Per-component throughput breakdown on the current device (slope-timed).

Times each stage of the Accel pipeline separately: reference branch,
update branch, FlowNet, warp (pallas vs XLA, zero vs random flow), fusion +
upsample + argmax. Guides optimization (which stage eats the non-key
frame budget).
"""

import argparse
import functools
import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def slope_time(step, base, variables=None, n_lo=1, n_hi=8):
    """step(variables, scaled_base) -> array. ``variables`` passed as a jit
    argument (embedding a 45M-param tree as compile-time constants makes
    compiles take ~10 minutes through the tunnel)."""

    @functools.partial(jax.jit, static_argnums=(3,))
    def run_n(variables, base, scales, n):
        def body(acc, s):
            out = step(variables, jax.tree.map(lambda b: b * s, base))
            return acc + jnp.sum(out.astype(jnp.float32)), ()

        acc, _ = jax.lax.scan(body, jnp.float32(0), scales, length=n)
        return acc

    rng = np.random.default_rng(int(time.time() * 1e3) % 2**31)

    def timed(n):
        scales = jnp.asarray(rng.uniform(0.9, 1.1, (n,)), jnp.float32)
        t0 = time.perf_counter()
        float(run_n(variables, base, scales, n))
        return time.perf_counter() - t0

    timed(n_lo)
    timed(n_hi)
    t_lo = min(timed(n_lo) for _ in range(2))
    t_hi = min(timed(n_hi) for _ in range(2))
    return max(t_hi - t_lo, 1e-9) / (n_hi - n_lo)


def main():
    if os.environ.get("ACCEL_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ACCEL_PLATFORM"])
    # persistent compile cache: first compiles through the TPU tunnel take
    # minutes; repeat runs of the same bench shapes should be instant
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--head-channels", type=int, default=1024)
    ap.add_argument("--update-depth", type=int, default=18)
    ap.add_argument("--feat-stride", type=int, default=16,
                    help="backbone output stride (16 or 8)")
    args = ap.parse_args()

    from accel_tpu.models.accel import AccelNet
    from accel_tpu.ops.upsample import resize_bilinear
    from accel_tpu.ops.warp import bilinear_warp_xla
    from accel_tpu.ops.warp_pallas import warp_pallas_fwd

    H, W = args.height, args.width
    fs = args.feat_stride
    hf, wf = H // fs, W // fs
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"

    model = AccelNet(
        family="accel", ref_depth=101, update_depth=args.update_depth,
        num_classes=19, feat_stride=fs, head_channels=args.head_channels,
        dtype=jnp.bfloat16, use_pallas_warp=on_tpu,
    )
    cur = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), cur, cur, jnp.ones((1,)), train=False)

    frame = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    score = jnp.asarray(rng.standard_normal((1, hf, wf, 19)), jnp.float32)
    zero_flow = jnp.zeros((1, hf, wf, 2), jnp.float32)
    rand_flow = jnp.asarray(rng.uniform(-6, 6, (1, hf, wf, 2)), jnp.float32)
    smooth_flow = jnp.broadcast_to(
        jnp.asarray([[1.7, -2.3]], jnp.float32), (1 * hf * wf, 2)
    ).reshape(1, hf, wf, 2) + 0.1 * jnp.asarray(
        rng.standard_normal((1, hf, wf, 2)), jnp.float32
    )

    results = {}
    results["ref_branch(R101+head)"] = slope_time(
        lambda v, b: model.apply(v, b, method="ref_propagated"), frame, variables
    )
    results[f"update_branch(R{args.update_depth}+head)"] = slope_time(
        lambda v, b: model.apply(v, b, method="update_scores"), frame, variables
    )
    results["flownet(half-res pair)"] = slope_time(
        lambda v, b: model.apply(v, b, b * 0.5, method="flow")[0], frame, variables
    )
    if on_tpu:
        results["warp_pallas zero-flow"] = slope_time(
            lambda v, b: warp_pallas_fwd(b, zero_flow, 8), score
        )
        results["warp_pallas smooth-flow"] = slope_time(
            lambda v, b: warp_pallas_fwd(b, smooth_flow, 8), score
        )
        results["warp_pallas random-flow"] = slope_time(
            lambda v, b: warp_pallas_fwd(b, rand_flow, 8), score
        )
    results["warp_xla gather"] = slope_time(
        lambda v, b: bilinear_warp_xla(b, rand_flow), score
    )
    results["fusion+upsample+argmax"] = slope_time(
        lambda v, b: jnp.argmax(
            resize_bilinear(model.apply(v, b, b * 0.5, method="fuse"), (H, W)),
            -1,
        ).astype(jnp.uint8),
        score,
        variables,
    )
    results["upsample+argmax only"] = slope_time(
        lambda v, b: jnp.argmax(resize_bilinear(b, (H, W)), -1).astype(jnp.uint8), score
    )

    print(f"\n== component times @ {H}x{W} os{fs} (ms) ==")
    for k, v in results.items():
        print(f"{k:32s} {v * 1e3:8.3f}")


if __name__ == "__main__":
    main()
