#!/usr/bin/env python
"""In-program A/B of dilated-conv lowerings inside the FULL DeepLab model.

Lesson encoded in ops/dilated.py: two lowerings (s2b with forced f32
accumulation; shift1x1 on the fc6 head) won isolated microbenches and
lost in-program, because XLA fuses producers/epilogues and picks operand
layouts for the surrounding graph. So any new lowering must be timed
inside the full per-frame program before `auto` may route to it. This
tool slope-times DeepLab-{depth} at full res with each lowering arm,
sharing one parameter tree (the knob is checkpoint-compatible).
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def slope_time(step, variables, base, n_lo=1, n_hi=8):
    @functools.partial(jax.jit, static_argnums=(3,))
    def run_n(variables, base, scales, n):
        def body(acc, s):
            out = step(variables, base * s)
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
    t_lo = min(timed(n_lo) for _ in range(3))
    t_hi = min(timed(n_hi) for _ in range(3))
    return max(t_hi - t_lo, 1e-9) / (n_hi - n_lo)


def main():
    if os.environ.get("ACCEL_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ACCEL_PLATFORM"])
    try:
        from accel_tpu.utils.cache import setup_compile_cache

        setup_compile_cache()
    except Exception:
        pass
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--depth", type=int, default=101)
    ap.add_argument("--feat-stride", type=int, default=16)
    ap.add_argument("--arms", default="direct,pallas")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from accel_tpu.models.deeplab import DeepLab

    B, H, W = args.batch, args.height, args.width
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, H, W, 3)), jnp.bfloat16
    )

    def build(arm):
        return DeepLab(
            depth=args.depth, output_stride=args.feat_stride, dilated_conv=arm
        )

    ref = build("direct")
    variables = jax.jit(functools.partial(ref.init, train=False))(
        jax.random.PRNGKey(0), x
    )
    jax.block_until_ready(variables)
    print(
        f"backend={jax.default_backend()} DeepLab-{args.depth} "
        f"os{args.feat_stride} B={B} {H}x{W}"
    )
    for arm in args.arms.split(","):
        m = build(arm.strip())
        step = lambda v, img: m.apply(v, img, train=False)
        for r in range(args.runs):
            t = slope_time(step, variables, x)
            print(f"  {arm:8s} run{r}  {t*1e3:7.2f} ms/step  "
                  f"{B/t:6.1f} fps")


if __name__ == "__main__":
    main()
