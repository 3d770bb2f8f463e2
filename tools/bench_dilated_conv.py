#!/usr/bin/env python
"""Microbench: dilated 3x3 conv lowering on TPU at os8 shapes.

The os8 update branch (R18: layer3 d=2, layer4 d=4, fc6 d=6 at 128x256)
runs at ~107 TF/s while the R101-os8 baseline hits ~142 TF/s. This times
each dilated conv shape three ways:

  direct — conv_general_dilated with rhs_dilation=d (what flax Conv emits)
  s2b    — space-to-batch: split the input into d*d phase grids, run a
           dense 3x3 conv on all phases batched, re-interleave (exact for
           stride-1 dilated convs; turns one dilated conv into a dense conv
           at d^2 x batch, 1/d^2 spatial)
  dense  — same-FLOPs dense 3x3 conv (upper bound / reference rate)

Prints ms and TF/s per arm per shape.
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


def slope_time(fn, *args, n_lo=1, n_hi=16):
    @functools.partial(jax.jit, static_argnums=(len(args) + 1,))
    def run_n(*a):
        *arrs, scales, n = a

        def body(acc, s):
            out = fn(*[x * s.astype(x.dtype) for x in arrs[:1]], *arrs[1:])
            return acc + jnp.sum(out.astype(jnp.float32)), ()

        acc, _ = jax.lax.scan(body, jnp.float32(0), scales, length=n)
        return acc

    rng = np.random.default_rng(int(time.time() * 1e3) % 2**31)

    def timed(n):
        scales = jnp.asarray(rng.uniform(0.9, 1.1, (n,)), jnp.float32)
        t0 = time.perf_counter()
        float(run_n(*args, scales, n))
        return time.perf_counter() - t0

    timed(n_lo)
    timed(n_hi)
    t_lo = min(timed(n_lo) for _ in range(2))
    t_hi = min(timed(n_hi) for _ in range(2))
    return max(t_hi - t_lo, 1e-9) / (n_hi - n_lo)


def conv_direct(x, w, d):
    # no preferred_element_type: matches what flax nn.Conv emits in the
    # models (all arms measured the way they'd actually run)
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(d, d), (d, d)],
        rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_s2b(x, w, d, factor=None):
    """The shipping rewrite (ops/dilated.py): phase decomposition by
    ``factor`` (default d — dense phases), residual dilation d/factor."""
    from accel_tpu.ops.dilated import s2b_conv_general_dilated

    return s2b_conv_general_dilated(
        x, w, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), _factor=factor,
    )


def conv_shift1x1(x, w, d):
    """Tap decomposition (ops/dilated.py): sum over the K*K taps of a 1x1
    conv on the shifted input — one halo-free MXU matmul per tap."""
    from accel_tpu.ops.dilated import shift1x1_conv_general_dilated

    return shift1x1_conv_general_dilated(
        x, w, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_pallas(x, w, d):
    """Fused-tap Pallas kernel (ops/dilated_pallas.py): one program, nine
    VMEM-local MXU matmuls per row-block, f32 accumulation."""
    from accel_tpu.ops.dilated_pallas import pallas_conv_general_dilated

    return pallas_conv_general_dilated(
        x, w, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_dense(x, w, d):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


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
    ap.add_argument("--arms", default="",
                    help="csv filter of arm names (empty = all); e.g. "
                         "'direct,pallas,dense' for a quick A/B")
    ap.add_argument("--shapes", default="",
                    help="csv of shape indices into the hot-shape table")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    B = args.batch
    # (H, W, Cin, Cout, dilation) — the dilated hot shapes at 1024x2048
    # input: os8 stages/heads at 128x256, os16 at 64x128
    shapes = [
        (128, 256, 256, 256, 2),   # R18 layer3 @ os8
        (128, 256, 512, 512, 4),   # R18 layer4 @ os8  (the big one)
        (128, 256, 512, 1024, 6),  # fc6 @ os8 (R18 head)
        (128, 256, 2048, 1024, 6), # fc6 @ os8 (R101 head)
        (128, 256, 1024, 256, 4),  # R101 layer4 bottleneck 3x3 inner @ os8
        (64, 128, 512, 512, 2),    # R18 layer4 @ os16 (contrast)
        (64, 128, 2048, 1024, 6),  # fc6 @ os16 (R101 head)
        (64, 128, 512, 1024, 6),   # fc6 @ os16 (R18 head)
    ]
    if args.shapes:
        keep = {int(i) for i in args.shapes.split(",")}
        shapes = [s for i, s in enumerate(shapes) if i in keep]
    arm_filter = {a.strip() for a in args.arms.split(",") if a.strip()}
    verify = jax.default_backend() != "tpu"
    print(f"backend={jax.default_backend()} B={B}")
    for h, w_, ci, co, d in shapes:
        x = jnp.asarray(rng.standard_normal((B, h, w_, ci)), jnp.bfloat16)
        k = jnp.asarray(
            rng.standard_normal((3, 3, ci, co)) / np.sqrt(9 * ci), jnp.bfloat16
        )
        tflop = 2 * B * h * w_ * 9 * ci * co / 1e12
        # every factor of d (full decomposition = d itself), plus the
        # direct and same-FLOPs-dense endpoints
        factors = [f for f in range(2, d + 1) if d % f == 0]
        arms = [("direct", functools.partial(conv_direct, d=d))]
        arms += [
            (f"s2b/f{f}", functools.partial(conv_s2b, d=d, factor=f))
            for f in factors
        ]
        arms += [("shift1x1", functools.partial(conv_shift1x1, d=d))]
        arms += [("pallas", functools.partial(conv_pallas, d=d))]
        arms += [("dense", functools.partial(conv_dense, d=d))]
        if verify:
            a = np.asarray(conv_direct(x, k, d), np.float32)
            for f in factors:
                b = np.asarray(conv_s2b(x, k, d, factor=f), np.float32)
                err = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
                print(f"  s2b/f{f} exactness rel-err {err:.2e}")
            b = np.asarray(conv_shift1x1(x, k, d), np.float32)
            err = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
            print(f"  shift1x1 exactness rel-err {err:.2e}")
        print(f"({h}x{w_}, {ci}->{co}, d={d})")
        if arm_filter:
            arms = [(n, f) for n, f in arms
                    if n in arm_filter or n.split("/")[0] in arm_filter]
        for name, fn in arms:
            t = slope_time(fn, x, k)
            print(f"    {name:9s} {t*1e3:7.2f}ms {tflop/t:6.0f}TF/s")


if __name__ == "__main__":
    main()
