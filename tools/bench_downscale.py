#!/usr/bin/env python
"""Isolated A/B of integer-factor bilinear-downscale lowerings on TPU.

Stage profile (tools/profile_group_step.py, v5e, B*k=20 full-res frames):
the jax.image.resize lowering of ``downscale_for_flow`` is dense interp-
matrix matmuls — 7.8 ms/call at f=2 (33 TF/s, ~95% multiply-by-zero) and
2.5 ms at f=4, where the bandwidth bound is ~1 ms. Candidates (both exact,
ops/upsample.py): 'conv' = one strided conv with the fixed separable
triangle kernel; 'slice' = strided slice-FMA sum.

Per the ops/dilated.py standing policy this microbench is NOT sufficient to
flip a default — the in-program A/B (profile_group_step with
ACCEL_DOWNSCALE) decides.

Usage: setsid nohup python -u tools/bench_downscale.py > /tmp/ds_bench.log 2>&1 &
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
    from accel_tpu.ops.upsample import downscale_bilinear

    rng = np.random.default_rng(0)
    for (n, h, w, c) in [(20, 1024, 2048, 3), (16, 512, 1024, 3)]:
        x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
        for f in (2, 4):
            for method in ("conv", "slice", "resize"):
                if method == "resize":
                    def fn(v, b, s=None, h=h, w=w, f=f):
                        b = b if s is None else b * s
                        return jax.image.resize(
                            b, (b.shape[0], h // f, w // f, b.shape[-1]),
                            method="linear")
                else:
                    def fn(v, b, s=None, f=f, m=method):
                        return downscale_bilinear(
                            b if s is None else b * s, f, f, m)
                t = min(SlopeMeter(fn, {}, x, verbose=False).compile().draw()
                        for _ in range(2))
                gb = x.nbytes / 1e9
                print(f"  {n}x{h}x{w}x{c} /{f} [{method:6s}] "
                      f"{t * 1e3:8.3f} ms  {gb / t:6.1f} GB/s(read)",
                      flush=True)


if __name__ == "__main__":
    main()
