#!/usr/bin/env python
"""Isolated fused-stem probe: kernel vs the XLA conv7 stem at the three
group-step stem shapes, across row_block values.

Motivation (r5 in-program A/B): fused7 wins the per-frame R101 programs
(key branch 38.9 -> 36.0 ms at B=4 full-res) but LOSES on the faithful
update branch (77.0 -> 83.2 ms at B*k=20 full-res) and ties/loses at the
fast preset's half-res B=20 shape — this probe separates the kernel's own
scaling from the in-program context and sweeps the R (row-block) knob.

Run detached on TPU:
  setsid nohup python -u tools/probe_fused_stem.py > /tmp/probe_stem.log 2>&1 &
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
    from accel_tpu.ops.fused_stem import _oracle, fused_stem_fwd

    rng = np.random.default_rng(0)
    k7 = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.1, jnp.float32)
    inv = jnp.asarray(rng.uniform(0.5, 1.5, (64,)), jnp.float32)
    shift = jnp.asarray(rng.standard_normal((64,)) * 0.1, jnp.float32)

    shapes = [
        ("key/baseline B=4 full-res", (4, 1024, 2048, 3)),
        ("faithful update B=20 full-res", (20, 1024, 2048, 3)),
        ("fast update B=20 half-res", (20, 512, 1024, 3)),
    ]
    for name, shp in shapes:
        x = jnp.asarray(rng.standard_normal(shp), jnp.bfloat16)
        # per-step scale rides the small affine so the big input stays
        # unmultiplied (probe_onehot_kernel contract)
        print(f"== {name} {shp} ==", flush=True)
        t = SlopeMeter(
            lambda v, b, s: _oracle(b, v[0], v[1] * s, v[2]),
            (k7, inv, shift), x, verbose=False,
        ).compile()
        t0 = min(t.draw() for _ in range(3))
        print(f"  xla conv7+affine+relu      {t0 * 1e3:8.3f} ms/call", flush=True)
        for R in (4, 8, 16, 32):
            try:
                m = SlopeMeter(
                    lambda v, b, s, R=R: fused_stem_fwd(
                        b, v[0], v[1] * s, v[2], row_block=R),
                    (k7, inv, shift), x, verbose=False,
                ).compile()
                tr = min(m.draw() for _ in range(3))
                print(f"  fused7 R={R:<2d}               {tr * 1e3:8.3f} ms/call",
                      flush=True)
            except Exception as e:
                print(f"  fused7 R={R:<2d} FAILED: {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
