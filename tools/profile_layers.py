#!/usr/bin/env python
"""Per-LAYER roofline of the DeepLab branches (VERDICT r3 #4).

The r3 per-stage profile located the fast preset's residual in the key
branch (57% of its MXU roof) and the half-res update branch (30.7%) but
stopped at stage granularity. This tool splits each branch into
stem / layer1 / layer2 / layer3 / layer4 / fc6 / score and slope-times
every piece AT THE EXACT SHAPE it sees inside the batched group step,
with the same analytic MXU/HBM bound columns as profile_group_step.py.

The stage modules are rebuilt from the SAME block classes the model uses
(models/resnet.py BasicBlock/Bottleneck, models/deeplab.py head convs), so
lowering matches the real branch; random params (throughput is
weight-independent). Method note: this locates where the milliseconds go —
any candidate fix must still be A/B'd in-program (two prior shape-local
"wins" did not transfer: BASELINE.md dilated-conv history).

Usage (detached on TPU):
  setsid nohup python -u tools/profile_layers.py --branch fast_update \
      > /tmp/profile_layers.log 2>&1 &
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
from typing import Any

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class _Stem(nn.Module):
    norm: str = "groupnorm"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from accel_tpu.models.resnet import make_norm

        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = make_norm(self.norm, self.dtype, False)(name="bn")(x)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


class _Stage(nn.Module):
    depth: int
    stage: int  # 1..4
    stride: int
    dilation: int
    norm: str = "groupnorm"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from accel_tpu.models.resnet import STAGE_PLANS, BasicBlock, Bottleneck

        kind, plan = STAGE_PLANS[self.depth]
        cls = BasicBlock if kind == "basic" else Bottleneck
        w = (64, 128, 256, 512)[self.stage - 1]
        for bi in range(plan[self.stage - 1]):
            x = cls(width=w, stride=self.stride if bi == 0 else 1,
                    dilation=self.dilation, norm=self.norm, dtype=self.dtype,
                    name=f"layer{self.stage}_block{bi}")(x)
        return x


class _Head(nn.Module):
    channels: int
    dilation: int
    num_classes: int = 19
    part: str = "fc6"  # 'fc6' | 'score'
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        if self.part == "fc6":
            x = nn.Conv(self.channels, (3, 3),
                        kernel_dilation=(self.dilation, self.dilation),
                        padding=[(self.dilation,) * 2] * 2,
                        dtype=self.dtype, name="fc6")(x)
            return nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="score")(x.astype(jnp.float32))


def branch_spec(name, H, W, B, k):
    """(depth, input (N,h,w,c), head_channels, per-call frames) per branch.

    Shapes mirror the batched group step: the key branch runs at batch B
    on full res; the fast update branch at batch B*k on HALF res (its
    update_input_downscale=2) with a 256-wide head; the faithful update
    branch at B*k full res, 1024-wide head.
    """
    if name == "key101":
        return 101, (B, H, W, 3), 1024, B * k
    if name == "fast_update":
        return 18, (B * k, H // 2, W // 2, 3), 256, B * k
    if name == "faithful_update":
        return 18, (B * k, H, W, 3), 1024, B * k
    raise ValueError(name)


def main():
    if os.environ.get("ACCEL_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ACCEL_PLATFORM"])
    from accel_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--branch", default="fast_update",
                    choices=["key101", "fast_update", "faithful_update"])
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--clip-batch", type=int, default=4)
    ap.add_argument("--interval", type=int, default=5)
    ap.add_argument("--norm", default="groupnorm")
    args = ap.parse_args()

    from bench import SlopeMeter, _flops_of

    depth, in_shape, head_ch, frames = branch_spec(
        args.branch, args.height, args.width, args.clip_batch, args.interval)
    N, h, w, _ = in_shape
    rng = np.random.default_rng(0)

    # os16 stage plan (strides/dils) — matches DilatedResNet output_stride=16
    strides, dils = (1, 2, 2, 1), (1, 1, 1, 2)
    out_ch = {18: (64, 128, 256, 512), 34: (64, 128, 256, 512)}.get(
        depth, (256, 512, 1024, 2048))

    PEAK, BW = 197e12, 819e9
    pieces = []
    x = jnp.asarray(rng.standard_normal(in_shape), jnp.bfloat16)
    pieces.append(("stem", _Stem(norm=args.norm), x))
    hs, ws = h // 4, w // 4
    cin = 64
    for si in range(4):
        mod = _Stage(depth=depth, stage=si + 1, stride=strides[si],
                     dilation=dils[si], norm=args.norm)
        xin = jnp.asarray(
            rng.standard_normal((N, hs, ws, cin)), jnp.bfloat16)
        pieces.append((f"layer{si + 1} (s{strides[si]} d{dils[si]})", mod, xin))
        hs, ws = hs // strides[si], ws // strides[si]
        cin = out_ch[si]
    xfeat = jnp.asarray(rng.standard_normal((N, hs, ws, cin)), jnp.bfloat16)
    pieces.append(("fc6 (3x3 d6)", _Head(channels=head_ch, dilation=6,
                                         part="fc6"), xfeat))
    xhead = jnp.asarray(rng.standard_normal((N, hs, ws, head_ch)), jnp.bfloat16)
    pieces.append(("score 1x1", _Head(channels=head_ch, dilation=6,
                                      part="score"), xhead))

    print(f"== {args.branch} per-layer @ input {in_shape} "
          f"(os16, head {head_ch}) ==", flush=True)
    total, total_bound = 0.0, 0.0
    for name, mod, xin in pieces:
        variables = mod.init(jax.random.PRNGKey(0), xin)

        def fn(v, b, s=None, mod=mod):
            return mod.apply(v, b if s is None else b * s)

        try:
            m = SlopeMeter(fn, variables, xin, verbose=False).compile()
            t = min(m.draw() for _ in range(2))
        except Exception as e:
            print(f"  {name:22s} FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue
        fl = _flops_of(fn, variables, xin) or 0
        out = jax.eval_shape(fn, variables, xin)
        nbytes = (xin.size * xin.dtype.itemsize
                  + int(np.prod(out.shape)) * out.dtype.itemsize
                  + sum(int(np.prod(p.shape)) * p.dtype.itemsize
                        for p in jax.tree.leaves(variables)))
        t_bound = max(fl / PEAK, nbytes / BW)
        which = "MXU" if fl / PEAK >= nbytes / BW else "HBM"
        total += t
        total_bound += t_bound
        print(f"  {name:22s} {t * 1e3:8.3f} ms/call  "
              f"{t * 1e3 / frames:6.3f} ms/frame  {fl / t / 1e12:6.1f} TF/s  "
              f"roof {t_bound * 1e3:7.3f} ms ({which})  "
              f"{100 * t_bound / t:5.1f}% of roof", flush=True)
    print(f"\nsum of layers: {total * 1e3:.3f} ms/call; sum of bounds: "
          f"{total_bound * 1e3:.3f} ms ({100 * total_bound / total:.1f}% of "
          f"roof composite)", flush=True)


if __name__ == "__main__":
    main()
