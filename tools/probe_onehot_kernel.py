#!/usr/bin/env python
"""Where do the one-hot warp's milliseconds go? (VERDICT r3 #1)

The shipped rank-1 one-hot kernel (ops/warp_onehot.py) measures 12-13.5 ms
on the DFF non-key shape against a ~1.8 ms MXU bound / ~3.5 ms achievable —
12.3% of roof. Before building the next formulation, this probe decomposes
the kernel's time into its three cost centers by timing ABLATED variants of
the same kernel (identical grid/BlockSpecs; one piece disabled at a time —
numerics are garbage for the ablated ones, timing is the point):

  full        shipped kernel (build + window DMA + R per-row dots)
  nobuild     weight build skipped (LHS scratch = stale garbage)
  nodma       window DMA skipped (RHS = stale garbage)
  nodot       dots replaced by a window-slice copy (build + DMA kept)
  dotonly     dots alone from persistent scratch (no build, no DMA)
  dbuf        full kernel + DOUBLE-BUFFERED window DMA (step s computes
              while step s+1's window streams in)
  ck          concatenated-K: ONE (R*W, WIN*W) @ (WIN*W, ct) dot per step
              instead of R (W, (2D+2)*W) dots — 1.7x the FLOPs at R=8/D=4
              but a single big-M MXU stream (numerically exact; checked)
  ck+dbuf     ck with the double-buffered window DMA

Run detached on TPU:
  setsid nohup python -u tools/probe_onehot_kernel.py > /tmp/probe_onehot.log 2>&1 &
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from accel_tpu.ops.warp_onehot import _round_up


def _build_weights(fx_ref, fy_ref, lhs_ref, colvec_ref, *, D, W, R, r,
                   col_of_d):
    """Shared rank-1 weight build (same math as ops/warp_onehot._kernel);
    ``col_of_d(il, di)`` maps (output row-in-block, row offset index) to the
    LHS column group — identity bands for the per-row form, il-shifted bands
    for the concatenated-K form."""
    f32 = jnp.float32
    fx = fx_ref[0, 0].astype(f32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    sx = xx.astype(f32) + fx
    x0 = jnp.floor(sx)
    wx = sx - x0
    x0i = x0.astype(jnp.int32)
    sc = jax.lax.broadcasted_iota(jnp.int32, (R, W, W), 2)
    colvec_ref[...] = (
        jnp.where(sc == x0i[..., None], (1.0 - wx)[..., None], 0.0)
        + jnp.where(sc == (x0i + 1)[..., None], wx[..., None], 0.0)
    )
    fy = jnp.clip(fy_ref[0, 0].astype(f32), -D, D)
    yy = (r * R + jax.lax.broadcasted_iota(jnp.int32, (R, W), 0))
    sy = yy.astype(f32) + fy
    y0 = jnp.floor(sy)
    wy = sy - y0
    dy = y0.astype(jnp.int32) - yy
    cv = colvec_ref[...]
    for di in range(2 * D + 2):
        d = di - D
        ryd = (jnp.where(dy == d, 1.0 - wy, 0.0)
               + jnp.where(dy + 1 == d, wy, 0.0))
        prod = (ryd[..., None] * cv).astype(lhs_ref.dtype)
        if col_of_d is None:  # per-row banded LHS (R, W, (2D+2)W)
            lhs_ref[:, :, di * W:(di + 1) * W] = prod
        else:  # concatenated-K LHS (R*W, WIN*W): row block il at cols il+di
            for il in range(R):
                c0 = col_of_d(il, di)
                lhs_ref[il * W:(il + 1) * W, c0 * W:(c0 + 1) * W] = prod[il]


def _kernel_variant(fx_ref, fy_ref, feat_ref, scale_ref, out_ref, lhs_ref,
                    colvec_ref, fw_ref, sem, *, D, W, R, WIN, CT, NB, NR,
                    build, dma, dot, ck, dbuf):
    f32 = jnp.float32
    n = pl.program_id(0)
    r = pl.program_id(1)
    c = pl.program_id(2)
    KD = (2 * D + 2) * W
    step = (n * NR + r) * (pl.num_programs(2)) + c
    nsteps = pl.num_programs(0) * NR * pl.num_programs(2)

    if dma and not dbuf:
        d0 = pltpu.make_async_copy(
            feat_ref.at[n, pl.ds(r * R, WIN), :, pl.ds(c * CT, CT)],
            fw_ref.at[0], sem.at[0])
        d0.start()

    if dbuf:
        # slot parity by step; prefetch step+1's window while computing
        slot = jax.lax.rem(step, 2)
        nxt = step + 1
        cn = jax.lax.rem(nxt, pl.num_programs(2))
        rn = jax.lax.rem(nxt // pl.num_programs(2), NR)
        nn = nxt // (pl.num_programs(2) * NR)

        @pl.when(step == 0)
        def _first():
            pltpu.make_async_copy(
                feat_ref.at[n, pl.ds(r * R, WIN), :, pl.ds(c * CT, CT)],
                fw_ref.at[0], sem.at[0]).start()

        @pl.when(nxt < nsteps)
        def _prefetch():
            pltpu.make_async_copy(
                feat_ref.at[nn, pl.ds(rn * R, WIN), :, pl.ds(cn * CT, CT)],
                fw_ref.at[1 - slot], sem.at[1 - slot]).start()

    if build:
        if ck:
            # band positions are flow-independent: zero the off-band zones
            # of the (R*W, WIN*W) LHS once (scratch is NOT zero-initialized)
            # and they stay zero — every later step rewrites only the band
            @pl.when(step == 0)
            def _zero():
                lhs_ref[...] = jnp.zeros_like(lhs_ref)

        @pl.when(c == 0)
        def _b():
            _build_weights(
                fx_ref, fy_ref, lhs_ref, colvec_ref, D=D, W=W, R=R, r=r,
                col_of_d=(lambda il, di: il + di) if ck else None)

    if dbuf:
        slot = jax.lax.rem(step, 2)
        pltpu.make_async_copy(
            feat_ref.at[n, pl.ds(r * R, WIN), :, pl.ds(c * CT, CT)],
            fw_ref.at[slot], sem.at[slot]).wait()
        win = fw_ref.at[slot]
    elif dma:
        d0.wait()
        win = fw_ref.at[0]
    else:
        win = fw_ref.at[0]

    if not dot:
        out_ref[0] = win[pl.ds(0, R)]
        return
    if ck:
        rhs = win[...].reshape(WIN * W, CT)
        o = jax.lax.dot(lhs_ref[...], rhs, preferred_element_type=f32)
        o = o.reshape(R, W, CT) * scale_ref[0].astype(f32)
        out_ref[0] = o.astype(out_ref.dtype)
    else:
        for il in range(R):
            rhs = win[pl.ds(il, 2 * D + 2)].reshape(KD, CT)
            o = jax.lax.dot(lhs_ref[il], rhs, preferred_element_type=f32)
            o = o * scale_ref[0, il].astype(f32)
            out_ref[0, il] = o.astype(out_ref.dtype)


def probe_call(feat, fx, fy, scale, D, R, ct, *, build=True, dma=True,
               dot=True, ck=False, dbuf=False):
    N, H, W, C = feat.shape
    Wp = _round_up(W, 128)
    HB = -(-H // R)
    Hp = HB * R
    Cp = _round_up(C, ct)
    WIN = R + 2 * D + 1
    feat_p = jnp.pad(feat, ((0, 0), (D, Hp - H + D + 1), (0, Wp - W),
                            (0, Cp - C)))
    fx_p = jnp.pad(fx, ((0, 0), (0, Hp - H), (0, Wp - W))).reshape(N, HB, R, Wp)
    fy_p = jnp.pad(fy, ((0, 0), (0, Hp - H), (0, Wp - W))).reshape(N, HB, R, Wp)
    scale_p = jnp.pad(scale, ((0, 0), (0, Hp - H), (0, Wp - W), (0, Cp - C)))
    grid = (N, HB, Cp // ct)
    if ck:
        lhs_shape = (R * Wp, WIN * Wp)
    else:
        lhs_shape = (R, Wp, (2 * D + 2) * Wp)
    nbuf = 2 if dbuf else 1
    kern = functools.partial(
        _kernel_variant, D=D, W=Wp, R=R, WIN=WIN, CT=ct, NB=HB, NR=HB,
        build=build, dma=dma, dot=dot, ck=ck, dbuf=dbuf)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, Hp, Wp, Cp), feat.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, R, Wp), lambda n, r, c: (n, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R, Wp), lambda n, r, c: (n, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, R, Wp, ct), lambda n, r, c: (n, r, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, Wp, ct), lambda n, r, c: (n, r, 0, c),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(lhs_shape, jnp.bfloat16),
            pltpu.VMEM((R, Wp, Wp), jnp.float32),
            pltpu.VMEM((nbuf, WIN, Wp, ct), feat.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )(fx_p, fy_p, feat_p, scale_p)
    return out[:, :H, :W, :C]


def main():
    if os.environ.get("ACCEL_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ACCEL_PLATFORM"])
    from accel_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    from bench import SlopeMeter
    from accel_tpu.ops.warp import bilinear_warp_xla
    from accel_tpu.ops.warp_onehot import warp_onehot_fwd

    N, H, W, C = 16, 64, 128, 1024
    D = 4
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
    flow = jnp.asarray(rng.uniform(-2.3, 2.3, (N, H, W, 2)), jnp.float32)
    fx, fy = flow[..., 0], flow[..., 1]
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (N, H, W, C)), jnp.bfloat16)
    ref = np.asarray(
        bilinear_warp_xla(feat.astype(jnp.float32), flow)
        * scale.astype(jnp.float32), np.float32)

    flops = 2 * N * H * 128 * (2 * D + 2) * 128 * C  # per-row-dot form
    print(f"shape ({N},{H},{W},{C}) D={D}; per-row-dot FLOPs "
          f"{flops / 1e9:.1f} GF -> MXU bound {flops / 197e12 * 1e3:.2f} ms; "
          f"HBM bound {(2 * N * H * W * C * 2 + N * H * W * C * 2) / 819e9 * 1e3:.2f} ms",
          flush=True)

    def run(name, fn, check=False):
        # SlopeMeter step contract: step(variables, base, scale) — the
        # per-step scale multiplies the flow so no two scan steps are
        # identical (defeats remote result caching) without changing the
        # kernel's work (|flow| stays < 2.6 << D+R window).
        try:
            if check:
                out = np.asarray(fn((fx, fy, scale), feat, 1.0), np.float32)
                err = float(np.max(np.abs(out - ref)))
            else:
                err = float("nan")
            m = SlopeMeter(fn, (fx, fy, scale), feat, verbose=False).compile()
            t = min(m.draw() for _ in range(3))
            print(f"  {name:12s} {t * 1e3:8.3f} ms/call"
                  + (f"  max|err| {err:.4f}" if check else ""), flush=True)
            return t
        except Exception as e:
            print(f"  {name:12s} FAILED: {type(e).__name__}: {e}", flush=True)
            return None

    # ct=256 first: the dbuf/ck variants' extra VMEM (double window + the
    # (R*W, WIN*W) ck LHS) blows the 16 MB scoped-vmem stack at ct=512
    # (measured: 17.6M > 16M); combos are also selectable via argv.
    combos = ((8, 256), (8, 512), (4, 256))
    if len(sys.argv) > 1:
        combos = tuple(
            tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]
        )
    for R, ct in combos:
        print(f"== R={R} ct={ct} ==", flush=True)
        base = dict(D=D, R=R, ct=ct)
        run("shipped", lambda v, b, s: warp_onehot_fwd(
            b, jnp.stack([v[0] * s, v[1] * s], -1), scale=v[2], max_disp=D,
            row_block=R, channel_tile=ct), check=True)
        run("full", lambda v, b, s: probe_call(b, v[0] * s, v[1] * s, v[2],
                                               **base), check=True)
        run("nobuild", lambda v, b, s: probe_call(b, v[0] * s, v[1] * s, v[2],
                                                  build=False, **base))
        run("nodma", lambda v, b, s: probe_call(b, v[0] * s, v[1] * s, v[2],
                                                dma=False, **base))
        run("nodot", lambda v, b, s: probe_call(b, v[0] * s, v[1] * s, v[2],
                                                dot=False, **base))
        run("dotonly", lambda v, b, s: probe_call(b, v[0] * s, v[1] * s, v[2],
                                                  build=False, dma=False,
                                                  **base))
        run("dbuf", lambda v, b, s: probe_call(b, v[0] * s, v[1] * s, v[2],
                                               dbuf=True, **base), check=True)
        run("ck", lambda v, b, s: probe_call(b, v[0] * s, v[1] * s, v[2],
                                             ck=True, **base), check=True)
        run("ck+dbuf", lambda v, b, s: probe_call(b, v[0] * s, v[1] * s, v[2],
                                                  ck=True, dbuf=True, **base),
            check=True)


if __name__ == "__main__":
    main()
