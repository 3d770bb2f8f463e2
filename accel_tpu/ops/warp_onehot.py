"""One-hot-matmul Pallas warp for WIDE-channel feature maps (DFF's 1024-ch
fc6 propagation — SURVEY.md §2a item 1's hot op at its widest).

Round-3 profiling (BASELINE.md per-stage roofline table) measured the XLA
gather warp at 9-12% of its HBM roofline on the DFF shape (16.2 ms/call for
16 frames of (64,128,1024) vs a 2.0 ms byte bound) — per-pixel gathers
amplify reads 4x and defeat XLA's layout pipelining. The masked-roll kernel
(warp_pallas.py) is worse still at wide C (its work scales with the
displacement bound PER CHANNEL TILE).

This kernel reformulates bilinear warp as what the MXU actually likes: a
row-windowed **one-hot sparse matmul**,

    out[o, :] = sum_taps w_tap(o) * feat[src_tap(o), :]
              = (M @ feat_window)[o, :],   M[o, s] = sum_taps w_tap(o)*[s == src_tap(o)]

where o ranges over a block of R output rows (R*W pixels) and s over a
window of WIN = R + 2*D + 2 source rows (D = static bound on |flow_y|;
flow_x is UNBOUNDED — the window spans full rows). M has 4 nonzeros per
row; built on the VPU once per (frame, row-block) via iota equalities and
reused across all channel tiles, the matmul then runs dense on the MXU:
~30 GFLOP/frame on the DFF shape = ~0.2 ms/frame at bf16 peak, vs ~1.0
ms/frame for the gather.

The DFF scale-field modulation (an extra (N,H,W,C)-sized HBM round trip as
a separate op — VERDICT r2 #1's named fusion target) folds into the matmul
epilogue: pass ``scale`` and the kernel multiplies before the single output
write, so the unmodulated warped tensor never exists in HBM.

Numerics: tap weights are stored in ``weights_dtype`` (default bf16 — the
MXU-rate serving path; relative weight error ~2^-8). ``weights_dtype=f32``
is exact vs the gather oracle (bit-level up to f32 accumulation order) at
reduced MXU rate. Zero-padding outside the image, matching the reference
BilinearSampler (ops/warp.py module docstring).

Layout: channels-LAST (C in lanes) — the opposite of the roll kernel's
choice, because here C is the matmul's N dimension; wide C is exactly when
this kernel is dispatched (warp.py picks it for C > 64 when
``warp_gather='onehot'``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_row_block(H: int, W: int, D: int) -> int:
    """Largest R (power of two, <= 8) keeping the M scratch under ~8 MB.

    Bigger R amortizes the window halo (WIN/R read amplification on the
    DMA-staged source rows), so prefer the largest R the scratch budget
    allows."""
    for r in (8, 4, 2, 1):
        win = min(r + 2 * D + 2, H)  # window clamps to the whole plane
        if win * r * W * W * 2 <= 8 * 2**20:
            return r
    return 1


def _kernel(fx_ref, fy_ref, feat_ref, scale_ref, out_ref, m_ref, fw_ref,
            sem, *, D: int, H: int, W: int, R: int, WIN: int, CT: int,
            fused_scale: bool):
    f32 = jnp.float32
    n = pl.program_id(0)
    r = pl.program_id(1)
    c = pl.program_id(2)
    start = jnp.clip(r * R - (D + 1), 0, feat_ref.shape[1] - WIN)

    # feat stays in HBM (ANY); DMA exactly the WIN-row window this block
    # reads. A (1,Hp,Wp,ct) VMEM block spec would be re-fetched on every
    # grid step (c is innermost): Hp/WIN x more HBM traffic than needed —
    # 4 GB vs 0.6 GB on the DFF bench shape. The copy overlaps the M build.
    dma = pltpu.make_async_copy(
        feat_ref.at[n, pl.ds(start, WIN), :, pl.ds(c * CT, CT)],
        fw_ref, sem)
    dma.start()

    @pl.when(c == 0)
    def _build_m():
        fx = fx_ref[0, 0].astype(f32)            # (R, W)
        fy = jnp.clip(fy_ref[0, 0].astype(f32), -D, D)
        yy = (r * R + jax.lax.broadcasted_iota(jnp.int32, (R, W), 0))
        xx = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        sy = yy.astype(f32) + fy
        sx = xx.astype(f32) + fx
        y0 = jnp.floor(sy)
        x0 = jnp.floor(sx)
        wy = sy - y0
        wx = sx - x0
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)

        # column one-hot (shared by both y taps): (R, W_out, W_src).
        # Minor-dim inserts ([..., None]) only on 32-bit arrays — Mosaic
        # rejects non-no-op minor-dim insertion on i1 vectors, so validity
        # masks fold into the f32 weights BEFORE broadcasting.
        sc = jax.lax.broadcasted_iota(jnp.int32, (R, W, W), 2)
        vx0 = (x0i >= 0) & (x0i < W)
        vx1 = (x0i + 1 >= 0) & (x0i + 1 < W)
        w0 = ((1.0 - wx) * vx0.astype(f32))[..., None]
        w1 = (wx * vx1.astype(f32))[..., None]
        colvec = (
            jnp.where(sc == x0i[..., None], w0, 0.0)
            + jnp.where(sc == (x0i + 1)[..., None], w1, 0.0)
        )

        y0r = y0i - start                        # window-relative row taps
        y1r = y0i + 1 - start
        vy0 = (y0i >= 0) & (y0i < H)
        vy1 = (y0i + 1 >= 0) & (y0i + 1 < H)
        for sr in range(WIN):
            rowc = (
                jnp.where((y0r == sr) & vy0, 1.0 - wy, 0.0)
                + jnp.where((y1r == sr) & vy1, wy, 0.0)
            )
            m_ref[sr] = (rowc[..., None] * colvec).reshape(R * W, W).astype(
                m_ref.dtype
            )

    dma.wait()

    # f32 weights demand HIGHEST precision: TPU DEFAULT truncates f32
    # matmul operands to bf16 on the MXU, silently degrading the
    # "oracle-exact" path to bf16 taps (measured: identical outputs for
    # f32/bf16 wdtype before this). bf16 weights take the native pass.
    prec = (jax.lax.Precision.HIGHEST if m_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    acc = jnp.zeros((R * W, out_ref.shape[-1]), f32)
    for sr in range(WIN):
        acc += jax.lax.dot(
            m_ref[sr], fw_ref[sr].astype(m_ref.dtype),
            preferred_element_type=f32, precision=prec,
        )
    out = acc.reshape(R, W, out_ref.shape[-1])
    if fused_scale:
        out = out * scale_ref[0].astype(f32)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _warp_onehot(feat, fx, fy, scale, D: int, R: int, wdtype_name: str,
                 interpret: bool):
    N, H, W, C = feat.shape
    wdtype = jnp.dtype(wdtype_name)
    Wp = _round_up(W, 128)
    Hp = _round_up(H, R)
    ct = min(128, _round_up(C, 128))
    Cp = _round_up(C, ct)
    # Window clamps to the whole (padded) plane when the displacement bound
    # exceeds it — small feature maps / composed-mode widened bounds. All
    # valid row taps live in [0, H) ⊆ [0, Hp), so a whole-plane window
    # (start pinned to 0 by the clip below) stays exact.
    WIN = min(R + 2 * D + 2, Hp)
    feat_p = jnp.pad(feat, ((0, 0), (0, Hp - H), (0, Wp - W), (0, Cp - C)))
    # Flow planes are staged as (N, Hp//R, R, Wp) so each grid step's block
    # covers the whole trailing (R, Wp) dims — TPU lowering requires block
    # trailing dims divisible by (8, 128) OR equal to the array dims, and
    # R can legitimately be < 8 (scratch-budget-limited at wide C).
    fx_p = jnp.pad(fx, ((0, 0), (0, Hp - H), (0, Wp - W))).reshape(
        N, Hp // R, R, Wp)
    fy_p = jnp.pad(fy, ((0, 0), (0, Hp - H), (0, Wp - W))).reshape(
        N, Hp // R, R, Wp)
    fused = scale is not None
    if fused:
        scale_p = jnp.pad(
            scale, ((0, 0), (0, Hp - H), (0, Wp - W), (0, Cp - C)))
        scale_spec = pl.BlockSpec((1, R, Wp, ct), lambda n, r, c: (n, r, 0, c),
                                  memory_space=pltpu.VMEM)
    else:
        # single constant dummy block (index map pinned to it -> fetched
        # once, never read by the kernel)
        scale_p = jnp.zeros((1, R, Wp, ct), feat.dtype)
        scale_spec = pl.BlockSpec((1, R, Wp, ct), lambda n, r, c: (0, 0, 0, 0),
                                  memory_space=pltpu.VMEM)

    grid = (N, Hp // R, Cp // ct)
    out = pl.pallas_call(
        functools.partial(_kernel, D=D, H=H, W=Wp, R=R, WIN=WIN, CT=ct,
                          fused_scale=fused),
        out_shape=jax.ShapeDtypeStruct((N, Hp, Wp, Cp), feat.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, R, Wp), lambda n, r, c: (n, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R, Wp), lambda n, r, c: (n, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # feat: HBM, windowed DMA
            scale_spec,
        ],
        out_specs=pl.BlockSpec((1, R, Wp, ct), lambda n, r, c: (n, r, 0, c),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((WIN, R * Wp, Wp), wdtype),
            pltpu.VMEM((WIN, Wp, ct), feat.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(fx_p, fy_p, feat_p, scale_p)
    return out[:, :H, :W, :C]


def warp_onehot_fwd(
    feat: jnp.ndarray,
    flow: jnp.ndarray,
    scale: jnp.ndarray | None = None,
    max_disp: int = 4,
    row_block: int | None = None,
    weights_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """feat (N,H,W,C), flow (N,H,W,2) [+ scale (N,H,W,C)] -> warped [*scale].

    Exact bilinear for |flow_y| <= max_disp (flow_y clamps to the bound;
    flow_x is unbounded), up to ``weights_dtype`` rounding of the tap
    weights (bf16 default; pass jnp.float32 for oracle-exact weights).
    """
    from accel_tpu.ops.warp_pallas import _effective_platform

    if interpret is None:
        interpret = _effective_platform() != "tpu"
    N, H, W, C = feat.shape
    D = int(max_disp)
    R = row_block or _pick_row_block(_round_up(H, 8), _round_up(W, 128), D)
    fx = flow[..., 0].astype(jnp.float32)
    fy = flow[..., 1].astype(jnp.float32)
    return _warp_onehot(feat, fx, fy, scale, D, int(R),
                        jnp.dtype(weights_dtype).name, bool(interpret))


def _oracle(feat, flow, scale):
    from accel_tpu.ops.warp import bilinear_warp_xla

    out = bilinear_warp_xla(feat, flow)
    return out if scale is None else out * scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def warp_onehot(feat, flow, scale=None, max_disp: int = 4):
    """Differentiable one-hot-matmul warp (+ fused scale modulation).

    Forward = the Pallas kernel; backward = exact VJP of the gather oracle
    (same pattern as warp_pallas — the kernel is a serving/inference-path
    formulation, gradients ride the oracle).
    """
    return warp_onehot_fwd(feat, flow, scale, max_disp)


def _fwd_rule(feat, flow, scale, max_disp):
    return warp_onehot_fwd(feat, flow, scale, max_disp), (feat, flow, scale)


def _bwd_rule(max_disp, res, g):
    feat, flow, scale = res
    if scale is None:
        _, vjp = jax.vjp(lambda f, fl: _oracle(f, fl, None), feat, flow)
        return (*vjp(g), None)
    _, vjp = jax.vjp(_oracle, feat, flow, scale)
    return vjp(g)


warp_onehot.defvjp(_fwd_rule, _bwd_rule)
