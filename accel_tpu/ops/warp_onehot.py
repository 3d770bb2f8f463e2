"""One-hot-matmul Pallas warp for WIDE-channel feature maps (DFF's 1024-ch
fc6 propagation — SURVEY.md §2a item 1's hot op at its widest).

Round-3 profiling (BASELINE.md per-stage roofline table) measured the XLA
gather warp at 9-12% of its HBM roofline on the DFF shape (16.2 ms/call for
16 frames of (64,128,1024) vs a 2.0 ms byte bound) — per-pixel gathers
amplify reads 4x and defeat XLA's layout pipelining. The masked-roll kernel
(warp_pallas.py) is worse still at wide C (its work scales with the
displacement bound PER CHANNEL TILE).

This kernel reformulates bilinear warp as what the MXU actually likes:
row-windowed **one-hot matmuls**. The bilinear weight of output pixel
(i, j) for source tap (y, x) is rank-1 separable per pixel,

    w[(i,j), (y,x)] = ry[y - i](i, j) * cx[x](i, j),

so with flow_y clamped to |fy| <= D the integer row offset d = y - i takes
only the 2D+2 values in [-D, D+1], and

    out[i, j, :] = sum_d ry_d[i, j] * (cx[i, j, :] @ feat[i + d, :, :]).

Per output row the x mix ``cx[i] @ feat_row`` is a dense (W, W) @ (W, ct)
MXU matmul whose one-hot LHS (``colvec``, 2 nonzeros per row — flow_x is
UNBOUNDED, the matmul spans full rows) is built ONCE per (frame,
row-block) on the VPU and reused across all 2D+2 row offsets AND all
channel tiles; the y mix is a cheap f32 VPU epilogue (so y-tap weights are
exact even in the bf16-weights mode — only x weights round). Matmul work
is (2D+2) * 2*W*W*C FLOPs per output row — ~39 GFLOP/frame on the DFF
bench shape at D=8 (~24 at D=4), vs the ~57 GFLOP and a WIN x (R*W, W)
dense M-scratch build of the round-3 first formulation, and vs the gather
unit's measured ~18 ms for the same 16-frame call.

The DFF scale-field modulation (an extra (N,H,W,C)-sized HBM round trip as
a separate op — VERDICT r2 #1's named fusion target) folds into the
epilogue: pass ``scale`` and the kernel multiplies before the single
output write, so the unmodulated warped tensor never exists in HBM.

Out-of-image taps are handled by halo ZERO-PADDING (D rows top/bottom,
lane padding right): every reachable tap lands inside the padded plane
and reads 0 — exactly the reference BilinearSampler's zero-pad semantics
(ops/warp.py module docstring) with no validity masks and no window
clamps (the round-3 first formulation's small-plane assert is gone).

Numerics: x-tap weights are stored in ``weights_dtype`` (default bf16 —
the MXU-rate serving path; relative weight error ~2^-8; y weights stay
f32). ``weights_dtype=f32`` is exact vs the gather oracle (bit-level up
to f32 accumulation order) at reduced MXU rate; it demands
Precision.HIGHEST because TPU DEFAULT truncates f32 matmul operands to
bf16 on the MXU (measured round 3: identical f32/bf16 outputs before the
precision fix).

Layout: channels-LAST (C in lanes) — the opposite of the roll kernel's
choice, because here C is the matmul's N dimension; wide C is exactly
when this kernel is dispatched (warp.py picks it for C > 64 when
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


def _pick_row_block(Wp: int, D: int, ct: int, fbytes: int,
                    wbytes: int) -> int:
    """Largest R (power of two, <= 8) keeping VMEM scratch under ~10 MB.

    R does not change matmul FLOPs (those scale with 2D+2); bigger R
    amortizes the DMA halo ((R + 2D + 1)/R read amplification on the
    staged source window) and the per-row-block colvec build."""
    for r in (8, 4, 2, 1):
        win = r + 2 * D + 1
        scr = (r * Wp * Wp * wbytes          # colvec
               + win * Wp * ct * fbytes      # source window
               + (2 * D + 2) * r * Wp * 4)   # ry
        if scr <= 10 * 2**20:
            return r
    return 1


def _kernel(fx_ref, fy_ref, feat_ref, scale_ref, out_ref, colvec_ref,
            ry_ref, fw_ref, sem, *, D: int, W: int, R: int, WIN: int,
            CT: int, fused_scale: bool):
    f32 = jnp.float32
    n = pl.program_id(0)
    r = pl.program_id(1)
    c = pl.program_id(2)

    # feat stays in HBM (ANY); DMA exactly the WIN-row halo window this
    # block reads (start = r*R in halo-padded coords — no clamp needed).
    # A blockspec-fetched (1,Hp,Wp,ct) would re-fetch the whole plane per
    # channel tile. The copy overlaps the colvec/ry build at c == 0.
    dma = pltpu.make_async_copy(
        feat_ref.at[n, pl.ds(r * R, WIN), :, pl.ds(c * CT, CT)],
        fw_ref, sem)
    dma.start()

    @pl.when(c == 0)
    def _build_weights():
        # --- x one-hot weights, shared by every row offset and channel
        # tile: colvec[i, j, x] = (1-wx)[x == x0] + wx[x == x0+1].
        # Out-of-range x0 simply never matches (left) or hits zero-padded
        # lanes (right) — no validity masks. Minor-dim inserts
        # ([..., None]) only on 32-bit arrays — Mosaic rejects non-no-op
        # minor-dim insertion on i1 vectors, so weights broadcast as f32.
        fx = fx_ref[0, 0].astype(f32)                       # (R, W)
        xx = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        sx = xx.astype(f32) + fx
        x0 = jnp.floor(sx)
        wx = sx - x0
        x0i = x0.astype(jnp.int32)
        sc = jax.lax.broadcasted_iota(jnp.int32, (R, W, W), 2)
        colvec_ref[...] = (
            jnp.where(sc == x0i[..., None], (1.0 - wx)[..., None], 0.0)
            + jnp.where(sc == (x0i + 1)[..., None], wx[..., None], 0.0)
        ).astype(colvec_ref.dtype)

        # --- y weights per integer row offset d = y_tap - i in
        # [-D, D+1]: ry[d+D] = (1-wy)[y0-i == d] + wy[y0+1-i == d].
        # Kept f32 (VPU epilogue — exact y taps in every weights mode).
        fy = jnp.clip(fy_ref[0, 0].astype(f32), -D, D)
        yy = (r * R + jax.lax.broadcasted_iota(jnp.int32, (R, W), 0))
        sy = yy.astype(f32) + fy
        y0 = jnp.floor(sy)
        wy = sy - y0
        dy = y0.astype(jnp.int32) - yy                       # in [-D, D]
        for di in range(2 * D + 2):
            d = di - D
            ry_ref[di] = (
                jnp.where(dy == d, 1.0 - wy, 0.0)
                + jnp.where(dy + 1 == d, wy, 0.0)
            )

    dma.wait()

    # f32 weights demand HIGHEST precision: TPU DEFAULT truncates f32
    # matmul operands to bf16 on the MXU, silently degrading the
    # "oracle-exact" path to bf16 x-taps. bf16 weights take the native
    # MXU pass.
    wdtype = colvec_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if wdtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    rows = [fw_ref[s].astype(wdtype) for s in range(WIN)]
    accs = [jnp.zeros((W, CT), f32) for _ in range(R)]
    for di in range(2 * D + 2):
        ryd = ry_ref[di][..., None]                          # (R, W, 1)
        for il in range(R):
            # window row il + di is halo-padded row r*R + il + di,
            # i.e. source row (r*R + il) + (di - D) = i + d.
            part = jax.lax.dot(colvec_ref[il], rows[il + di],
                               preferred_element_type=f32, precision=prec)
            accs[il] = accs[il] + ryd[il] * part
    for il in range(R):
        o = accs[il]
        if fused_scale:
            o = o * scale_ref[0, il].astype(f32)
        out_ref[0, il] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _warp_onehot(feat, fx, fy, scale, D: int, R: int, wdtype_name: str,
                 interpret: bool):
    N, H, W, C = feat.shape
    wdtype = jnp.dtype(wdtype_name)
    Wp = _round_up(W, 128)
    HB = -(-H // R)
    Hp = HB * R
    ct = min(128, _round_up(C, 128))
    Cp = _round_up(C, ct)
    # Halo zero-padding: D rows on top, (Hp - H) + D + 1 below, so block
    # r's window starts at padded row r*R unconditionally and every
    # reachable tap (rows [i-D, i+D+1], any x) reads in-plane (0 outside
    # the image — reference zero-pad semantics).
    WIN = R + 2 * D + 1
    feat_p = jnp.pad(feat, ((0, 0), (D, Hp - H + D + 1), (0, Wp - W),
                            (0, Cp - C)))
    # Flow planes are staged as (N, Hp//R, R, Wp) so each grid step's block
    # covers the whole trailing (R, Wp) dims — TPU lowering requires block
    # trailing dims divisible by (8, 128) OR equal to the array dims, and
    # R can legitimately be < 8 (scratch-budget-limited at wide C).
    fx_p = jnp.pad(fx, ((0, 0), (0, Hp - H), (0, Wp - W))).reshape(
        N, HB, R, Wp)
    fy_p = jnp.pad(fy, ((0, 0), (0, Hp - H), (0, Wp - W))).reshape(
        N, HB, R, Wp)
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

    grid = (N, HB, Cp // ct)
    out = pl.pallas_call(
        functools.partial(_kernel, D=D, W=Wp, R=R, WIN=WIN, CT=ct,
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
            pltpu.VMEM((R, Wp, Wp), wdtype),           # colvec (x weights)
            pltpu.VMEM((2 * D + 2, R, Wp), jnp.float32),  # ry (y weights)
            pltpu.VMEM((WIN, Wp, ct), feat.dtype),     # source window
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
    flow_x is unbounded), up to ``weights_dtype`` rounding of the x-tap
    weights (bf16 default; pass jnp.float32 for oracle-exact weights —
    y-tap weights are f32 in every mode).
    """
    from accel_tpu.ops.warp_pallas import _effective_platform

    if interpret is None:
        interpret = _effective_platform() != "tpu"
    N, H, W, C = feat.shape
    D = int(max_disp)
    wdtype = jnp.dtype(weights_dtype)
    ct = min(128, _round_up(C, 128))
    R = row_block or _pick_row_block(
        _round_up(W, 128), D, ct, feat.dtype.itemsize, wdtype.itemsize)
    fx = flow[..., 0].astype(jnp.float32)
    fy = flow[..., 1].astype(jnp.float32)
    return _warp_onehot(feat, fx, fy, scale, D, int(R), wdtype.name,
                        bool(interpret))


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
