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

Per output row i the full bilinear mix is ONE deep matmul,

    out[i] = lhs[i] @ feat[i-D : i+D+2]          # (W, KD) @ (KD, ct)

with KD = (2D+2)*W and lhs[i][j, d*W + x] = ry_d[i, j] * cx[x](i, j) —
the rank-1 weight products written into a banded LHS whose RHS is just a
contiguous slice of the staged source window (no gather, no scatter).
The LHS (2 nonzeros per W-column-group; flow_x is UNBOUNDED, each matmul
spans full rows) is built ONCE per (frame, row-block) on the VPU and
reused across all channel tiles. Matmul work is (2D+2) * 2*W*W*C FLOPs
per output row — ~24 GFLOP/frame on the DFF bench shape at D=4.

Two measured lessons from the earlier formulations shape this one
(BASELINE.md r3 one-hot history): (a) FLOPs must scale with 2D+2, not
the R+2D+2 window (the dense-M first formulation lost to the gather);
(b) output-tile shape decides the MXU rate — the (2D+2)-separate-dots
variant ran at 25 TF/s because every dot had a single (128,128) output
tile, engaging one MXU; the deep-K single dot with a WIDE channel tile
(ct up to 512 -> 4 lane tiles) gives the TensorCore parallel output
tiles and K=KD pipelining.

The DFF scale-field modulation (an extra (N,H,W,C)-sized HBM round trip as
a separate op — VERDICT r2 #1's named fusion target) folds into the
epilogue: pass ``scale`` and the kernel multiplies before the single
output write, so the unmodulated warped tensor never exists in HBM.

Out-of-image taps are handled by halo ZERO-PADDING (D rows top/bottom,
lane padding right): every reachable tap lands inside the padded plane
and reads 0 — exactly the reference BilinearSampler's zero-pad semantics
(ops/warp.py module docstring) with no validity masks and no window
clamps (the round-3 first formulation's small-plane assert is gone).

Numerics: the combined tap weight ry*cx is computed in f32 and rounded
ONCE to ``weights_dtype`` when written into the LHS (default bf16 — the
MXU-rate serving path; relative weight error ~2^-8, single rounding of
the product rather than per-factor). ``weights_dtype=f32`` is exact vs
the gather oracle (bit-level up to f32 accumulation order) at reduced
MXU rate; it demands Precision.HIGHEST because TPU DEFAULT truncates f32
matmul operands to bf16 on the MXU (measured round 3: identical f32/bf16
outputs before the precision fix).

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


def _pick_ct(C: int, D: int, Wp: int, fbytes: int, wbytes: int) -> int:
    """Widest channel tile (<= 512, multiple of 128) under the VMEM budget.

    ct is the matmul N dimension: at ct=128 every dot has ONE (128,128)
    output tile and engages one MXU (measured 25 TF/s); wider ct gives
    the TensorCore parallel output tiles. Budget: lhs + colvec scratch
    (ct-independent) + source window + double-buffered out/scale blocks."""
    base = 8 * Wp * ((2 * D + 2) * Wp * wbytes + Wp * 4)
    for ct in (512, 256, 128):
        win = 8 + 2 * D + 1
        scr = base + 2 * win * Wp * ct * fbytes  # 2-slot window (dbuf)
        bufs = 4 * 8 * Wp * ct * fbytes          # 2x (out + scale) blocks
        if scr + bufs <= 12 * 2**20 and ct <= _round_up(C, 128):
            return ct
    return 128


def _pick_row_block(Wp: int, D: int, ct: int, fbytes: int,
                    wbytes: int) -> int:
    """Largest R (power of two, <= 8) keeping VMEM scratch under ~10 MB.

    R does not change matmul FLOPs (those scale with 2D+2); bigger R
    amortizes the DMA halo ((R + 2D + 1)/R read amplification on the
    staged source window) and the per-row-block LHS build."""
    for r in (8, 4, 2, 1):
        win = r + 2 * D + 1
        scr = (r * Wp * (2 * D + 2) * Wp * wbytes  # banded LHS
               + r * Wp * Wp * 4                   # colvec (f32)
               + 2 * win * Wp * ct * fbytes)       # 2-slot source window
        if scr <= 10 * 2**20:
            return r
    return 1


def _kernel(fx_ref, fy_ref, feat_ref, scale_ref, gain_ref, out_ref, lhs_ref,
            colvec_ref, fw_ref, sem, *, D: int, W: int, R: int, WIN: int,
            CT: int, NR: int, NC: int, fused_scale: bool, has_gain: bool):
    f32 = jnp.float32
    n = pl.program_id(0)
    r = pl.program_id(1)
    c = pl.program_id(2)
    KD = (2 * D + 2) * W

    # feat stays in HBM (ANY); DMA exactly the WIN-row halo window this
    # block reads (start = r*R in halo-padded coords — no clamp needed).
    # A blockspec-fetched (1,Hp,Wp,ct) would re-fetch the whole plane per
    # channel tile.
    #
    # DOUBLE-BUFFERED (r4 — the warp roofline close): step s computes from
    # window slot s%2 while issuing step s+1's window DMA into the other
    # slot, so the copy overlaps the dots instead of serializing ahead of
    # them. Measured by ablation (tools/probe_onehot_kernel.py): the
    # serialized window DMA was ~1.0 ms of the 4.9 ms single-buffered
    # kernel on the DFF shape; double-buffering took it to 2.8 ms/call —
    # 61% of the analytic MXU bound (the dots alone measure 1.8-2.0 ms vs
    # the 1.74 ms bound, i.e. the matmuls already run at roof). Grid steps
    # are sequential on TPU, so the slot a prefetch overwrites was last
    # read two steps ago — never live.
    step = (n * NR + r) * NC + c
    nsteps = pl.num_programs(0) * NR * NC
    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _first_window():
        pltpu.make_async_copy(
            feat_ref.at[n, pl.ds(r * R, WIN), :, pl.ds(c * CT, CT)],
            fw_ref.at[0], sem.at[0]).start()

    nxt = step + 1
    cn = jax.lax.rem(nxt, NC)
    rn = jax.lax.rem(nxt // NC, NR)
    nn = nxt // (NC * NR)

    @pl.when(nxt < nsteps)
    def _prefetch_next():
        pltpu.make_async_copy(
            feat_ref.at[nn, pl.ds(rn * R, WIN), :, pl.ds(cn * CT, CT)],
            fw_ref.at[1 - slot], sem.at[1 - slot]).start()

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
        )

        # --- y weights per integer row offset d = y_tap - i in
        # [-D, D+1]: ry[d+D] = (1-wy)[y0-i == d] + wy[y0+1-i == d].
        # The rank-1 product ry*cx is formed in f32 and rounded ONCE into
        # the banded LHS at column group d (lane offset di*W).
        fy = jnp.clip(fy_ref[0, 0].astype(f32), -D, D)
        yy = (r * R + jax.lax.broadcasted_iota(jnp.int32, (R, W), 0))
        sy = yy.astype(f32) + fy
        y0 = jnp.floor(sy)
        wy = sy - y0
        dy = y0.astype(jnp.int32) - yy                       # in [-D, D]
        cv = colvec_ref[...]                                 # (R, W, W) f32
        for di in range(2 * D + 2):
            d = di - D
            ryd = (
                jnp.where(dy == d, 1.0 - wy, 0.0)
                + jnp.where(dy + 1 == d, wy, 0.0)
            )
            lhs_ref[:, :, di * W:(di + 1) * W] = (
                ryd[..., None] * cv).astype(lhs_ref.dtype)

    pltpu.make_async_copy(
        feat_ref.at[n, pl.ds(r * R, WIN), :, pl.ds(c * CT, CT)],
        fw_ref.at[slot], sem.at[slot]).wait()

    # f32 weights demand HIGHEST precision: TPU DEFAULT truncates f32
    # matmul operands to bf16 on the MXU, silently degrading the
    # "oracle-exact" path to bf16 taps. bf16 weights take the native
    # MXU pass.
    wdtype = lhs_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if wdtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    for il in range(R):
        # output row i = r*R + il mixes halo-padded window rows
        # [il, il + 2D+2) — a contiguous (KD, ct) slice of the window.
        rhs = fw_ref[slot, pl.ds(il, 2 * D + 2)].reshape(KD, CT).astype(wdtype)
        o = jax.lax.dot(lhs_ref[il], rhs,
                        preferred_element_type=f32, precision=prec)
        if fused_scale:
            s = scale_ref[0, il].astype(f32)
            if has_gain:
                # per-sample scalar gain (e.g. the mean1 normalization's
                # 1/|mean|) folded into the epilogue: the normalized scale
                # field never materializes in HBM (saves a read+write pass
                # over the full C-wide field before the pallas_call, which
                # cannot fuse producers)
                s = s * gain_ref[n, 0]
            o = o * s
        out_ref[0, il] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def _warp_onehot(feat, fx, fy, scale, gain, D: int, R: int, ct: int,
                 wdtype_name: str, interpret: bool):
    N, H, W, C = feat.shape
    wdtype = jnp.dtype(wdtype_name)
    Wp = _round_up(W, 128)
    HB = -(-H // R)
    Hp = HB * R
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

    has_gain = gain is not None
    # full-array SMEM block (Mosaic requires block == array dims for
    # non-(8,128)-divisible shapes — a (1,1) block of an (N,1) array fails
    # real lowering even though interpret mode accepts it); the kernel
    # indexes it with program_id
    if has_gain:
        gain_p = gain.astype(jnp.float32).reshape(N, 1)
    else:
        gain_p = jnp.ones((1, 1), jnp.float32)
    gain_spec = pl.BlockSpec(gain_p.shape, lambda n, r, c: (0, 0),
                             memory_space=pltpu.SMEM)

    grid = (N, HB, Cp // ct)
    out = pl.pallas_call(
        functools.partial(_kernel, D=D, W=Wp, R=R, WIN=WIN, CT=ct,
                          NR=HB, NC=Cp // ct, fused_scale=fused,
                          has_gain=has_gain),
        out_shape=jax.ShapeDtypeStruct((N, Hp, Wp, Cp), feat.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, R, Wp), lambda n, r, c: (n, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R, Wp), lambda n, r, c: (n, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # feat: HBM, windowed DMA
            scale_spec,
            gain_spec,
        ],
        out_specs=pl.BlockSpec((1, R, Wp, ct), lambda n, r, c: (n, r, 0, c),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R, Wp, (2 * D + 2) * Wp), wdtype),  # banded LHS
            pltpu.VMEM((R, Wp, Wp), jnp.float32),      # colvec (x weights)
            pltpu.VMEM((2, WIN, Wp, ct), feat.dtype),  # 2-slot source window
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(fx_p, fy_p, feat_p, scale_p, gain_p)
    return out[:, :H, :W, :C]


def warp_onehot_fwd(
    feat: jnp.ndarray,
    flow: jnp.ndarray,
    scale: jnp.ndarray | None = None,
    max_disp: int = 4,
    row_block: int | None = None,
    channel_tile: int | None = None,
    weights_dtype=jnp.bfloat16,
    interpret: bool | None = None,
    gain: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """feat (N,H,W,C), flow (N,H,W,2) [+ scale (N,H,W,C)] -> warped [*scale].

    Exact bilinear for |flow_y| <= max_disp (flow_y clamps to the bound;
    flow_x is unbounded), up to one ``weights_dtype`` rounding of the
    combined ry*cx tap weights (bf16 default; pass jnp.float32 for
    oracle-exact weights).

    ``gain`` (N,) f32, requires ``scale``: a per-sample scalar multiplied
    into the fused scale epilogue (in f32, via SMEM) — the mean1
    normalization's 1/|mean| folded into the kernel so the normalized
    field never materializes in HBM (network.warp_gain_fold).
    """
    from accel_tpu.ops.warp_pallas import _effective_platform

    if interpret is None:
        interpret = _effective_platform() != "tpu"
    N, H, W, C = feat.shape
    D = int(max_disp)
    wdtype = jnp.dtype(weights_dtype)
    Wp = _round_up(W, 128)
    ct = channel_tile or _pick_ct(C, D, Wp, feat.dtype.itemsize,
                                  wdtype.itemsize)
    R = row_block or _pick_row_block(
        Wp, D, ct, feat.dtype.itemsize, wdtype.itemsize)
    if gain is not None and scale is None:
        raise ValueError("gain requires scale (it rides the scale epilogue)")
    fx = flow[..., 0].astype(jnp.float32)
    fy = flow[..., 1].astype(jnp.float32)
    return _warp_onehot(feat, fx, fy, scale, gain, D, int(R), int(ct),
                        wdtype.name, bool(interpret))


def _oracle(feat, flow, scale, max_disp):
    from accel_tpu.ops.warp import bilinear_warp_xla

    # Clamp flow_y exactly as the kernel forward does so the custom VJP
    # differentiates the function the forward actually computes (gradients
    # would otherwise mismatch wherever |flow_y| > max_disp).
    flow = jnp.stack(
        [flow[..., 0], jnp.clip(flow[..., 1], -max_disp, max_disp)], axis=-1
    )
    out = bilinear_warp_xla(feat, flow)
    return out if scale is None else out * scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def warp_onehot(feat, flow, scale=None, max_disp: int = 4, gain=None):
    """Differentiable one-hot-matmul warp (+ fused scale modulation).

    Forward = the Pallas kernel; backward = exact VJP of the gather oracle
    (same pattern as warp_pallas — the kernel is a serving/inference-path
    formulation, gradients ride the oracle). ``gain`` (N,) f32 multiplies
    the scale epilogue per sample (see warp_onehot_fwd).
    """
    return warp_onehot_fwd(feat, flow, scale, max_disp, gain=gain)


def _gained_oracle(feat, flow, scale, gain, max_disp):
    if gain is not None:
        scale = scale * gain[:, None, None, None].astype(scale.dtype)
    return _oracle(feat, flow, scale, max_disp)


def _fwd_rule(feat, flow, scale, max_disp, gain):
    return (warp_onehot_fwd(feat, flow, scale, max_disp, gain=gain),
            (feat, flow, scale, gain))


def _bwd_rule(max_disp, res, g):
    feat, flow, scale, gain = res
    if scale is None:
        _, vjp = jax.vjp(lambda f, fl: _oracle(f, fl, None, max_disp), feat, flow)
        return (*vjp(g), None, None)
    if gain is None:
        _, vjp = jax.vjp(
            lambda f, fl, s: _oracle(f, fl, s, max_disp), feat, flow, scale)
        return (*vjp(g), None)
    _, vjp = jax.vjp(
        lambda f, fl, s, gn: _gained_oracle(f, fl, s, gn, max_disp),
        feat, flow, scale, gain)
    return vjp(g)


warp_onehot.defvjp(_fwd_rule, _bwd_rule)
