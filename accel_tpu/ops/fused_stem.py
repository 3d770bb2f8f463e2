"""Fused ResNet stem: conv 7x7/2 (C=3) + folded-BN affine + relu in one
Pallas kernel over a dense-lane input layout.

Why (r5 per-layer roofline, BASELINE.md): the stem runs at 1.6-5.6% of its
MXU bound at every scale — the worst layer in all three branches — because
XLA stores NHWC images with the 3-channel minor dim lane-padded to 128
(43x read amplification) and lowers the 7x7/2 small-C conv poorly. Both
graph-level rewrites (s2d stem, fold_update_downscale) measured as
in-program losses, leaving a hand-written fused stem as the only
remaining lever.

Design (one kernel instance per (batch, stem-row-block)):

1. The host side re-lays the image ONCE as ``prep (N, Hpad, 8, W/2)``
   where ``prep[n, h, par*3+c, x] = image[n, h-3, 2x+par, c]`` (3 zero
   rows of halo top/bottom) — pixel-pair-major, so the lane dimension is
   W/2 (dense, 128-aligned at every shape this repo serves) and the
   7-tap stride-2 x-window becomes 4 STATIC lane shifts of (8, W/2) rows.
2. The kernel DMAs its (2R+5, 8, W/2) input window from HBM (the
   overlap-window pattern of ops/warp_onehot.py), assembles a
   (224, W/2) patch per stem row (7 ky-taps x 4 shifts x 8 sublane-padded
   pair-channel rows; dead rows carry zero weights), and runs ONE matmul
   (64, 224) @ (224, W/2) per stem row — the whole conv as dense matmul.
3. The folded FrozenBN affine (inv, shift) and relu apply in f32 in the
   epilogue; rows transpose to NHWC on write. The 3x3/2 maxpool stays in
   XLA (bandwidth-trivial on the 64-ch half-res map, and zero-padding is
   max-safe post-relu).

Forward = kernel; backward = exact VJP of the XLA oracle (same pattern
as ops/warp_onehot.py — serving-path formulation, gradients ride the
oracle). Reference counterpart: the conv1+bn+relu prologue of the MSRA
ResNet symbol (SURVEY.md §2 "DeepLab symbol"); this fusion has no
reference equivalent (cuDNN handled it there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# stem geometry (fixed by the architecture)
_KH = 7          # kernel height
_CO = 64         # output channels
_KROWS = 224     # 7 ky * 4 shifts * 8 pair-channel rows (6 live: par*3+c;
                 # rows 6-7 of each group pad the sublane dim to Mosaic's
                 # 8-alignment — real lowering rejects 6-sublane HBM slices)


def pack_stem_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(7, 7, 3, 64) conv kernel -> (64, 224) matmul LHS.

    Row index for tap (ky, kx, c): pixel offset kx-3 = 2*dx + par with
    dx in {-2..1}, par in {0,1}; k = ky*32 + (dx+2)*8 + par*3 + c.
    Unused (ky, dx, par) combinations and the two sublane-pad rows of
    each 8-row group stay zero.
    """
    k = jnp.zeros((_KROWS, _CO), kernel.dtype)
    for ky in range(7):
        for kx in range(7):
            off = kx - 3
            dx = off >> 1          # floor division toward -inf
            par = off - 2 * dx     # 0 or 1
            row = ky * 32 + (dx + 2) * 8 + par * 3
            k = k.at[row: row + 3].set(kernel[ky, kx])
    return k.T  # (64, 224)


def prep_image(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 3) -> (N, H+6, 8, W//2) pixel-pair-major (sublane-padded
    to 8) with 3-row zero halo top and bottom (the conv's row padding)."""
    N, H, W, C = x.shape
    assert C == 3 and W % 2 == 0
    p = x.reshape(N, H, W // 2, 2, 3).transpose(0, 1, 3, 4, 2)
    p = p.reshape(N, H, 6, W // 2)
    # sublane dim padded 6 -> 8 (Mosaic HBM slices need 8-aligned
    # second-minor dims) + the 3-row y halo
    return jnp.pad(p, ((0, 0), (3, 3), (0, 2), (0, 0)))


def _kernel(prep_ref, w_ref, aff_ref, out_ref, patch_ref, win_ref, sem,
            *, R: int, W2: int, H2: int):
    f32 = jnp.float32
    n = pl.program_id(0)
    b = pl.program_id(1)

    # window: stem rows s0..s0+R-1 read padded input rows
    # [2*s0, 2*(s0+R-1)+6] -> 2R+5 rows starting at 2*R*b
    WIN = 2 * R + 5
    pltpu.make_async_copy(
        prep_ref.at[n, pl.ds(2 * R * b, WIN)], win_ref, sem).start()
    pltpu.make_async_copy(
        prep_ref.at[n, pl.ds(2 * R * b, WIN)], win_ref, sem).wait()

    inv = aff_ref[0]     # (64,) f32
    shift = aff_ref[1]

    for il in range(R):
        # patch rows (ky, dx, c6): shifted copies of the 7 input rows
        for ky in range(_KH):
            row = win_ref[2 * il + ky]              # (8, W2)
            for di, dx in enumerate((-2, -1, 0, 1)):
                if dx < 0:
                    shifted = jnp.pad(
                        row, ((0, 0), (-dx, 0)))[:, :W2]
                elif dx > 0:
                    shifted = jnp.pad(
                        row, ((0, 0), (0, dx)))[:, dx:]
                else:
                    shifted = row
                patch_ref[ky * 32 + di * 8: ky * 32 + di * 8 + 8, :] = shifted
        o = jax.lax.dot(
            w_ref[...], patch_ref[...],
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT,
        )                                            # (64, W2)
        o = jnp.maximum(o * inv[:, None] + shift[:, None], 0.0)
        out_ref[0, il] = jnp.transpose(o).astype(out_ref.dtype)  # (W2, 64)


def _pick_row_block(W2: int) -> int:
    """Largest stem-row block fitting the ~16 MB scoped-vmem budget
    (measured sweep, tools/probe_fused_stem.py: R=16 at W2=1024 and R=32
    at W2=512 dominate R=8 by 16-19%; R=32 at W2=1024 exceeds scoped
    vmem — 17.5M > 16M)."""
    return 32 if W2 <= 512 else 16


@functools.partial(jax.jit, static_argnums=(3, 4))
def _fused_stem(prep, wmat, aff, row_block: int, interpret: bool):
    N, Hpad, _, W2 = prep.shape  # sublane dim is 8
    H2 = (Hpad - 6) // 2                     # stem output rows
    R = row_block
    HB = -(-H2 // R)
    # pad prep rows so the last block's window stays in range:
    # last window end = 2*R*(HB-1) + 2R+5 = 2*R*HB + 5
    need = 2 * R * HB + 5
    if need > Hpad:
        prep = jnp.pad(prep, ((0, 0), (0, need - Hpad), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, R=R, W2=W2, H2=H2),
        out_shape=jax.ShapeDtypeStruct((N, HB * R, W2, _CO), prep.dtype),
        grid=(N, HB),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # prep: HBM, windowed DMA
            pl.BlockSpec((_CO, _KROWS), lambda n, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _CO), lambda n, b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, W2, _CO), lambda n, b: (n, b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_KROWS, W2), wmat.dtype),       # patch
            pltpu.VMEM((2 * R + 5, 8, W2), prep.dtype),  # input window
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(prep, wmat, aff)
    return out[:, :H2]


def fused_stem_fwd(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    inv: jnp.ndarray,
    shift: jnp.ndarray,
    row_block: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """x (N,H,W,3), kernel (7,7,3,64), inv/shift (64,) ->
    relu(conv7x7/2(x) * inv + shift) as (N, H//2, W//2, 64) bf16."""
    from accel_tpu.ops.warp_pallas import _effective_platform

    if interpret is None:
        interpret = _effective_platform() != "tpu"
    assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
    # native dtype end to end: bf16 on the serving path (x arrives as the
    # model dtype), f32 in CPU exactness tests
    prep = prep_image(x)
    wmat = pack_stem_kernel(kernel.astype(x.dtype))
    aff = jnp.stack([inv, shift]).astype(jnp.float32)
    if row_block is None:
        row_block = _pick_row_block(prep.shape[-1])
    return _fused_stem(prep, wmat, aff, int(row_block), bool(interpret))


def _oracle(x, kernel, inv, shift):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), kernel.astype(jnp.float32),
        window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y * inv[None, None, None, :] + shift[None, None, None, :]
    return jnp.maximum(y, 0.0).astype(x.dtype)


@jax.custom_vjp
def fused_stem(x, kernel, inv, shift):
    """Differentiable fused stem: forward = Pallas kernel, backward =
    exact VJP of the XLA oracle (ops/warp_onehot.py pattern)."""
    return fused_stem_fwd(x, kernel, inv, shift)


def _fwd_rule(x, kernel, inv, shift):
    return fused_stem_fwd(x, kernel, inv, shift), (x, kernel, inv, shift)


def _bwd_rule(res, g):
    x, kernel, inv, shift = res
    _, vjp = jax.vjp(_oracle, x, kernel, inv, shift)
    return vjp(g)


fused_stem.defvjp(_fwd_rule, _bwd_rule)
