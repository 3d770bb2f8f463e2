"""Pallas TPU kernel for the DeepLab atrous (dilated) 3x3 convolutions.

Why a hand-written kernel: the direct ``rhs_dilation`` lowering of the
dilated stages (reference: ``deeplab/symbols/resnet_v1_101_deeplab.py``
dilated conv4/conv5 + atrous fc6 — SURVEY.md §2 "DeepLab symbol") runs at
65-80% of the same-FLOPs *dense* conv rate on TPU v5e (165 vs 254 TF/s at
64x128 512ch d=2 — table in ``ops/dilated.py``), and both graph-level
rewrites (space-to-batch, shift1x1 tap decomposition) failed to recover
the gap in-program because they pay materialized shifted/phase copies and
per-tap dispatches through HBM. This kernel fuses all nine taps into one
program: each grid step holds a row-block of the zero-padded input in
VMEM and issues nine MXU matmuls

    acc += X[rows + i*d, cols + j*d, :].reshape(R*W, Cin_k) @ W[i, j]

accumulating in f32 registers/VMEM — the tap shifts become VMEM-local
slices (no HBM halo traffic, no extra dispatches), and every FLOP lands
on the MXU as a dense ``(R*W, CK) x (CK, CN)`` product.

Memory layout (NHWC, lane dim = channels):

    Xp = zero-pad(lhs, d each side in H/W; rows padded up to (Hb+2)*R)
    grid = (B, Hb, Nb, Kb)           # k (input-channel chunk) innermost
    x specs: THREE views of Xp's row-blocks h, h+1, h+2 — together they
      cover the halo window [h*R, h*R + R + 2d) for any d <= R, which a
      single BlockSpec cannot express (blocks are disjoint tiles)
    w spec:  (3, 3, CK, CN) chunk of the kernel
    out:     (1, R, W, CN) block, revisited across k with an f32 scratch
             accumulator (written once, at k == Kb-1)

Exactness: identical MACs to ``lax.conv_general_dilated`` (zero 'same'
padding included), f32 accumulation like XLA's own TPU conv emitter;
oracle-tested in ``tests/test_dilated_pallas.py`` (interpret mode on CPU,
compiled on TPU). Gradients via ``jax.custom_vjp``: dx is itself an
eligible dilated conv (180deg-rotated, channel-swapped kernel) and reuses
this kernel; dw goes through the lax transpose (exact, and off the
serving path).

Selection: ``network.dilated_conv: pallas`` routes eligible convs here
(flax ``nn.Conv(conv_general_dilated=...)`` hook — parameter tree and
checkpoints unchanged). Per the module policy in ``ops/dilated.py``,
``auto`` only flips to this kernel on a measured IN-PROGRAM win (isolated
microbench wins did not transfer for two prior lowerings).

IN-PROGRAM VERDICT (TPU v5e, measured 2026-08-19, 3/3 runs each): the
kernel LOSES inside the full DeepLab-101 per-frame program at BOTH output
strides despite winning every isolated shape —
    os16 B=4 1024x2048: 43.5 vs 38.9 ms/step (direct)
    os8  B=4 1024x2048: 187.0 vs 114.1 ms/step (direct)
Mechanism: ``pallas_call`` is a fusion barrier. The direct lowering lets
XLA fold each conv's epilogue (FrozenBN scale/shift FMA, relu, residual
add) into the conv itself; routing the conv through this kernel forces
those epilogues into standalone elementwise passes, each a full HBM
read+write of the activation plane. At os8 (23 dilated conv4 blocks on
256x512 planes) that lost fusion costs far more than the halo-recovery
win the isolated sweep measured — the microbench never paid it because it
timed the bare conv. ``auto`` therefore resolves to the direct lowering
at every stride; this kernel stays an exactness-tested explicit knob. A
win would require fusing the epilogue INTO the kernel (scale/shift
vectors + residual operand as extra inputs), i.e. restructuring the
ResNet blocks around a fused conv+bn+relu op — not justified while the
direct os8 baseline already runs at 72.3% MFU. (Third occurrence of the
isolated-win-does-not-transfer failure mode; see ops/dilated.py.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lax_conv(lhs, rhs, d, precision=None):
    return lax.conv_general_dilated(
        lhs, rhs, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )


def _tiles(W, cin, cout, itemsize):
    """(R, CK, CN) VMEM tiling. Budget: 3 double-buffered input row-blocks
    + a double-buffered (3,3,CK,CN) weight chunk + f32 accumulator must sit
    well under ~16 MB of VMEM. Wider planes (os8's W=256) and wider dtypes
    (f32 on the CPU/test path) halve the channel chunks."""
    if itemsize >= 4:
        ck_cap, cn_cap = 128, 128
    else:
        ck_cap, cn_cap = 256, (256 if W <= 128 else 128)
    return 8, min(cin, ck_cap), min(cout, cn_cap)


def _kernel(x0, x1, x2, w, o, acc, *, d, R, W, Kb, CK, CN):
    k = pl.program_id(3)
    s = None
    for i in range(3):
        oi = i * d  # row offset of tap row i in the 3R halo window
        if oi == 0:
            win = x0[0]
        elif oi < R:
            win = jnp.concatenate([x0[0, oi:R], x1[0, 0:oi]], axis=0)
        elif oi == R:
            win = x1[0]
        elif oi < 2 * R:
            win = jnp.concatenate([x1[0, oi - R:R], x2[0, 0:oi - R]], axis=0)
        else:  # oi == 2R (d == R)
            win = x2[0]
        for j in range(3):
            xt = win[:, j * d:j * d + W, :].reshape(R * W, CK)
            t = jnp.dot(xt, w[i, j], preferred_element_type=jnp.float32)
            s = t if s is None else s + t
    if Kb == 1:
        o[0] = s.reshape(R, W, CN).astype(o.dtype)
    else:
        @pl.when(k == 0)
        def _():
            acc[:] = s

        @pl.when(k > 0)
        def _():
            acc[:] = acc[:] + s

        @pl.when(k == Kb - 1)
        def _():
            o[0] = acc[:].reshape(R, W, CN).astype(o.dtype)


def _conv3x3_pallas_raw(lhs, rhs, d, interpret):
    """Core forward: eligibility already checked. lhs (B,H,W,Cin) NHWC,
    rhs (3,3,Cin,Cout) HWIO, stride 1, 'same' padding d, dilation d."""
    B, H, W, Cin = lhs.shape
    Cout = rhs.shape[-1]
    out_dtype = jnp.result_type(lhs.dtype, rhs.dtype)
    R, CK, CN = _tiles(W, Cin, Cout, jnp.dtype(lhs.dtype).itemsize)
    Hb, Nb, Kb = H // R, Cout // CN, Cin // CK
    Wp = W + 2 * d

    # zero 'same' padding folded into the operand once (one fused XLA pad);
    # rows padded to (Hb+2)*R so row-blocks h+1, h+2 exist for every h
    xp = jnp.pad(lhs, ((0, 0), (d, 2 * R - d), (d, d), (0, 0)))

    x_spec = lambda i: pl.BlockSpec(
        (1, R, Wp, CK),
        functools.partial(lambda b, h, n, k, i: (b, h + i, 0, k), i=i),
        memory_space=pltpu.VMEM,
    )
    flops = 2 * B * H * W * 9 * Cin * Cout
    bytes_accessed = (
        3 * xp.size * xp.dtype.itemsize  # each row-block feeds 3 windows
        + B * Hb * rhs.size * rhs.dtype.itemsize
        + B * H * W * Cout * jnp.dtype(out_dtype).itemsize
    )
    try:
        params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "parallel", "arbitrary"),
        )
    except Exception:  # field-name drift across jax versions
        params = None
    return pl.pallas_call(
        functools.partial(_kernel, d=d, R=R, W=W, Kb=Kb, CK=CK, CN=CN),
        grid=(B, Hb, Nb, Kb),
        in_specs=[x_spec(0), x_spec(1), x_spec(2),
                  pl.BlockSpec((3, 3, CK, CN),
                               lambda b, h, n, k: (0, 0, k, n),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, W, CN),
                               lambda b, h, n, k: (b, h, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), out_dtype),
        scratch_shapes=[pltpu.VMEM((R * W, CN), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
        **({"compiler_params": params} if params is not None else {}),
    )(xp, xp, xp, rhs)


def _eligible(lhs, rhs, d):
    if lhs.ndim != 4 or rhs.ndim != 4:
        return False
    if rhs.shape[0] != 3 or rhs.shape[1] != 3:
        return False
    B, H, W, Cin = lhs.shape
    Cout = rhs.shape[-1]
    if rhs.shape[2] != Cin:
        return False
    R, CK, CN = _tiles(W, Cin, Cout, jnp.dtype(lhs.dtype).itemsize)
    return (
        d <= R
        and H % R == 0
        and W % 16 == 0
        and W >= 2 * d  # tap column windows must fit the padded width
        and Cin % 128 == 0  # lane-aligned channel chunks only
        and Cout % 128 == 0
        and Cin % CK == 0
        and Cout % CN == 0
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv3x3_pallas(lhs, rhs, d, interpret):
    return _conv3x3_pallas_raw(lhs, rhs, d, interpret)


def _conv3x3_fwd(lhs, rhs, d, interpret):
    return _conv3x3_pallas_raw(lhs, rhs, d, interpret), (lhs, rhs)


def _conv3x3_bwd(d, interpret, res, g):
    lhs, rhs = res
    # dx: dilated conv of g with the 180deg-rotated, channel-swapped kernel
    # — same geometry, so it rides the Pallas kernel when eligible
    rhs_rot = jnp.flip(rhs, axis=(0, 1)).swapaxes(2, 3)
    g = g.astype(lhs.dtype)
    if _eligible(g, rhs_rot, d):
        dx = _conv3x3_pallas_raw(g, rhs_rot, d, interpret)
    else:
        dx = _lax_conv(g, rhs_rot, d)
    dx = dx.astype(lhs.dtype)
    # dw via the lax transpose (exact; not on the serving path)
    _, vjp_w = jax.vjp(lambda w: _lax_conv(lhs, w, d), rhs)
    (dw,) = vjp_w(g.astype(jnp.result_type(lhs.dtype, rhs.dtype)))
    return dx, dw.astype(rhs.dtype)


_conv3x3_pallas.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def _as_pairs(padding):
    try:
        return tuple((int(lo), int(hi)) for lo, hi in padding)
    except TypeError:
        return None


def pallas_conv_general_dilated(
    lhs,
    rhs,
    window_strides,
    padding,
    lhs_dilation=None,
    rhs_dilation=None,
    dimension_numbers=None,
    feature_group_count=1,
    precision=None,
    interpret=None,
):
    """Drop-in for ``lax.conv_general_dilated`` (flax ``nn.Conv`` hook
    signature) routing stride-1 'same'-padded dilated 3x3 NHWC convs
    through the fused-tap Pallas kernel. Ineligible convs (1x1s, strided,
    grouped, non-NHWC, tile-unfriendly channel counts) fall through to the
    plain lowering unchanged. ``interpret=None`` auto-selects interpreter
    mode off-TPU so the kernel is testable on CPU."""
    def fallback():
        return lax.conv_general_dilated(
            lhs, rhs, window_strides, padding,
            lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
            dimension_numbers=dimension_numbers,
            feature_group_count=feature_group_count, precision=precision,
        )

    if lhs.ndim != 4 or rhs.ndim != 4 or feature_group_count != 1:
        return fallback()
    d_pair = tuple(rhs_dilation) if rhs_dilation is not None else (1, 1)
    if d_pair[0] != d_pair[1] or d_pair[0] <= 1:
        return fallback()
    d = int(d_pair[0])
    if tuple(window_strides) != (1, 1):
        return fallback()
    if lhs_dilation is not None and tuple(lhs_dilation) != (1, 1):
        return fallback()
    dn = lax.conv_dimension_numbers(lhs.shape, rhs.shape, dimension_numbers)
    nhwc = lax.conv_dimension_numbers(lhs.shape, rhs.shape, ("NHWC", "HWIO", "NHWC"))
    if dn != nhwc:
        return fallback()
    pad = _as_pairs(padding)
    if pad != ((d, d), (d, d)):
        return fallback()
    if not _eligible(lhs, rhs, d):
        return fallback()
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _conv3x3_pallas(lhs, rhs, d, bool(interpret))
