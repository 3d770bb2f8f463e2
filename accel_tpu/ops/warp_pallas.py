"""Pallas TPU kernel for flow-guided bilinear warp.

Replaces the reference's MXNet ``GridGenerator('warp')`` + ``BilinearSampler``
CUDA kernels (SURVEY.md §2a item 1) with a TPU-shaped algorithm.

Per-pixel dynamic gathers are hostile to TPU vector memory, so the kernel
reformulates bilinear sampling as a **masked-roll accumulation** with a
static displacement bound ``D``:

    out(y,x) = sum_{dy=-D}^{D+1} sum_{dx=-D}^{D+1}
                 cy_dy(y,x) * cx_dx(y,x) * feat(y+dy, x+dx)

with ``cy_dy = [floor(fy)==dy](1-wy) + [floor(fy)==dy-1]wy`` (and
analogously ``cx_dx``), zeroed outside the image (the reference
BilinearSampler's zero-padding semantics). Because the output coordinate
``y`` is an integer, ``floor(y+fy)-y == floor(fy)``: the roll distance
depends only on the flow value, so every term is a lane-aligned shift + FMA
over a VMEM-resident tile — no gathers.

Note bilinear warp under a 2D flow field is NOT separable into a vertical
then horizontal pass (the second pass would read values interpolated with a
*different* output pixel's coefficients), hence the full 2D sum. The
quadratic term count is tamed two ways:
- each (dy, dx) term is **predicated** on ``any(c > 0)`` — for smooth flow
  only a handful of integer-displacement cells are active per block, so the
  common case degenerates toward the 4-corner optimum;
- Accel's incremental (frame-to-frame) propagation bounds real displacements
  to a few feature-stride pixels, so small ``D`` (default 8) suffices; the
  unbounded pure-XLA gather oracle in ``warp.py`` covers everything else.

Layout: the kernel runs in (N, C, H, W) with **W in the lane dimension** —
Accel warps 19-channel score maps, which would waste 109/128 lanes in a
channels-last layout. Channels are tiled over the grid instead.

Exact bilinear for ``|flow| <= D`` (flow is clamped to the bound).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def default_c_tile(C: int) -> int:
    """Channel tile by width: small for score maps (C=19), larger for DFF
    feature maps so the grid isn't dominated by per-block overhead
    (measured on 1024ch@64x128: 5.8/4.0/3.0 ms at c_tile 8/32/128)."""
    return 8 if C <= 64 else (32 if C <= 256 else 128)


def vmem_block_bytes(H: int, W: int, C: int, feat_bytes: int = 2) -> int:
    """Per-grid-step VMEM footprint of the kernel. The kernel holds the FULL
    padded H x W plane per block (rolls span the whole plane — there is no
    spatial tiling), so it is only viable for feature-stride maps: at
    stride 16 on 1024x2048 inputs a block is ~0.5 MB, but a full-resolution
    warp would need ~100s of MB against ~16 MB of VMEM/core. The dispatcher
    in ``warp.py`` gates on this estimate and falls back to the XLA gather
    (which tiles fine) above the budget."""
    Hp, Wp = _round_up(H, 8), _round_up(W, 128)
    ct = default_c_tile(C)
    plane = Hp * Wp
    # feat-in + out blocks (feat dtype) + 2 f32 scratch accumulators + 2 flow planes
    return plane * (ct * (2 * feat_bytes + 8) + 8)


def _effective_platform() -> str:
    """Platform the next computation will run on — honors an active
    ``jax.default_device(...)`` override (host_init initializes TPU models
    on the CPU backend; the kernel must pick interpret mode there)."""
    dd = jax.config.jax_default_device
    if dd is not None:
        return dd.platform
    return jax.default_backend()


def _warp_kernel(fx_ref, fy_ref, feat_ref, out_ref, rdy_ref, acc_ref, *, D: int, H: int, W: int):
    f32 = jnp.float32
    fx = jnp.clip(fx_ref[0].astype(f32), -D, D)
    fy = jnp.clip(fy_ref[0].astype(f32), -D, D)
    iy = jnp.floor(fy)
    wy = fy - iy
    ix = jnp.floor(fx)
    wx = fx - ix

    Hp, Wp = fx.shape  # padded block dims
    # NB: Mosaic requires integer iota (tpu.iota rejects float results)
    yy = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    for dy in range(-D, D + 2):
        cy = jnp.where(iy == dy, 1.0 - wy, 0.0) + jnp.where(iy == dy - 1, wy, 0.0)
        cy = jnp.where((yy + dy >= 0) & (yy + dy <= H - 1), cy, 0.0)

        @pl.when(jnp.any(cy > 0.0))
        def _row():  # noqa: B023
            rdy_ref[...] = pltpu.roll(feat_ref[0].astype(f32), shift=(-dy) % Hp, axis=1)
            for dx in range(-D, D + 2):
                cx = jnp.where(ix == dx, 1.0 - wx, 0.0) + jnp.where(ix == dx - 1, wx, 0.0)
                cx = jnp.where((xx + dx >= 0) & (xx + dx <= W - 1), cx, 0.0)
                c = cy * cx

                @pl.when(jnp.any(c > 0.0))
                def _term(c=c, dx=dx):
                    acc_ref[...] += c[None, :, :] * pltpu.roll(
                        rdy_ref[...], shift=(-dx) % Wp, axis=2
                    )

    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _warp_nchw(feat_nchw, fx, fy, D: int, c_tile: int, interpret: bool):
    N, C, H, W = feat_nchw.shape
    Hp = _round_up(H, 8)
    Wp = _round_up(W, 128)
    Cp = _round_up(C, c_tile)
    feat_p = jnp.pad(feat_nchw, ((0, 0), (0, Cp - C), (0, Hp - H), (0, Wp - W)))
    fx_p = jnp.pad(fx, ((0, 0), (0, Hp - H), (0, Wp - W)))
    fy_p = jnp.pad(fy, ((0, 0), (0, Hp - H), (0, Wp - W)))

    grid = (N, Cp // c_tile)
    out = pl.pallas_call(
        functools.partial(_warp_kernel, D=D, H=H, W=W),
        out_shape=jax.ShapeDtypeStruct((N, Cp, Hp, Wp), feat_nchw.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Hp, Wp), lambda n, c: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hp, Wp), lambda n, c: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_tile, Hp, Wp), lambda n, c: (n, c, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c_tile, Hp, Wp), lambda n, c: (n, c, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((c_tile, Hp, Wp), jnp.float32),
            pltpu.VMEM((c_tile, Hp, Wp), jnp.float32),
        ],
        interpret=interpret,
    )(fx_p, fy_p, feat_p)
    return out[:, :C, :H, :W]


def warp_pallas_fwd(
    feat: jnp.ndarray,
    flow: jnp.ndarray,
    max_disp: int = 8,
    c_tile: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """feat (N,H,W,C), flow (N,H,W,2) -> warped (N,H,W,C).

    ``interpret=None`` auto-selects interpreter mode off-TPU so tests can
    exercise the kernel logic on CPU. ``c_tile=None`` picks the channel tile
    by C: small for score maps (C=19), larger for DFF feature maps (C=1024)
    so the grid isn't dominated by per-block overhead.
    """
    if interpret is None:
        interpret = _effective_platform() != "tpu"
    N, H, W, C = feat.shape
    if c_tile is None:
        c_tile = default_c_tile(C)
    feat_nchw = jnp.transpose(feat, (0, 3, 1, 2))
    fx = flow[..., 0].astype(jnp.float32)
    fy = flow[..., 1].astype(jnp.float32)
    out = _warp_nchw(feat_nchw, fx, fy, int(max_disp), int(c_tile), bool(interpret))
    return jnp.transpose(out, (0, 2, 3, 1))
