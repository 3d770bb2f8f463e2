"""Flow-guided bilinear warp (the Deep-Feature-Flow propagation op).

Reference counterpart (SURVEY.md §2 "Flow-guided warp"): MXNet
``GridGenerator(transform_type='warp')`` + ``BilinearSampler`` CUDA kernels,
constructed inline in ``dff_deeplab/symbols/resnet_v1_101_flownet_deeplab.py``.
Semantics: ``out(y, x) = feat(y + dy(y,x), x + dx(y,x))`` with bilinear
interpolation and **zero padding** outside the image (MXNet BilinearSampler
behaviour).

Two implementations:

- :func:`bilinear_warp_xla` — exact gather formulation, differentiable by
  tracing, handles unbounded flow. This is the correctness oracle and the
  default on CPU.
- :func:`bilinear_warp_pallas` — TPU Pallas kernel (see ``warp_pallas.py``)
  using a separable masked-roll accumulation with a static max-displacement
  bound; exact bilinear within the bound. Forward is the Pallas kernel;
  backward is the (exact) VJP of the oracle via ``jax.custom_vjp``.

``flow[..., 0] = dx`` (along W), ``flow[..., 1] = dy`` (along H), in
feature-resolution pixels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gather_corner(flat_feat: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray, H: int, W: int):
    """Gather feat at integer coords (yi, xi) with zero outside. flat_feat: (N, H*W, C)."""
    valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
    yc = jnp.clip(yi, 0, H - 1)
    xc = jnp.clip(xi, 0, W - 1)
    idx = (yc * W + xc).reshape(flat_feat.shape[0], -1, 1)
    g = jnp.take_along_axis(flat_feat, idx, axis=1)
    return g, valid.reshape(valid.shape[0], -1, 1)


def bilinear_warp_xla_stacked(feat: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Bilinear warp as ONE stacked gather (serving path for wide channels).

    The 4-tap oracle below emits four ``take_along_axis`` ops, each a
    separate gather+accumulate HBM round trip in feat's *compute* dtype —
    at DFF's (N,64,128,1024) f32 that is ~0.4 GB of traffic per frame for
    a 16 MB logical tensor. Here all four taps ride a single gather whose
    output materializes once in feat's NATIVE dtype (bf16 on the serving
    path — half the bytes), and the weighted tap-sum + zero-padding mask
    fuse into one elementwise pass. Accumulation is f32, so for f32 feat
    the result matches :func:`bilinear_warp_xla` exactly; for bf16 feat the
    only difference is the (already-present) bf16 storage rounding of the
    gathered taps.
    """
    N, H, W, C = feat.shape
    f32 = jnp.float32
    dx = flow[..., 0].astype(f32).reshape(N, -1)
    dy = flow[..., 1].astype(f32).reshape(N, -1)
    yy = jax.lax.broadcasted_iota(f32, (N, H, W), 1).reshape(N, -1)
    xx = jax.lax.broadcasted_iota(f32, (N, H, W), 2).reshape(N, -1)
    sy = yy + dy
    sx = xx + dx
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    # (N, 4, HW) integer coords + weights, one gather for all taps
    ys = jnp.stack([y0i, y0i, y0i + 1, y0i + 1], axis=1)
    xs = jnp.stack([x0i, x0i + 1, x0i, x0i + 1], axis=1)
    w = jnp.stack(
        [(1 - wy) * (1 - wx), (1 - wy) * wx, wy * (1 - wx), wy * wx], axis=1
    )
    valid = (ys >= 0) & (ys < H) & (xs >= 0) & (xs < W)
    idx = (jnp.clip(ys, 0, H - 1) * W + jnp.clip(xs, 0, W - 1)).reshape(N, -1, 1)
    g = jnp.take_along_axis(feat.reshape(N, H * W, C), idx, axis=1)
    g = g.reshape(N, 4, H * W, C).astype(f32)
    w = jnp.where(valid, w, 0.0)[..., None]
    out = jnp.sum(g * w, axis=1)
    return out.reshape(N, H, W, C).astype(feat.dtype)


def bilinear_warp_xla(feat: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Exact bilinear warp via 4 gathers. feat (N,H,W,C), flow (N,H,W,2)."""
    N, H, W, C = feat.shape
    fdt = feat.dtype
    f32 = jnp.float32
    dx = flow[..., 0].astype(f32)
    dy = flow[..., 1].astype(f32)
    yy = jax.lax.broadcasted_iota(f32, (N, H, W), 1)
    xx = jax.lax.broadcasted_iota(f32, (N, H, W), 2)
    sy = yy + dy
    sx = xx + dx
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    flat = feat.astype(f32).reshape(N, H * W, C)
    out = jnp.zeros((N, H * W, C), f32)
    for (oy, ox, w) in (
        (0, 0, (1 - wy) * (1 - wx)),
        (0, 1, (1 - wy) * wx),
        (1, 0, wy * (1 - wx)),
        (1, 1, wy * wx),
    ):
        g, valid = _gather_corner(flat, y0i + oy, x0i + ox, H, W)
        out = out + jnp.where(valid, g, 0.0) * w.reshape(N, H * W, 1)
    return out.reshape(N, H, W, C).astype(fdt)


# ---------------------------------------------------------------------------
# Pallas-backed warp with exact custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bilinear_warp_pallas(feat: jnp.ndarray, flow: jnp.ndarray, max_disp: int = 16) -> jnp.ndarray:
    """TPU Pallas warp; exact bilinear for |flow| <= max_disp (flow is
    clamped to the bound, so larger displacements sample at the clamped
    offset instead of the true one). Use the oracle for unbounded flow."""
    from accel_tpu.ops.warp_pallas import warp_pallas_fwd

    return warp_pallas_fwd(feat, flow, max_disp)


def _warp_pallas_fwd_rule(feat, flow, max_disp):
    # NB: in jax>=0.9 the custom_vjp fwd rule receives arguments in their
    # original positions (nondiff included); only the bwd rule gets the
    # nondiff args as leading arguments.
    from accel_tpu.ops.warp_pallas import warp_pallas_fwd

    out = warp_pallas_fwd(feat, flow, max_disp)
    return out, (feat, flow)


def _warp_pallas_bwd_rule(max_disp, res, g):
    feat, flow = res
    # Exact gradients of the (clamped-flow) oracle. Clamp matches the
    # forward kernel's displacement bound.
    d = float(max_disp)

    def f(feat_, flow_):
        return bilinear_warp_xla(feat_, jnp.clip(flow_, -d, d))

    _, vjp = jax.vjp(f, feat, flow)
    return vjp(g)


bilinear_warp_pallas.defvjp(_warp_pallas_fwd_rule, _warp_pallas_bwd_rule)


def bilinear_warp(
    feat: jnp.ndarray,
    flow: jnp.ndarray,
    use_pallas: bool = True,
    max_disp: int = 16,
    gather: str = "taps",
) -> jnp.ndarray:
    """Dispatching entry point.

    Measured on v5e @64x128: for narrow score maps (Accel's 19 channels)
    the Pallas kernel and the XLA gather are both <=0.3 ms; for wide
    feature maps (DFF's 1024-ch fc6) XLA's gather wins 8-16x (0.37 vs
    3-6 ms — the gather index is shared across channels, so XLA lowers it
    to row-wise DMA copies, while the roll-accumulate kernel's work scales
    with the displacement bound). Dispatch accordingly; the oracle also
    serves all non-TPU backends, unbounded flow, and spatial planes too
    large for the kernel's whole-plane VMEM residency (the kernel has no
    H/W tiling — see warp_pallas.vmem_block_bytes).
    """
    from accel_tpu.ops.warp_pallas import _effective_platform, vmem_block_bytes

    N, H, W, C = feat.shape
    if gather == "onehot":
        # one-hot MXU matmul warp (ops/warp_onehot.py) — the wide-channel
        # serving path (DFF 1024-ch features); bf16 tap weights
        from accel_tpu.ops.warp_onehot import warp_onehot

        return warp_onehot(feat, flow, None, max_disp)
    fits_vmem = vmem_block_bytes(H, W, C, feat.dtype.itemsize) <= 12 * 2**20
    if use_pallas and _effective_platform() == "tpu" and C <= 64 and fits_vmem:
        return bilinear_warp_pallas(feat, flow, max_disp)
    if gather == "stacked":
        return bilinear_warp_xla_stacked(feat, flow)
    return bilinear_warp_xla(feat, flow)


def flow_to_feature_res(flow: jnp.ndarray, feat_hw: tuple[int, int], unit_scale: float) -> jnp.ndarray:
    """Resize a flow field to feature resolution and rescale its units.

    ``flow`` is (N, h, w, 2); its *values* are displacement in some pixel
    unit (e.g. FlowNet-input pixels). ``unit_scale`` converts that unit to
    feature-resolution pixels (e.g. FlowNet ran on 2x-downscaled frames and
    features are at stride 16 -> unit_scale = 2/16). The reference does the
    same rescale before GridGenerator (SURVEY.md §3.3 step 2).
    """
    from accel_tpu.ops.upsample import resize_bilinear

    out = resize_bilinear(flow.astype(jnp.float32), feat_hw)
    return out * jnp.float32(unit_scale)
