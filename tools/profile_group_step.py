#!/usr/bin/env python
"""Per-stage breakdown of the batched group step at bench shapes (task:
close the non-key bandwidth tail, VERDICT r2 #1).

Times each stage of ``core/pipeline._group_step_direct_batched`` (and the
incremental variant's deltas) at the EXACT batched shapes the composite
dispatches — B=4, k=5, 1024x2048 — then times the composite itself, so the
table shows both where the non-key milliseconds go and how much the
sum-of-stages differs from the fused whole (XLA inter-stage fusion /
scheduling wins or losses).

Usage (detached on TPU):
  setsid nohup python -u tools/profile_group_step.py > /tmp/profile.log 2>&1 &
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    if os.environ.get("ACCEL_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ACCEL_PLATFORM"])
    from accel_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--interval", type=int, default=5)
    ap.add_argument("--clip-batch", type=int, default=4)
    ap.add_argument("--config", default="accel18",
                    choices=["accel18", "accel18_fast", "dff"])
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="AccelNet constructor overrides for lowering A/Bs, "
                         "e.g. --set warp_dtype=native --set warp_gather=stacked "
                         "--set fold_update_downscale=true")
    args = ap.parse_args()

    overrides = {}
    for kv in args.set:
        key, val = kv.split("=", 1)
        if val.lower() in ("true", "false"):
            val = val.lower() == "true"
        else:
            try:
                val = int(val)
            except ValueError:
                pass
        overrides[key] = val
    if overrides:
        print(f"overrides: {overrides}", flush=True)

    from bench import SlopeMeter, _build, _flops_of, _init_variables
    from accel_tpu.core.pipeline import clip_predictions
    from accel_tpu.models.accel import AccelNet

    H, W, k, B = args.height, args.width, args.interval, args.clip_batch
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = on_tpu

    if args.config == "accel18":
        base_kw = dict(
            family="accel", ref_depth=101, update_depth=18, num_classes=19,
            feat_stride=16, head_channels=1024, head_dilation=6,
            dtype=jnp.bfloat16, use_pallas_warp=use_pallas, warp_max_disp=8,
        )
    elif args.config == "accel18_fast":
        base_kw = dict(
            family="accel", ref_depth=101, update_depth=18, num_classes=19,
            feat_stride=16, head_channels=1024, head_dilation=6,
            dtype=jnp.bfloat16, use_pallas_warp=use_pallas, warp_max_disp=8,
            update_head_channels=256, update_input_downscale=2,
            flow_input_downscale=4, flow_width_mult=0.5,
        )
    else:
        base_kw = dict(
            family="dff", ref_depth=101, num_classes=19, feat_stride=16,
            head_channels=1024, dtype=jnp.bfloat16, use_pallas_warp=use_pallas,
            warp_max_disp=16, flow_input_downscale=4, flow_width_mult=0.5,
        )
    base_kw.update(overrides)
    model = AccelNet(**base_kw)

    variables = _init_variables(model, H, W)
    rng = np.random.default_rng(0)
    fs = model.feat_stride
    hf, wf = H // fs, W // fs
    ds = model.flow_input_downscale
    hs, ws = H // ds, W // ds
    n_nk = B * (k - 1)  # non-key batch
    C_prop = model.head_channels if model.warp_tensor == "features" else 19

    frames_key = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)
    frames_all = jnp.asarray(rng.standard_normal((B * k, H, W, 3)), jnp.float32)
    small_cur = jnp.asarray(rng.standard_normal((n_nk, hs, ws, 3)), jnp.float32)
    small_anchor = jnp.asarray(rng.standard_normal((n_nk, hs, ws, 3)), jnp.float32)
    prop_nk = jnp.asarray(
        rng.standard_normal((n_nk, hf, wf, C_prop)), jnp.bfloat16)
    flow_nk = jnp.asarray(rng.uniform(-4, 4, (n_nk, hf, wf, 2)), jnp.float32)
    # warp_dtype=native delivers the scale field in bf16 (cast upstream in
    # _flow_post before the resize) — feed the stage what the composite
    # actually dispatches, else the row pays a phantom 0.8 GB f32->bf16 cast
    scale_nk = jnp.asarray(
        rng.uniform(0.5, 1.5, (n_nk, hf, wf, C_prop)),
        jnp.bfloat16 if model.warp_dtype == "native" else jnp.float32)
    scores_all = jnp.asarray(
        rng.standard_normal((B * k, hf, wf, 19)), jnp.float32)
    upd_all = jnp.asarray(rng.standard_normal((B * k, hf, wf, 19)), jnp.float32)
    clip = jnp.asarray(rng.standard_normal((B, k, H, W, 3)), jnp.float32)

    stages = {}

    # v5e roofline constants (bf16 MXU peak; HBM2 bandwidth).
    PEAK_TFLOPS = 197e12
    HBM_BW = 819e9

    def _bytes_of_tree(tree):
        return sum(int(np.prod(x.shape)) * x.dtype.itemsize
                   for x in jax.tree.leaves(tree) if hasattr(x, "shape"))

    def _io_bytes(fn, v, base):
        """Analytic HBM traffic lower bound: operand bytes + result bytes.

        This is the fusion-ideal minimum (every input read once, every
        output written once, all intermediates resident in VMEM) — a real
        multi-layer stage that spills inter-layer activations to HBM can
        only exceed it, so ``bound = max(flops/peak, bytes/bw)`` is a true
        roofline for the stage.
        """
        try:
            out = jax.eval_shape(fn, v, base)
        except Exception:
            return None
        return _bytes_of_tree((v, base)) + _bytes_of_tree(out)

    def add(name, fn, base, per_call_frames, v=variables):
        # SlopeMeter passes (variables, base, scale); fn(v, base, scale)
        m = SlopeMeter(fn, v, base, verbose=False).compile()
        t = min(m.draw() for _ in range(2))
        fl = _flops_of(fn, v, base)
        nbytes = _io_bytes(fn, v, base)
        stages[name] = (t, per_call_frames, fl, nbytes)
        roof = ""
        if nbytes:
            t_hbm = nbytes / HBM_BW
            t_mxu = (fl or 0) / PEAK_TFLOPS
            t_bound = max(t_hbm, t_mxu)
            which = "HBM" if t_hbm >= t_mxu else "MXU"
            roof = (f"  roof {t_bound * 1e3:7.3f} ms ({which})"
                    f"  {100 * t_bound / t:5.1f}% of roof")
        print(f"  {name:44s} {t * 1e3:9.3f} ms/call  "
              f"{t * 1e3 / per_call_frames:7.3f} ms/frame"
              + (f"  {fl / t / 1e12:6.1f} TF/s" if fl else "       -    ")
              + roof, flush=True)

    print(f"== {args.config} stage breakdown @ {H}x{W} B={B} k={k} "
          f"(batched-direct shapes) ==", flush=True)

    add("key: ref_propagated (B)", lambda v, b, s=None:
        model.apply(v, b if s is None else b * s, method="ref_propagated"),
        frames_key, B * k)  # amortized over the whole group
    if model.warp_tensor == "features":
        feat_key = jnp.asarray(
            rng.standard_normal((B, hf, wf, model.head_channels)), jnp.bfloat16)
        add("key: scores head (B)", lambda v, b, s=None:
            model.apply(v, b if s is None else b * s,
                        method="ref_scores_from_propagated"),
            feat_key, B * k)
    add("downscale_for_flow (B*k)", lambda v, b, s=None:
        model.apply(v, b if s is None else b * s, method="downscale_for_flow"),
        frames_all, B * k)
    # NB: big side tensors must ride in the ``v`` slot, NOT as closures —
    # jit embeds closed-over arrays as HLO constants, and DFF's 1024-ch
    # scale field (512 MB f32) blows the tunnel compile request limit
    # (observed HTTP 413 on remote_compile).
    add("flow_pair: FlowNet+resize (B*(k-1))", lambda vv, b, s=None:
        model.apply(vv[0], b if s is None else b * s, vv[1],
                    method="flow_pair")[0],
        small_cur, n_nk, v=(variables, small_anchor))
    if model.fold_flow_downscale:
        # the folded prologue the composite actually dispatches
        add("flow stem partials (B*k)", lambda v, b, s=None:
            model.apply(v, b if s is None else b * s,
                        method="flow_stem_partials")[0],
            frames_all, B * k)
        c1 = max(int(64 * model.flow_width_mult), 16)
        hp, wp = H // (2 * ds), W // (2 * ds)
        part_cur = jnp.asarray(
            rng.standard_normal((n_nk, hp, wp, c1)), jnp.bfloat16)
        part_anc = jnp.asarray(
            rng.standard_normal((n_nk, hp, wp, c1)), jnp.bfloat16)
        add("flow tail from partials (B*(k-1))", lambda vv, b, s=None:
            model.apply(vv[0], b if s is None else b * s, vv[1],
                        method="flow_pair_from_partials")[0],
            part_cur, n_nk, v=(variables, part_anc))
    add("warp+scale-mod (B*(k-1))", lambda vv, b, s=None:
        model.apply(vv[0], b if s is None else b * s, vv[1], vv[2],
                    method="warp"),
        prop_nk, n_nk, v=(variables, flow_nk, scale_nk))
    # --- warp-stage decomposition (VERDICT r4 #2): the r4 session measured
    # the stage at 7.34 ms/call vs the isolated dbuf kernel's 2.84 — these
    # rows split the difference into (a) the SlopeMeter harness artifact
    # (the row above multiplies the BIG prop tensor by the per-step scale;
    # the probe tool multiplies only the 2-ch flow), (b) scale-field
    # normalization, (c) the scale-modulation epilogue. The per-step scale
    # rides on the flow here, which defeats result caching without
    # touching the wide operands — the same contract probe_onehot_kernel
    # uses, so "scale-on-flow" is directly comparable to its numbers.
    add("warp DECOMP scale-on-flow (true stage)", lambda vv, b, s=None:
        model.apply(vv[0], b, vv[1] if s is None else vv[1] * s, vv[2],
                    method="warp"),
        prop_nk, n_nk, v=(variables, flow_nk, scale_nk))
    scale_pre = jnp.asarray(np.asarray(
        model.apply(variables, scale_nk, method="norm_scale")),
        scale_nk.dtype)
    add("warp DECOMP prenormed scale", lambda vv, b, s=None:
        model.apply(vv[0], b, vv[1] if s is None else vv[1] * s, vv[2],
                    method="warp", normalize_scale=False),
        prop_nk, n_nk, v=(variables, flow_nk, scale_pre))
    add("warp DECOMP modulate=False (bare gather)", lambda vv, b, s=None:
        model.apply(vv[0], b, vv[1] if s is None else vv[1] * s, vv[2],
                    method="warp", modulate=False),
        prop_nk, n_nk, v=(variables, flow_nk, scale_nk))
    add("warp DECOMP norm_scale alone", lambda v, b, s=None:
        model.apply(v, b if s is None else b * s, method="norm_scale"),
        scale_nk, n_nk)
    if model.warp_tensor == "features":
        add("nonkey scores head (B*(k-1))", lambda v, b, s=None:
            model.apply(v, b if s is None else b * s,
                        method="ref_scores_from_propagated"),
            prop_nk, n_nk)
    if model.family == "accel":
        add("update branch (B*k)", lambda v, b, s=None:
            model.apply(v, b if s is None else b * s, method="update_scores"),
            frames_all, B * k)
        add("fuse 1x1 (B*k)", lambda vv, b, s=None:
            model.apply(vv[0], b if s is None else b * s, vv[1], method="fuse"),
            scores_all, B * k, v=(variables, upd_all))

    from accel_tpu.ops.upsample_argmax import upsample_argmax_or_oracle

    add("upsample+argmax (B*k)", lambda v, b, s=None:
        upsample_argmax_or_oracle(b if s is None else b * s, (H, W)),
        scores_all, B * k)

    def composite(v, c, s=None):
        return clip_predictions(model, v, c, k, "direct", input_scale=s)

    add("COMPOSITE direct group (B,k)", composite, clip, B * k)

    def composite_incr(v, c, s=None):
        return clip_predictions(model, v, c, k, "incremental", input_scale=s)

    add("COMPOSITE incremental group (B,k)", composite_incr, clip, B * k)

    def composite_comp(v, c, s=None):
        return clip_predictions(model, v, c, k, "composed", input_scale=s)

    add("COMPOSITE composed group (B,k)", composite_comp, clip, B * k)

    t_sum = sum(t for name, (t, *_rest) in stages.items()
                if not name.startswith("COMPOSITE") and "DECOMP" not in name)
    t_comp = stages["COMPOSITE direct group (B,k)"][0]
    print(f"\nsum of stages: {t_sum * 1e3:.3f} ms/group; composite: "
          f"{t_comp * 1e3:.3f} ms/group; fusion/scheduling delta: "
          f"{(t_sum - t_comp) * 1e3:+.3f} ms", flush=True)
    print(f"composite fps: {B * k / t_comp:.1f}", flush=True)


if __name__ == "__main__":
    main()
