"""Functional forward/loss/inference pipelines.

Reference counterparts: the symbol-assembly in
``dff_deeplab/symbols/*.py`` (``get_train_symbol`` /
``get_key_test_symbol`` / ``get_cur_test_symbol``) and the per-frame loop of
``core/tester.py:pred_eval`` (SURVEY.md §3.1-3.3).

TPU-native shape: instead of two separately-bound executors with the cached
keyframe feature fed back as a graph *input* (the reference's MXNet idiom),
a clip is scanned in one XLA program — ``lax.scan`` over keyframe groups
with the propagated tensor as carry, the keyframe step unrolled as the first
step of each group, so the backbone runs exactly once per group and the
feature cache lives in HBM as scan carry (BASELINE.json north star).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from accel_tpu.core.metrics import softmax_cross_entropy
from accel_tpu.ops.upsample import resize_bilinear


def pair_loss(model, variables, batch, num_classes: int, loss_scale: float = 1.0):
    """Cross-entropy on a (key, cur) pair batch.

    ``batch``: dict with 'data' (N,H,W,3), 'data_ref' (N,H,W,3),
    'eq_flag' (N,), 'label' (N,H,W) int with 255 ignore.
    The reference computes loss at label resolution after the fixed
    bilinear upsample (SURVEY.md §3.3 step 7); downsampling labels instead
    changes the objective, so we upsample logits.
    """
    loss, _ = pair_loss_and_stats(model, variables, batch, num_classes, loss_scale)
    return loss


def pair_loss_and_stats(
    model, variables, batch, num_classes: int, loss_scale: float = 1.0,
    mutable_stats: bool = False, ohem_fraction: float | None = None,
    aux_weight: float = 0.0,
):
    """pair_loss variant returning (loss, new_batch_stats-or-None); set
    ``mutable_stats`` when the model uses running-stat BatchNorm.

    ``aux_weight`` > 0 adds auxiliary CE on the raw branch outputs
    (reference-branch scores on the *current* frame and update-branch
    scores) so the keyframe path stays strong even though most training
    pairs exercise the warp path — without it, interval-1 eval (pure
    keyframe) lags the warped path badly (round-1 finding: 43 vs 98 mIoU
    on the synthetic set).
    """
    if mutable_stats:
        logits, new_vars = model.apply(
            variables, batch["data"], batch["data_ref"], batch["eq_flag"],
            train=True, mutable=["batch_stats"],
        )
        new_stats = new_vars.get("batch_stats")
    else:
        logits = model.apply(
            variables, batch["data"], batch["data_ref"], batch["eq_flag"], train=True
        )
        new_stats = None
    label = batch["label"]
    hw = label.shape[1:3]
    logits_full = resize_bilinear(logits, hw)
    loss = softmax_cross_entropy(
        logits_full, label, num_classes, loss_scale, ohem_fraction
    )
    if aux_weight > 0.0 and model.family in ("dff", "accel"):
        prop_cur = model.apply(variables, batch["data"], method="ref_propagated")
        ref_scores = model.apply(
            variables, prop_cur, method="ref_scores_from_propagated"
        )
        loss = loss + aux_weight * softmax_cross_entropy(
            resize_bilinear(ref_scores, hw), label, num_classes, loss_scale,
            ohem_fraction,
        )
        if model.family == "accel":
            upd = model.apply(variables, batch["data"], method="update_scores")
            loss = loss + aux_weight * softmax_cross_entropy(
                resize_bilinear(upd, hw), label, num_classes, loss_scale,
                ohem_fraction,
            )
    return loss, new_stats


def clip_loss_and_stats(
    model, variables, batch, num_classes: int, loss_scale: float = 1.0,
    propagate: str = "incremental", mutable_stats: bool = False,
    ohem_fraction: float | None = None, aux_weight: float = 0.0,
    remat: bool = False,
):
    """Clip-unrolled training objective: CE through the cascaded
    propagation, so incremental (frame-to-frame) warping is *trainable* —
    the gradient of the annotated frame's loss flows back through every
    warp/flow/scale application in the chain. This is the objective the
    reference's incremental eval semantics requires (SURVEY.md §3.3 /
    Appendix B); pair training (``pair_loss``) only ever supervises a
    single warp, which round-1 measured to collapse under cascade
    (mIoU 98 -> 3 at k=5).

    ``batch``: {'clip': (B,F,H,W,3), 'label': (B,F,H,W) int, 255 ignore on
    every pixel of unannotated frames}. F must be divisible by the model's
    interval = F (single group) in the intended use.
    """
    F = batch["clip"].shape[1]
    label = batch["label"]
    if mutable_stats:
        raise NotImplementedError(
            "clip objective + running-stat BN: use frozenbn/groupnorm"
        )
    logits = clip_logits(model, variables, batch["clip"], F, propagate, remat)
    hw = label.shape[2:4]

    def frame_ce(lg, lb):  # upsample per frame to bound peak memory
        return softmax_cross_entropy(
            resize_bilinear(lg, hw), lb, num_classes, loss_scale, ohem_fraction
        )

    # mean over frames of per-frame valid-pixel-mean CE; unannotated frames
    # have zero valid pixels and contribute 0 — normalize by annotated count
    per_frame = jax.vmap(frame_ce, in_axes=(1, 1))(logits, label)
    annotated = jax.vmap(
        lambda lb: jnp.any((lb != 255) & (lb < num_classes)), in_axes=1
    )(label)
    loss = per_frame.sum() / jnp.maximum(annotated.sum(), 1)
    if aux_weight > 0.0:
        # keep the raw branch outputs strong on the annotated frame. Only
        # ONE frame per clip carries labels (the loader contract), so the
        # aux branches run on that frame alone — running them on all B*F
        # frames is identical in value (unannotated frames have zero valid
        # pixels) but wastes ~(F-1)/F of a full ref+update forward/backward
        valid = (label != 255) & (label < num_classes)  # (B,F,H,W)
        ann_idx = jnp.argmax(valid.sum(axis=(2, 3)), axis=1)  # (B,)
        ann_frames = jnp.take_along_axis(
            batch["clip"], ann_idx[:, None, None, None, None], axis=1
        ).squeeze(1)
        ann_label = jnp.take_along_axis(
            label, ann_idx[:, None, None, None], axis=1
        ).squeeze(1)
        prop_cur = model.apply(variables, ann_frames, method="ref_propagated")
        ref_scores = model.apply(
            variables, prop_cur, method="ref_scores_from_propagated"
        )
        # softmax_cross_entropy is a mean over valid pixels, so this is on
        # the same scale as the clip loss
        loss = loss + aux_weight * softmax_cross_entropy(
            resize_bilinear(ref_scores, hw), ann_label, num_classes,
            loss_scale, ohem_fraction,
        )
        if model.family == "accel":
            upd = model.apply(variables, ann_frames, method="update_scores")
            loss = loss + aux_weight * softmax_cross_entropy(
                resize_bilinear(upd, hw), ann_label, num_classes,
                loss_scale, ohem_fraction,
            )
    return loss, None


# ---------------------------------------------------------------------------
# Clip inference
# ---------------------------------------------------------------------------


# Max full-resolution frames per dispatch inside a batched group step.
# B*k beyond this is processed in equal chunks via lax.map: XLA's resize
# (and the update branch) otherwise stage whole-(B,k,H,W,3) temporaries —
# the measured compile-time OOM at B=8, k=5, 1024x2048 (BASELINE.md). 20
# frames (= the known-good B=4, k=5 working set) keeps the MXU saturated;
# chunking is numerically exact because every op here is per-frame.
MAX_FULLRES_FRAMES_PER_DISPATCH = 20


def _chunked_apply(model, variables, x, method: str, scale=None):
    """model.apply(variables, x, method=method) over the leading (frame)
    axis in chunks of at most MAX_FULLRES_FRAMES_PER_DISPATCH (largest
    divisor), sequenced with lax.map so only one chunk is live at a time.

    ``scale`` (scalar or None) multiplies each chunk *inside* the loop
    body, where it fuses into the consuming convs. Scaling the whole clip
    upstream instead materializes the product as the chunk loop's input,
    and XLA's layout assignment picks a lane-padded conv layout for that
    buffer — measured 21.5 GB for a 1 GB clip at B=8 (BASELINE.md); an
    optimization_barrier does not prevent the padded layout (probed)."""
    n = x.shape[0]
    limit = MAX_FULLRES_FRAMES_PER_DISPATCH

    def f(xc):
        if scale is not None:
            xc = xc * scale
        return model.apply(variables, xc, method=method)

    # symbolic leading dim (jax.export shape polymorphism): the chunk-size
    # choice needs a concrete n — run unchunked (serving exports bind modest
    # batches; the chunking exists for the B*k>=40 full-res training shapes)
    if not isinstance(n, int) or n <= limit:
        return f(x)
    c = max(d for d in range(1, limit + 1) if n % d == 0)
    chunks = x.reshape(n // c, c, *x.shape[1:])
    out = jax.lax.map(f, chunks)
    return jax.tree_util.tree_map(
        lambda a: a.reshape(n, *a.shape[2:]), out
    )


def _update_fuse_tail(model, variables, frames_g, ref_all, input_scale=None):
    """Shared tail of the batched group steps: per-frame update branch at
    batch B*k + batched 1x1 fusion (accel), or the ref scores as-is."""
    B, k = frames_g.shape[:2]
    if model.family != "accel":
        return ref_all
    upd = _chunked_apply(
        model, variables, frames_g.reshape(B * k, *frames_g.shape[2:]),
        "update_scores", scale=input_scale,
    )
    fused = model.apply(
        variables, ref_all.reshape(B * k, *ref_all.shape[2:]), upd, method="fuse"
    )
    return fused.reshape(B, k, *fused.shape[1:])


def _group_flow_reps(model, variables, frames_g, input_scale=None):
    """Per-frame FlowNet prologue for the whole group in one batched call:
    the downscaled frames (standard path), or the folded conv1 stem
    partials (``model.fold_flow_downscale`` — ops/fold_downscale.py; the
    lane-hostile full-res C=3 downscale never materializes). Returns a
    pytree of (B, k, ...) arrays either way."""
    B, k = frames_g.shape[:2]
    method = ("flow_stem_partials" if model.fold_flow_downscale
              else "downscale_for_flow")
    rep = _chunked_apply(
        model, variables,
        frames_g.reshape(B * k, *frames_g.shape[2:]),
        method, scale=input_scale,
    )
    return jax.tree_util.tree_map(
        lambda a: a.reshape(B, k, *a.shape[1:]), rep
    )


def _rep_slice(rep, fn):
    return jax.tree_util.tree_map(fn, rep)


def _flow_from_reps(model, variables, cur_rep, anchor_rep):
    """FlowNet pass from per-frame prologue reps (see _group_flow_reps)."""
    if model.fold_flow_downscale:
        return model.apply(variables, cur_rep[0], anchor_rep[1],
                           method="flow_pair_from_partials")
    return model.apply(variables, cur_rep, anchor_rep, method="flow_pair")


def _group_step_direct_batched(model, variables, frames_g, input_scale=None):
    """Direct-mode group step with the non-key work batched.

    In direct propagation every non-key frame depends only on the keyframe,
    so the k-1 FlowNet passes, warps, score heads, update-branch passes and
    fusions have no sequential dependence — they run as ONE call each at
    batch B*(k-1) (or B*k for the per-frame update branch) instead of k-1
    separate batch-B dispatches. Larger batches keep the MXU full; measured
    on v5e this is the difference between the group being latency-bound and
    compute-bound at B=1.
    Numerically identical to the sequential form (same ops, batched).
    """
    B, k = frames_g.shape[:2]
    key_frame = frames_g[:, 0]
    if input_scale is not None:
        key_frame = key_frame * input_scale
    prop = model.apply(variables, key_frame, method="ref_propagated")
    key_scores = model.apply(variables, prop, method="ref_scores_from_propagated")
    if k == 1:
        ref_all = key_scores[:, None]
    else:
        rep = _group_flow_reps(model, variables, frames_g, input_scale)
        cur_rep = _rep_slice(
            rep, lambda a: a[:, 1:].reshape(B * (k - 1), *a.shape[2:]))
        anchor_rep = _rep_slice(rep, lambda a: jnp.repeat(a[:, 0], k - 1, axis=0))
        flow, scale = _flow_from_reps(model, variables, cur_rep, anchor_rep)
        prop_rep = jnp.repeat(prop, k - 1, axis=0)
        warped = model.apply(variables, prop_rep, flow, scale, method="warp")
        ref_nonkey = model.apply(
            variables, warped, method="ref_scores_from_propagated"
        )
        ref_all = jnp.concatenate(
            [key_scores[:, None], ref_nonkey.reshape(B, k - 1, *ref_nonkey.shape[1:])],
            axis=1,
        )
    return _update_fuse_tail(model, variables, frames_g, ref_all, input_scale)


def _warp_field(model, field, flow):
    """Bilinear-warp a small per-pixel FIELD (flow or scale) by a step flow
    — the composition primitive of composed-mode propagation. f32 for
    exact cascade arithmetic; kernel/gather dispatch per model knobs."""
    from accel_tpu.ops.warp import bilinear_warp

    return bilinear_warp(
        field.astype(jnp.float32), flow, use_pallas=model.use_pallas_warp,
        max_disp=model.warp_max_disp, gather=model.warp_gather,
    )


# Per-pixel bound for scale_cascade='clamp': the cumulative scale product
# is clipped to [1/_CASCADE_CLAMP, _CASCADE_CLAMP] after every step.
_CASCADE_CLAMP = 2.0


def _cascade_post(acc_s, mode):
    """Apply the scale_cascade intervention to a cumulative scale product
    (BASELINE.md extreme finding 7: the incremental-vs-direct far-offset
    gap is the compounding product, not resample blur — these are the
    attacks on that mechanism)."""
    if mode == "mean1":
        m = jnp.mean(acc_s, axis=(1, 2, 3), keepdims=True)
        return acc_s / (jnp.abs(m) + 1e-6)
    if mode == "clamp":
        return jnp.clip(acc_s, 1.0 / _CASCADE_CLAMP, _CASCADE_CLAMP)
    return acc_s  # 'product' (and 'last' never accumulates)


def _compose_fields(model, variables, flow, scale):
    """Cascade per-step flow/scale fields into per-frame composed fields.

    ``flow`` (B, k-1, h, w, 2): step i maps frame i+1's pixels to their
    frame-i source (pull convention). ``scale`` (B, k-1, h, w, C): step
    i's DFF scale field (un-normalized). Returns composed (flow, scale)
    of the same shapes where entry i maps frame i+1 directly to the
    KEYFRAME: ``F_i(p) = f_i(p) + F_{i-1}(p + f_i(p))`` and
    ``S_i(p) = norm(s_i)(p) * S_{i-1}(p + f_i(p))`` — i.e. the warp
    cascade incremental mode applies to the propagated tensor, applied to
    the cheap fields instead. Out-of-frame samples zero-pad (the warp's
    own OOB semantics), so composed scale -> 0 exactly where incremental
    propagation would have zeroed content.

    ``model.scale_cascade`` selects the cascade-scale semantics: 'product'
    (above), 'mean1'/'clamp' (the accumulator is renormalized/clamped
    after every step), or 'last' (no accumulation — entry i carries only
    step i's normalized field; the scale field-warps disappear).
    """
    mode = model.scale_cascade
    k1 = flow.shape[1]
    acc_f = flow[:, 0]
    acc_s = _cascade_post(
        model.apply(variables, scale[:, 0], method="norm_scale"), mode
    )
    comp_f, comp_s = [acc_f], [acc_s]
    for i in range(1, k1):
        stepf = flow[:, i]
        steps_ = model.apply(variables, scale[:, i], method="norm_scale")
        acc_f = stepf + _warp_field(model, acc_f, stepf)
        if mode == "last":
            acc_s = steps_
        else:
            acc_s = _cascade_post(steps_ * _warp_field(model, acc_s, stepf), mode)
        comp_f.append(acc_f)
        comp_s.append(acc_s)
    return jnp.stack(comp_f, 1), jnp.stack(comp_s, 1)


def _group_step_composed_batched(model, variables, frames_g, input_scale=None):
    """Composed-flow group step (``propagate='composed'`` — r3 addition).

    Motivation (measured, tools/probe_flow_magnitude.py + the extreme
    battery): FlowNet-S does NOT scale its prediction with temporal gap —
    direct mode's single key->frame flow under-displaces multi-frame
    motion — while incremental mode tracks displacement but resamples the
    propagated tensor k-1 times, compounding bilinear blur. Composed mode
    cascades only the CHEAP per-step fields (2-ch flow + scale field, one
    small warp per step) and samples the expensive propagated tensor
    exactly ONCE per frame at the composed displacement: direct's
    single-resample sharpness with incremental's gap-scaled displacement.
    Sequential work is O(k) on (h, w, 2+C) fields; all wide compute stays
    batched exactly like direct mode. The final warp gets a widened
    static displacement bound ((k-1) x per-step) since composed flows sum
    per-step displacements.
    """
    B, k = frames_g.shape[:2]
    key_frame = frames_g[:, 0]
    if input_scale is not None:
        key_frame = key_frame * input_scale
    prop = model.apply(variables, key_frame, method="ref_propagated")
    key_scores = model.apply(variables, prop, method="ref_scores_from_propagated")
    if k == 1:
        ref_all = key_scores[:, None]
    else:
        rep = _group_flow_reps(model, variables, frames_g, input_scale)
        cur_rep = _rep_slice(
            rep, lambda a: a[:, 1:].reshape(B * (k - 1), *a.shape[2:]))
        prev_rep = _rep_slice(
            rep, lambda a: a[:, :-1].reshape(B * (k - 1), *a.shape[2:]))
        flow, scale = _flow_from_reps(model, variables, cur_rep, prev_rep)
        flow = flow.reshape(B, k - 1, *flow.shape[1:])
        scale = scale.reshape(B, k - 1, *scale.shape[1:])
        cflow, cscale = _compose_fields(model, variables, flow, scale)
        prop_rep = jnp.repeat(prop, k - 1, axis=0)
        warped = model.apply(
            variables, prop_rep,
            cflow.reshape(B * (k - 1), *cflow.shape[2:]),
            cscale.reshape(B * (k - 1), *cscale.shape[2:]),
            method="warp", normalize_scale=False,
            max_disp=int(model.warp_max_disp) * (k - 1),
        )
        ref_nonkey = model.apply(
            variables, warped, method="ref_scores_from_propagated"
        )
        ref_all = jnp.concatenate(
            [key_scores[:, None], ref_nonkey.reshape(B, k - 1, *ref_nonkey.shape[1:])],
            axis=1,
        )
    return _update_fuse_tail(model, variables, frames_g, ref_all, input_scale)


def _group_step_incremental_batched(model, variables, frames_g, input_scale=None):
    """Incremental-mode (frame-to-frame cascade — the Accel paper's own
    semantics, the flagship default since r3) group step with the
    non-sequential work batched.

    The cascade is sequential ONLY in the warp: each step's flow is between
    CONSECUTIVE frames, so all k-1 FlowNet passes are independent pairs —
    one call at batch B*(k-1) — and the score head / update branch / fusion
    are per-frame — one call each at B*(k-1) / B*k. Only the warp (the
    cheapest stage: 19-ch Pallas roll-accumulate or a row-DMA gather,
    ~0.3 ms) chains through the k-1 steps.
    Numerically identical to the sequential form (same ops, batched).
    """
    B, k = frames_g.shape[:2]
    key_frame = frames_g[:, 0]
    if input_scale is not None:
        key_frame = key_frame * input_scale
    prop = model.apply(variables, key_frame, method="ref_propagated")
    key_scores = model.apply(variables, prop, method="ref_scores_from_propagated")
    if k == 1:
        ref_all = key_scores[:, None]
    else:
        rep = _group_flow_reps(model, variables, frames_g, input_scale)
        cur_rep = _rep_slice(
            rep, lambda a: a[:, 1:].reshape(B * (k - 1), *a.shape[2:]))
        prev_rep = _rep_slice(
            rep, lambda a: a[:, :-1].reshape(B * (k - 1), *a.shape[2:]))
        flow, scale = _flow_from_reps(model, variables, cur_rep, prev_rep)
        flow = flow.reshape(B, k - 1, *flow.shape[1:])
        scale = scale.reshape(B, k - 1, *scale.shape[1:])
        mode = model.scale_cascade
        if mode == "product" or not model.use_scale_field:
            carry, warped_steps = prop, []
            for i in range(k - 1):
                carry = model.apply(
                    variables, carry, flow[:, i], scale[:, i], method="warp"
                )
                warped_steps.append(carry)
        else:
            # scale_cascade intervention (r4): carry the UNMODULATED tensor
            # plus (for mean1/clamp) the explicit cumulative scale product,
            # and modulate only the per-frame SCORED copy. Field-warping
            # the product separately from the tensor is the composed-mode
            # decomposition, measured accuracy-identical to the baked
            # product (BASELINE.md extreme finding 7).
            carry, prod, warped_steps = prop, None, []
            for i in range(k - 1):
                s = model.apply(variables, scale[:, i], method="norm_scale")
                carry = model.apply(
                    variables, carry, flow[:, i], s, method="warp",
                    normalize_scale=False, modulate=False,
                )
                if mode == "last":
                    eff = s
                else:
                    prod = s if prod is None else s * _warp_field(
                        model, prod, flow[:, i])
                    prod = _cascade_post(prod, mode)
                    eff = prod
                warped_steps.append(carry * eff.astype(carry.dtype))
        warped = jnp.stack(warped_steps, 1).reshape(
            B * (k - 1), *warped_steps[0].shape[1:]
        )
        ref_nonkey = model.apply(
            variables, warped, method="ref_scores_from_propagated"
        )
        ref_all = jnp.concatenate(
            [key_scores[:, None], ref_nonkey.reshape(B, k - 1, *ref_nonkey.shape[1:])],
            axis=1,
        )
    return _update_fuse_tail(model, variables, frames_g, ref_all, input_scale)


def _group_step(model, variables, frames_g, propagate: str, remat: bool = False,
                input_scale=None):
    """One keyframe group: frames_g (B, k, H, W, 3) -> logits (B, k, h, w, C).

    Step 0 is the keyframe (reference branch runs); steps 1..k-1 propagate
    by flow-warp. ``propagate``: 'incremental' (anchor = previous frame,
    Accel), 'direct' (anchor = keyframe, DFF), or 'composed' (per-step
    flows composed into one key->frame warp per frame — see
    ``_group_step_composed_batched``). Direct mode has no sequential
    dependence between non-key frames and takes the batched fast path.

    ``remat=True`` wraps the keyframe forward and every per-frame step in
    ``jax.checkpoint`` so a clip-objective backward holds only one frame's
    activations at a time (forwards are recomputed during backprop). It
    also forces the sequential form — the batched fast paths materialize
    all k-1 frames' activations at once, which is exactly what remat
    exists to avoid.
    """
    if not remat:
        if propagate == "direct":
            return _group_step_direct_batched(model, variables, frames_g,
                                              input_scale)
        if propagate == "composed":
            return _group_step_composed_batched(model, variables, frames_g,
                                                input_scale)
        return _group_step_incremental_batched(model, variables, frames_g,
                                               input_scale)
    B, k = frames_g.shape[:2]
    key_frame = frames_g[:, 0]
    if input_scale is not None:
        key_frame = key_frame * input_scale

    def key_fwd(v, frame):
        prop = model.apply(v, frame, method="ref_propagated")
        return prop, model.apply(v, prop, method="ref_scores_from_propagated")

    # Direct mode performs a single key->frame warp — there is no cascade,
    # so cascade interventions are vacuous and the sequential form must
    # match _group_step_direct_batched's plain semantics (before r5,
    # 'mean1'/'clamp' here _cascade_post-ed the SINGLE step's field, which
    # the batched direct path never does — advisor r4 low finding).
    cascade = (
        model.scale_cascade
        if model.use_scale_field and propagate != "direct"
        else "product"
    )

    def prop_step(v, carry, cur_rep, anchor_rep):
        # carry = (unmodulated tensor, cumulative scale product or None);
        # under scale_cascade='product' the product stays baked into the
        # tensor (reference semantics) and the second slot is unused
        flow, scale = _flow_from_reps(model, v, cur_rep, anchor_rep)
        if cascade == "product":
            warped = model.apply(v, carry[0], flow, scale, method="warp")
            scored, carry = warped, (warped, None)
        else:
            s = model.apply(v, scale, method="norm_scale")
            warped = model.apply(v, carry[0], flow, s, method="warp",
                                 normalize_scale=False, modulate=False)
            if cascade == "last":
                eff, prod = s, None
            else:
                prod = s if carry[1] is None else s * _warp_field(
                    model, carry[1], flow)
                prod = _cascade_post(prod, cascade)
                eff = prod
            scored, carry = warped * eff.astype(warped.dtype), (warped, prod)
        return carry, model.apply(v, scored, method="ref_scores_from_propagated")

    def prop_step_composed(v, prop_t, acc, cur_rep, anchor_rep):
        # carry = composed (flow, scale) fields; the propagated tensor is
        # warped fresh from the KEYFRAME each step (single resample)
        flow, scale = _flow_from_reps(model, v, cur_rep, anchor_rep)
        scale = model.apply(v, scale, method="norm_scale")
        if acc is None:
            acc_f, acc_s = flow, _cascade_post(scale, cascade)
        else:
            acc_f = flow + _warp_field(model, acc[0], flow)
            if cascade == "last":
                acc_s = scale
            else:
                acc_s = _cascade_post(
                    scale * _warp_field(model, acc[1], flow), cascade)
        warped = model.apply(
            v, prop_t, acc_f, acc_s, method="warp", normalize_scale=False,
            max_disp=int(model.warp_max_disp) * (frames_g.shape[1] - 1),
        )
        ref_s = model.apply(v, warped, method="ref_scores_from_propagated")
        return (acc_f, acc_s), ref_s

    def frame_output(v, ref_s, cur_frame):
        if model.family == "accel":
            upd = model.apply(v, cur_frame, method="update_scores")
            return model.apply(v, ref_s, upd, method="fuse")
        return ref_s

    if remat:
        key_fwd = jax.checkpoint(key_fwd)
        prop_step = jax.checkpoint(prop_step)
        prop_step_composed = jax.checkpoint(prop_step_composed)
        frame_output = jax.checkpoint(frame_output)

    prop, ref_scores = key_fwd(variables, key_frame)

    # FlowNet prologue for every frame once (each frame is both a 'cur'
    # and the next step's 'anchor')
    if k > 1 and model.family in ("dff", "accel"):
        rep = _group_flow_reps(model, variables, frames_g, input_scale)

    outs = [frame_output(variables, ref_scores, key_frame)]
    anchor_i = 0
    carry = (prop, None)  # (tensor, cumulative scale product — see prop_step)
    acc = None  # composed-mode field carry
    for i in range(1, k):
        cur = frames_g[:, i]
        if input_scale is not None:
            cur = cur * input_scale
        cur_rep = _rep_slice(rep, lambda a: a[:, i])
        anchor_rep = _rep_slice(rep, lambda a: a[:, anchor_i])
        if propagate == "composed":
            acc, ref_s = prop_step_composed(
                variables, prop, acc, cur_rep, anchor_rep)
            anchor_i = i
        else:
            new_carry, ref_s = prop_step(variables, carry, cur_rep, anchor_rep)
            if propagate == "incremental":
                carry = new_carry
                anchor_i = i
            # 'direct': carry/anchor stay the keyframe
        outs.append(frame_output(variables, ref_s, cur))
    return jnp.stack(outs, axis=1)


def clip_logits(
    model,
    variables,
    clip: jnp.ndarray,
    interval: int,
    propagate: str = "incremental",
    remat: bool = False,
    input_scale=None,
) -> jnp.ndarray:
    """clip (B, F, H, W, 3) normalized, F % interval == 0 ->
    stride-level logits (B, F, h, w, C).

    Scans over keyframe groups; the group interior is unrolled (interval is
    static and small) so there is no key/non-key lax.cond and the backbone
    runs exactly once per group (SURVEY.md §7 hard part 3).

    ``input_scale`` (scalar or None) multiplies each frame at its point of
    consumption instead of requiring the caller to materialize
    ``clip * scale`` — see ``_chunked_apply`` for why that matters at large
    clip batches.
    """
    B, F, H, W, _ = clip.shape
    k = int(interval)
    if model.family == "deeplab":
        k = 1  # every frame is a keyframe
    assert F % k == 0, f"clip length {F} not divisible by interval {k}"
    G = F // k
    groups = clip.reshape(B, G, k, H, W, 3).transpose(1, 0, 2, 3, 4, 5)

    if G == 1:
        out = _group_step(model, variables, groups[0], propagate, remat,
                          input_scale)
        return out.reshape(B, F, *out.shape[2:])

    def body(carry, frames_g):
        return carry, _group_step(model, variables, frames_g, propagate,
                                  remat, input_scale)

    _, outs = jax.lax.scan(body, 0, groups)  # (G, B, k, h, w, C)
    outs = outs.transpose(1, 0, 2, 3, 4, 5)
    return outs.reshape(B, F, *outs.shape[3:])


def clip_predictions(
    model,
    variables,
    clip: jnp.ndarray,
    interval: int,
    propagate: str = "incremental",
    full_res: bool = True,
    upsample: str = "bilinear_logits",
    input_scale=None,
) -> jnp.ndarray:
    """clip -> per-frame argmax class maps (B, F, H, W) uint8.

    ``upsample='bilinear_logits'`` matches the reference eval protocol:
    bilinear-upsample the 19-channel logits to input resolution, then argmax
    (SURVEY.md §3.3 step 7) — served by the fused Pallas kernel
    (`ops/upsample_argmax`) when shapes allow, which computes the same
    bilinear interpolation (weights extracted from resize itself, f32
    accumulation) without materializing the full-res 19-channel tensor.
    ``'bilinear_logits_xla'`` forces the materializing oracle.
    ``'nearest_pred'`` argmaxes at stride resolution and nearest-upsamples
    the class map — cheaper with a small boundary-pixel mIoU cost; a
    serving knob, not the eval default.
    """
    logits = clip_logits(model, variables, clip, interval, propagate,
                         input_scale=input_scale)
    B, F = logits.shape[:2]
    if not full_res:
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)
    H, W = clip.shape[2:4]

    if upsample == "nearest_pred":
        pred = jnp.argmax(logits, axis=-1).astype(jnp.uint8)  # (B,F,h,w)
        h, w = pred.shape[2:]
        pred = jnp.repeat(jnp.repeat(pred, H // h, axis=2), W // w, axis=3)
        return pred

    if upsample == "bilinear_logits":
        from accel_tpu.ops.upsample_argmax import upsample_argmax_or_oracle

        flat = logits.reshape(B * F, *logits.shape[2:])
        return upsample_argmax_or_oracle(flat, (H, W)).reshape(B, F, H, W)

    def up_argmax(lg):  # (B, h, w, C) one frame at a time to bound memory
        return jnp.argmax(resize_bilinear(lg, (H, W)), axis=-1).astype(jnp.uint8)

    return jax.lax.map(up_argmax, logits.transpose(1, 0, 2, 3, 4)).transpose(1, 0, 2, 3)
