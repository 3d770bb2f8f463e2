#!/usr/bin/env python
"""Generate a synthetic Cityscapes-format dataset tree (for smoke tests,
demos, and CI on machines without the real data; SURVEY.md §4 fixture
strategy).

Two styles:

- ``bands`` — three colored horizontal bands, global translation. Trivially
  separable (round-1 models hit 99.8 mIoU); kept for smoke tests.
- ``hard`` — the discriminative accuracy protocol (VERDICT r1 #6): 10
  classes, per-class procedural *texture* (overlapping color statistics, so
  color alone can't separate them), multiple independently-moving occluding
  objects over a panning background, per-frame lighting flicker. Designed
  so val mIoU lands mid-range (60-90) and degrades with keyframe offset —
  mIoU-vs-offset curves (paper protocol, SURVEY.md Appendix B) become
  informative instead of ceiling-saturated.
- ``extreme`` — the propagation-stressing protocol (VERDICT r2 #3): same
  classes/textures as ``hard`` but with 6x object motion (8-24 px/frame —
  a 4-frame direct warp must span up to ~6 feature-stride-16 pixels),
  camera pans of similar magnitude, and extra large fast occluders that
  cover and UNCOVER class regions (disocclusion is unrecoverable by
  warping — the regime Accel's corrective fusion exists for). This is the
  set where the warp ``max_disp`` clamp and the Accel-vs-DFF ordering
  become measurable.

Usage: python tools/make_synthetic_dataset.py --out /tmp/cs_synth \
           [--style hard] [--snippets 4] [--height 256] [--width 512] \
           [--splits train,val]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def write_snippet(data_dir, split, city, seq, H, W, rng, back=12, fwd=9):
    import cv2

    from accel_tpu.data.cityscapes import ANNOTATED_FRAME

    # class-correlated appearance: each label band gets a distinct base
    # color + noise, so a trained model generalizes across images instead
    # of having to memorize pure noise
    band_colors = np.array([[180, 130, 70], [90, 90, 90], [40, 40, 160]], np.float32)
    base = np.empty((H, W, 3), np.float32)
    base[: H // 3] = band_colors[0]
    base[H // 3 : 2 * H // 3] = band_colors[1]
    base[2 * H // 3 :] = band_colors[2]
    base = base + rng.normal(0, 30, (H, W, 3))
    base = np.clip(base, 0, 255).astype(np.uint8)
    name = f"{city}_{seq:06d}_{ANNOTATED_FRAME:06d}"

    def put(path, arr):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        assert cv2.imwrite(path, arr)

    # annotated frame + label (banded real Cityscapes labelIds)
    put(os.path.join(data_dir, "leftImg8bit", split, city, f"{name}_leftImg8bit.png"), base)
    lab = np.zeros((H, W), np.uint8)
    lab[: H // 3] = 23  # sky
    lab[H // 3 : 2 * H // 3] = 7  # road
    lab[2 * H // 3 :] = 26  # car
    put(os.path.join(data_dir, "gtFine", split, city, f"{name}_gtFine_labelIds.png"), lab)
    # sequence frames around the annotated one (simple translating motion)
    # cover [ANNOTATED-back, ANNOTATED+fwd]: clip sampling and the offset
    # sweep place clips up to k-1 frames AFTER the annotated one (real
    # Cityscapes snippets run to frame 29, i.e. annotated+9)
    for fidx in range(ANNOTATED_FRAME - back, ANNOTATED_FRAME + fwd + 1):
        sname = f"{city}_{seq:06d}_{fidx:06d}"
        frame = np.roll(base, shift=2 * (fidx - ANNOTATED_FRAME), axis=1)
        put(
            os.path.join(
                data_dir, "leftImg8bit_sequence", split, city, f"{sname}_leftImg8bit.png"
            ),
            frame,
        )


# ---------------------------------------------------------------------------
# hard style
# ---------------------------------------------------------------------------

# (cityscapes labelId, base BGR color, texture frequency cycles/px, orientation)
# Colors deliberately overlap between classes — the separating signal is the
# texture (frequency/orientation), which needs real receptive fields.
_HARD_CLASSES = [
    (23, (170, 120, 80), 0.02, 0.0),    # sky        — low-freq horizontal
    (11, (100, 100, 110), 0.12, 0.0),   # building   — brick-ish horizontal
    (7, (95, 95, 95), 0.05, 1.57),      # road       — near building color!
    (21, (60, 140, 60), 0.18, 0.8),     # vegetation — high freq diagonal
    (26, (90, 90, 160), 0.10, 1.57),    # car        — vertical stripes
    (24, (80, 90, 150), 0.22, 0.4),     # person     — near car color!
    (17, (120, 120, 120), 0.30, 1.57),  # pole       — fine vertical
    (20, (100, 160, 160), 0.15, 2.2),   # traffic sign
    (28, (110, 85, 150), 0.07, 0.9),    # bus        — near car/person hue
    (33, (70, 110, 110), 0.26, 1.9),    # bicycle
]


def _texture(cls_idx, yy, xx, phase, H):
    """Procedural class texture: oriented sinusoid grating in [0, 1]."""
    _, _, freq, theta = _HARD_CLASSES[cls_idx]
    u = np.cos(theta) * xx + np.sin(theta) * yy
    v = -np.sin(theta) * xx + np.cos(theta) * yy
    g = 0.5 + 0.35 * np.sin(2 * np.pi * freq * u + phase)
    g += 0.15 * np.sin(2 * np.pi * freq * 2.7 * v + 1.3 * phase)
    return g


def _object_geometry(ob, t):
    """Object mask parameters at time ``t`` — the 'failure' style adds
    non-rigid terms (pulsating radii, texture/mask rotation) that a
    translation-field flow cannot represent exactly."""
    cy = ob["cy"] + ob["vy"] * t
    cx = ob["cx"] + ob["vx"] * t
    ry, rx = ob["ry"], ob["rx"]
    if ob.get("deform", 0.0):
        a, w0, ph = ob["deform"], ob["deform_w"], ob["deform_phase"]
        ry = ry * (1.0 + a * np.sin(w0 * t + ph))
        rx = rx * (1.0 + a * np.sin(w0 * t + ph + 2.1))
    rot = ob.get("rot", 0.0) * t
    return cy, cx, ry, rx, rot


def _paint_object(img, lab, ob, t, yy, xx, H):
    cls_idx = ob["cls"]
    labelid, color, _, _ = _HARD_CLASSES[cls_idx]
    cy, cx, ry, rx, rot = _object_geometry(ob, t)
    dy, dx = yy - cy, xx - cx
    if rot:
        c, s = np.cos(rot), np.sin(rot)
        dy, dx = c * dy - s * dx, s * dy + c * dx
    if ob["shape"] == "ellipse":
        mask = (dy / ry) ** 2 + (dx / rx) ** 2 <= 1.0
    else:
        mask = (np.abs(dy) <= ry) & (np.abs(dx) <= rx)
    # texture in OBJECT coordinates so it translates rigidly with the
    # object (warpable by flow) rather than shimmering in place; under
    # rotation the texture rotates WITH the mask (spatially-varying flow)
    g = _texture(cls_idx, dy, dx, ob["phase"], H)
    img[mask] = (np.asarray(color, np.float32) * g[..., None])[mask]
    lab[mask] = labelid
    return mask


def _render_hard(H, W, objects, bg_rows, t, rng, flicker, pan=1.5,
                 reveal_gain=0.0):
    """Render frame at time offset ``t`` (0 = annotated frame). Returns
    (image uint8 BGR, label uint8 labelIds). Objects move independently and
    occlude in z-order; background pans horizontally at ``pan`` px/frame.

    Failure-style extensions (all off by default):
    - per-object ``blur_steps`` renders the object as the mean of sub-frame
      positions over [t-1, t] (motion blur — destroys the sharp texture the
      flow matcher needs exactly on the fast movers);
    - per-object ``rot``/``deform`` make the motion non-rigid;
    - ``reveal_gain`` != 0 re-lights pixels an occluder uncovered since the
      previous frame (appearance change at disocclusion: the revealed
      content does NOT match what a warp from any earlier frame predicts).
    """
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.zeros((H, W, 3), np.float32)
    lab = np.zeros((H, W), np.uint8)

    # background: 3 panning textured bands (sky / building / road)
    bg_shift = pan * t
    for (cls_idx, y0, y1) in bg_rows:
        labelid, color, _, _ = _HARD_CLASSES[cls_idx]
        g = _texture(cls_idx, yy[y0:y1], xx[y0:y1] + bg_shift, 0.0, H)
        img[y0:y1] = np.asarray(color, np.float32) * g[..., None]
        lab[y0:y1] = labelid

    # objects: back-to-front
    reveal = np.zeros((H, W), bool)
    for ob in objects:
        steps = int(ob.get("blur_steps", 0))
        if steps > 1:
            # motion blur: label from the end-of-exposure position, image
            # as the average over the exposure window (sub-frame samples)
            acc = np.zeros_like(img)
            for si in range(steps):
                sub = img.copy()
                _paint_object(sub, lab.copy(), ob, t - si / steps, yy, xx, H)
                acc += sub
            mask = _paint_object(img, lab, ob, t, yy, xx, H)
            img = acc / steps
            # keep the sharp end position's pixels at 1/steps weight — the
            # average already contains them once
        else:
            mask = _paint_object(img, lab, ob, t, yy, xx, H)
        if reveal_gain and ob.get("occluder"):
            prev = np.zeros((H, W, 3), np.float32)
            pmask = _paint_object(prev, np.zeros((H, W), np.uint8), ob,
                                  t - 1, yy, xx, H)
            reveal |= pmask & ~mask

    if reveal_gain:
        img[reveal] *= (1.0 + reveal_gain)

    # lighting flicker + sensor noise (stresses propagation + update branch)
    gain = 1.0 + flicker * t
    img = img * gain + rng.normal(0, 8, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8), lab


def write_snippet_hard(data_dir, split, city, seq, H, W, rng, back=12, fwd=9,
                       motion=1.0, pan=None, n_occluders=0, failure=False):
    """``motion`` scales object velocities (1.0 = the hard protocol's
    <=4 px/frame); ``pan`` is the background pan speed in px/frame (default
    the hard protocol's 1.5, sign randomized when given); ``n_occluders``
    adds large FAST foreground objects whose sweep covers and uncovers
    class regions (disocclusion — unrecoverable by warping).

    ``failure=True`` adds the flow-FAILURE modes (VERDICT r3 #3 — the
    extreme battery measured that coherent rigid motion, even 24 px/frame,
    is easy flow; fusion's win requires flow *failure*):
    - non-rigid motion: objects rotate (texture + mask) and pulsate;
    - motion blur on the fastest movers (exposure-window average);
    - thin structures: 2-4 px poles and 1-2 px wires, moving;
    - appearance change at disocclusion (revealed pixels re-lit)."""
    import cv2

    from accel_tpu.data.cityscapes import ANNOTATED_FRAME

    def put(path, arr):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        assert cv2.imwrite(path, arr)

    # background bands: sky / building / road with a jittered horizon
    h1 = int(H * rng.uniform(0.2, 0.35))
    h2 = int(H * rng.uniform(0.55, 0.75))
    bg_rows = [(0, 0, h1), (1, h1, h2), (2, h2, H)]

    n_obj = int(rng.integers(6, 11))
    objects = []
    for _ in range(n_obj):
        cls_idx = int(rng.integers(3, len(_HARD_CLASSES)))  # fg classes
        ob = {
            "cls": cls_idx,
            "cy": float(rng.uniform(0.15 * H, 0.9 * H)),
            "cx": float(rng.uniform(0.1 * W, 0.9 * W)),
            "ry": float(rng.uniform(H / 14, H / 4)),
            "rx": float(rng.uniform(W / 24, W / 6)),
            # hard: up to ~4 px/frame — at keyframe offset 4 that is a
            # 16 px displacement; extreme (motion=6): up to 24 px/frame
            "vy": float(rng.uniform(-2.5, 2.5)) * motion,
            "vx": float(rng.uniform(-4.0, 4.0)) * motion,
            "phase": float(rng.uniform(0, 6.28)),
            "shape": "ellipse" if rng.random() < 0.5 else "box",
        }
        if failure:
            # every object non-rigid: rotation up to ~0.2 rad/frame and
            # radius pulsation up to 25% — neither is a translation field
            ob["rot"] = float(rng.uniform(-0.2, 0.2))
            ob["deform"] = float(rng.uniform(0.1, 0.25))
            ob["deform_w"] = float(rng.uniform(0.5, 1.2))
            ob["deform_phase"] = float(rng.uniform(0, 6.28))
            if abs(ob["vx"]) + abs(ob["vy"]) > 3.5 * motion:
                ob["blur_steps"] = 3  # exposure blur on the fast movers
        objects.append(ob)
    if failure:
        # thin structures: stride-16 features + bilinear warp cannot
        # preserve 1-4 px content; the update branch sees them every frame
        for _ in range(int(rng.integers(3, 6))):
            vertical = rng.random() < 0.6
            objects.append(
                {
                    "cls": 6 if vertical else 7,  # pole / traffic sign
                    "cy": float(rng.uniform(0.25 * H, 0.75 * H)),
                    "cx": float(rng.uniform(0.1 * W, 0.9 * W)),
                    "ry": float(rng.uniform(H / 5, H / 2.5)) if vertical
                    else float(rng.uniform(0.5, 1.0)),
                    "rx": float(rng.uniform(1.0, 2.0)) if vertical
                    else float(rng.uniform(W / 10, W / 4)),
                    "vy": float(rng.uniform(-1.5, 1.5)) * motion,
                    "vx": float(rng.uniform(-2.5, 2.5)) * motion,
                    "phase": float(rng.uniform(0, 6.28)),
                    "shape": "box",
                }
            )
    for _ in range(n_occluders):
        # big, fast, frontmost: sweeps across mid-frame covering and
        # uncovering whatever lies behind it
        cls_idx = int(rng.integers(3, len(_HARD_CLASSES)))
        direction = 1.0 if rng.random() < 0.5 else -1.0
        ob = {
            "cls": cls_idx,
            "cy": float(rng.uniform(0.3 * H, 0.7 * H)),
            "cx": float(rng.uniform(0.2 * W, 0.8 * W)),
            "ry": float(rng.uniform(H / 6, H / 3)),
            "rx": float(rng.uniform(W / 10, W / 5)),
            "vy": float(rng.uniform(-4.0, 4.0)) * motion / 2,
            "vx": direction * float(rng.uniform(3.0, 4.0)) * motion,
            "phase": float(rng.uniform(0, 6.28)),
            "shape": "ellipse" if rng.random() < 0.5 else "box",
            "occluder": True,
        }
        if failure:
            ob["blur_steps"] = 3
            ob["rot"] = float(rng.uniform(-0.15, 0.15))
        objects.append(ob)
    if pan is None:
        pan = 1.5
    else:
        pan = float(pan) * (1.0 if rng.random() < 0.5 else -1.0)
    flicker = float(rng.uniform(-0.02, 0.02))
    reveal_gain = float(rng.uniform(0.25, 0.45)) if failure else 0.0

    # per-frame rng derived from a snippet seed + frame index: frame
    # content is then independent of the covered range, so extending
    # back/fwd adds frames without reshuffling existing ones
    noise_seed = int(rng.integers(0, 2**31))

    def frame_rng(fidx):
        return np.random.default_rng((noise_seed, fidx))

    name = f"{city}_{seq:06d}_{ANNOTATED_FRAME:06d}"
    img0, lab0 = _render_hard(
        H, W, objects, bg_rows, 0, frame_rng(ANNOTATED_FRAME), flicker, pan,
        reveal_gain,
    )
    put(os.path.join(data_dir, "leftImg8bit", split, city, f"{name}_leftImg8bit.png"), img0)
    put(os.path.join(data_dir, "gtFine", split, city, f"{name}_gtFine_labelIds.png"), lab0)
    for fidx in range(ANNOTATED_FRAME - back, ANNOTATED_FRAME + fwd + 1):
        frame, _ = _render_hard(
            H, W, objects, bg_rows, fidx - ANNOTATED_FRAME, frame_rng(fidx),
            flicker, pan, reveal_gain,
        )
        sname = f"{city}_{seq:06d}_{fidx:06d}"
        put(
            os.path.join(
                data_dir, "leftImg8bit_sequence", split, city, f"{sname}_leftImg8bit.png"
            ),
            frame,
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--style", choices=["bands", "hard", "extreme", "failure"],
                    default="bands")
    ap.add_argument("--snippets", type=int, default=4)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--splits", default="train,val")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    data_dir = os.path.join(args.out, "cityscapes")

    def writer(*a):
        if args.style == "bands":
            return write_snippet(*a)
        if args.style == "hard":
            return write_snippet_hard(*a)
        if args.style == "extreme":
            # extreme: 6x motion (8-24 px/frame), 6-12 px/frame camera pan,
            # 2-3 large fast occluders per snippet
            return write_snippet_hard(
                *a, motion=6.0, pan=float(rng.uniform(6, 12)),
                n_occluders=int(rng.integers(2, 4)),
            )
        # failure: moderate motion (the extreme battery proved magnitude
        # alone is easy flow) but flow-BREAKING content — non-rigid
        # rotation/pulsation, motion blur, thin structures, appearance
        # change at disocclusion (the regime corrective fusion exists for)
        return write_snippet_hard(
            *a, motion=3.0, pan=float(rng.uniform(2, 6)),
            n_occluders=int(rng.integers(2, 4)), failure=True,
        )

    for split in args.splits.split(","):
        for s in range(args.snippets):
            writer(data_dir, split, "synthcity", s, args.height, args.width, rng)
    print(f"synthetic cityscapes tree ({args.style}) at {data_dir}")


if __name__ == "__main__":
    main()
