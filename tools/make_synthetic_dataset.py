#!/usr/bin/env python
"""Generate a synthetic Cityscapes-format dataset tree (for smoke tests,
demos, and CI on machines without the real data; SURVEY.md §4 fixture
strategy).

Usage: python tools/make_synthetic_dataset.py --out /tmp/cs_synth \
           [--snippets 4] [--height 256] [--width 512] [--split train]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def write_snippet(data_dir, split, city, seq, H, W, rng, seq_frames=8):
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
    for i in range(seq_frames):
        fidx = ANNOTATED_FRAME - (seq_frames - 2) + i
        sname = f"{city}_{seq:06d}_{fidx:06d}"
        frame = np.roll(base, shift=2 * (fidx - ANNOTATED_FRAME), axis=1)
        put(
            os.path.join(
                data_dir, "leftImg8bit_sequence", split, city, f"{sname}_leftImg8bit.png"
            ),
            frame,
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--snippets", type=int, default=4)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--splits", default="train,val")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    data_dir = os.path.join(args.out, "cityscapes")
    for split in args.splits.split(","):
        for s in range(args.snippets):
            write_snippet(data_dir, split, "synthcity", s, args.height, args.width, rng)
    print(f"synthetic cityscapes tree at {data_dir}")


if __name__ == "__main__":
    main()
