"""Cityscapes dataset (19 train classes, video sequences).

Reference counterpart: ``lib/dataset/cityscape*.py`` (SURVEY.md §2):
index from ``leftImg8bit/`` + ``gtFine/`` with the standard labelId->trainId
LUT (255 ignore); video frame pairs/clips from ``leftImg8bit_sequence/``
where ground truth exists only on frame index 19 (the 20th) of each 30-frame
snippet (SURVEY.md Appendix B eval protocol).
"""

from __future__ import annotations

import glob
import os

import numpy as np

from accel_tpu.data.imdb import IMDB

# standard Cityscapes labelId -> trainId (19 classes, 255 = ignore)
_ID_MAP = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}

CLASS_NAMES = [
    "road", "sidewalk", "building", "wall", "fence", "pole",
    "traffic light", "traffic sign", "vegetation", "terrain", "sky",
    "person", "rider", "car", "truck", "bus", "train", "motorcycle",
    "bicycle",
]

ANNOTATED_FRAME = 19  # 0-indexed; GT on the 20th frame of each 30-frame snippet
SNIPPET_LEN = 30


def trainid_lut() -> np.ndarray:
    lut = np.full(256, 255, np.uint8)
    for k, v in _ID_MAP.items():
        lut[k] = v
    return lut


def _imread(path: str) -> np.ndarray:
    import cv2

    im = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if im is None:
        raise FileNotFoundError(path)
    return im


class Cityscape(IMDB):
    """image_set: '{leftImg8bit_}train' / 'val' / 'test' (reference naming)."""

    def __init__(self, image_set: str, root_path: str, dataset_path: str):
        split = image_set.replace("leftImg8bit_", "")
        super().__init__("cityscape", split, root_path, dataset_path)
        self.split = split
        self.num_classes = 19
        self.class_names = CLASS_NAMES
        self.lut = trainid_lut()
        self.segdb = self.gt_segdb()

    # ---- index -----------------------------------------------------------

    def gt_segdb(self) -> list[dict]:
        def build():
            img_dir = os.path.join(self.data_path, "leftImg8bit", self.split)
            pattern = os.path.join(img_dir, "*", "*_leftImg8bit.png")
            entries = []
            for img in sorted(glob.glob(pattern)):
                base = os.path.basename(img)[: -len("_leftImg8bit.png")]
                city = base.split("_")[0]
                ann = os.path.join(
                    self.data_path, "gtFine", self.split, city,
                    base + "_gtFine_labelIds.png",
                )
                entries.append(
                    {
                        "image": img,
                        "annotation": ann if os.path.exists(ann) else None,
                        "base": base,
                        "city": city,
                        "height": 1024,
                        "width": 2048,
                    }
                )
            return entries

        return self._load_cached("gt_segdb", build)

    def sequence_frame(self, entry: dict, frame_idx: int) -> str:
        """Path of frame ``frame_idx`` (0..29) of the entry's video snippet.

        The annotated frame (ANNOTATED_FRAME) of the snippet is the entry's
        image; other frames live in leftImg8bit_sequence/.
        """
        city, seq, frame = entry["base"].split("_")[:3]
        target = int(frame) - ANNOTATED_FRAME + frame_idx
        name = f"{city}_{seq}_{target:06d}_leftImg8bit.png"
        if frame_idx == ANNOTATED_FRAME:
            return entry["image"]
        return os.path.join(
            self.data_path, "leftImg8bit_sequence", self.split, city, name
        )

    def has_sequences(self) -> bool:
        return os.path.isdir(os.path.join(self.data_path, "leftImg8bit_sequence"))

    # ---- IO ----------------------------------------------------------------

    def load_image(self, path: str) -> np.ndarray:
        """BGR uint8 HWC (cv2 convention, matching reference PIXEL_MEANS)."""
        im = _imread(path)
        if im.ndim == 2:
            im = np.stack([im] * 3, -1)
        return im[:, :, :3]

    def load_annotation(self, entry: dict) -> np.ndarray:
        from accel_tpu.data.image import map_labels

        assert entry["annotation"], f"no annotation for {entry['image']}"
        return map_labels(_imread(entry["annotation"]), self.lut)
