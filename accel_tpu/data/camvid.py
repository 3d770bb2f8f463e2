"""CamVid dataset (11 classes).

Reference counterpart: ``lib/dataset/camvid.py`` (SURVEY.md §2) — same imdb
pattern as Cityscapes with 11 classes and a flat {split}/{split}annot layout
(the common CamVid-11 distribution: images in ``{split}/``, labels already
as class indices in ``{split}annot/``).
"""

from __future__ import annotations

import glob
import os

import numpy as np

from accel_tpu.data.imdb import IMDB

CLASS_NAMES = [
    "sky", "building", "pole", "road", "pavement", "tree",
    "sign", "fence", "car", "pedestrian", "bicyclist",
]


class CamVid(IMDB):
    def __init__(self, image_set: str, root_path: str, dataset_path: str):
        super().__init__("camvid", image_set, root_path, dataset_path)
        self.split = image_set
        self.num_classes = 11
        self.class_names = CLASS_NAMES
        self.segdb = self.gt_segdb()

    def gt_segdb(self) -> list[dict]:
        def build():
            img_dir = os.path.join(self.data_path, self.split)
            ann_dir = os.path.join(self.data_path, self.split + "annot")
            entries = []
            for img in sorted(glob.glob(os.path.join(img_dir, "*.png"))):
                name = os.path.basename(img)
                ann = os.path.join(ann_dir, name)
                entries.append(
                    {
                        "image": img,
                        "annotation": ann if os.path.exists(ann) else None,
                        "base": name[:-4],
                        "height": 720,
                        "width": 960,
                    }
                )
            return entries

        return self._load_cached("gt_segdb", build)

    def load_image(self, path: str) -> np.ndarray:
        import cv2

        im = cv2.imread(path, cv2.IMREAD_COLOR)
        if im is None:
            raise FileNotFoundError(path)
        return im

    def load_annotation(self, entry: dict) -> np.ndarray:
        import cv2

        lab = cv2.imread(entry["annotation"], cv2.IMREAD_UNCHANGED)
        if lab is None:
            raise FileNotFoundError(entry["annotation"])
        if lab.ndim == 3:
            lab = lab[:, :, 0]
        out = lab.astype(np.uint8)
        out[out >= self.num_classes] = 255
        return out
