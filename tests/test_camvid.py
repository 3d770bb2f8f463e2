"""CamVid dataset coverage on a synthetic flat-layout fixture
(images in {split}/, index labels in {split}annot/)."""

import os

import numpy as np
import pytest

from accel_tpu.config import default_config
from accel_tpu.data.camvid import CamVid
from accel_tpu.data.loader import TestClipLoader, TrainPairLoader


@pytest.fixture(scope="module")
def camvid_fixture(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("cv")
    data = root / "camvid"
    rng = np.random.default_rng(0)
    H, W = 128, 128
    for split in ("train", "val"):
        for i in range(3):
            img = rng.integers(0, 255, (H, W, 3), np.uint8)
            lab = np.zeros((H, W), np.uint8)
            lab[H // 2 :] = 3  # road
            lab[:4] = 11  # void -> mapped to 255
            os.makedirs(data / split, exist_ok=True)
            os.makedirs(data / f"{split}annot", exist_ok=True)
            assert cv2.imwrite(str(data / split / f"{i:04d}.png"), img)
            assert cv2.imwrite(str(data / f"{split}annot" / f"{i:04d}.png"), lab)
    return str(root), str(data)


def test_camvid_index_and_labels(camvid_fixture):
    root, data = camvid_fixture
    ds = CamVid("val", root, data)
    assert len(ds.segdb) == 3
    assert ds.num_classes == 11
    lab = ds.load_annotation(ds.segdb[0])
    assert set(np.unique(lab)) == {0, 3, 255}  # class >= 11 -> ignore


def test_camvid_loaders(camvid_fixture):
    root, data = camvid_fixture
    ds = CamVid("train", root, data)
    cfg = default_config()
    cfg.SCALES = [[128, 128]]
    cfg.dataset.NUM_CLASSES = 11
    cfg.TRAIN.BATCH_IMAGES = 2
    cfg.TRAIN.CROP_SIZE = [128, 128]
    batch = next(iter(TrainPairLoader(ds, cfg, seed=0)))
    assert batch["data"].shape == (2, 128, 128, 3)
    # no sequence dir -> eq pairs
    assert (batch["eq_flag"] == 1.0).all()

    cfg.TEST.KEY_FRAME_INTERVAL = 3
    b = next(iter(TestClipLoader(ds, cfg, batch_clips=1)))
    assert b["clip"].shape == (1, 3, 128, 128, 3)


def test_camvid_eval_perfect(camvid_fixture):
    root, data = camvid_fixture
    ds = CamVid("val", root, data)
    preds = [ds.load_annotation(e) for e in ds.segdb]
    assert ds.evaluate_segmentations(preds) == 1.0
