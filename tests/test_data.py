"""Data-layer tests on a synthetic Cityscapes-format fixture tree
(SURVEY.md §4: 'mIoU integration test on a tiny fixture set... synthetic')."""

import os

import numpy as np
import pytest

from accel_tpu.config import default_config
from accel_tpu.data.cityscapes import ANNOTATED_FRAME, Cityscape, trainid_lut
from accel_tpu.data.image import map_labels, resize, tensor_vstack, transform
from accel_tpu.data.loader import TestClipLoader, TrainPairLoader
from accel_tpu.data.prefetch import PrefetchingIter

H, W = 128, 256


def _write_png(path, arr):
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    assert cv2.imwrite(path, arr)


@pytest.fixture(scope="module")
def cityscapes_fixture(tmp_path_factory):
    """2 cities x 2 snippets, 128x256 frames, full sequence dirs."""
    root = tmp_path_factory.mktemp("cs")
    data = root / "cityscapes"
    rng = np.random.default_rng(0)
    split = "val"
    for city in ["aachen", "bochum"]:
        for seq in range(2):
            base_frame = ANNOTATED_FRAME
            name = f"{city}_{seq:06d}_{base_frame:06d}"
            img = rng.integers(0, 255, (H, W, 3), np.uint8)
            _write_png(str(data / "leftImg8bit" / split / city / f"{name}_leftImg8bit.png"), img)
            # labelIds annotation: bands of real cityscapes label ids
            lab = np.zeros((H, W), np.uint8)
            lab[: H // 3] = 23   # sky -> train id 10
            lab[H // 3 : 2 * H // 3] = 7  # road -> 0
            lab[2 * H // 3 :] = 26  # car -> 13
            lab[:4, :4] = 0  # unlabeled -> 255
            _write_png(str(data / "gtFine" / split / city / f"{name}_gtFine_labelIds.png"), lab)
            for f in range(ANNOTATED_FRAME - 6, ANNOTATED_FRAME + 2):
                sname = f"{city}_{seq:06d}_{f:06d}"
                _write_png(
                    str(data / "leftImg8bit_sequence" / split / city / f"{sname}_leftImg8bit.png"),
                    rng.integers(0, 255, (H, W, 3), np.uint8),
                )
    return str(root), str(data)


def test_index_and_annotation(cityscapes_fixture):
    root, data = cityscapes_fixture
    ds = Cityscape("leftImg8bit_val", root, data)
    assert len(ds.segdb) == 4
    assert all(e["annotation"] for e in ds.segdb)
    lab = ds.load_annotation(ds.segdb[0])
    assert set(np.unique(lab)) == {0, 10, 13, 255}


def test_lut():
    lut = trainid_lut()
    assert lut[7] == 0 and lut[26] == 13 and lut[33] == 18
    assert lut[0] == 255 and lut[255] == 255
    lab = np.array([[7, 26], [0, 33]], np.uint8)
    np.testing.assert_array_equal(map_labels(lab, lut), [[0, 13], [255, 18]])


def test_sequence_frame_paths(cityscapes_fixture):
    root, data = cityscapes_fixture
    ds = Cityscape("leftImg8bit_val", root, data)
    e = ds.segdb[0]
    assert ds.sequence_frame(e, ANNOTATED_FRAME) == e["image"]
    prev = ds.sequence_frame(e, ANNOTATED_FRAME - 1)
    assert "leftImg8bit_sequence" in prev and os.path.exists(prev)
    assert ds.has_sequences()


def test_train_pair_loader(cityscapes_fixture):
    root, data = cityscapes_fixture
    ds = Cityscape("leftImg8bit_val", root, data)
    cfg = default_config()
    cfg.SCALES = [[128, 256]]
    cfg.TRAIN.BATCH_IMAGES = 2
    cfg.TRAIN.CROP_SIZE = [128, 128]
    loader = TrainPairLoader(ds, cfg, seed=0)
    batch = next(iter(loader))
    assert batch["data"].shape == (2, 128, 128, 3)
    assert batch["data_ref"].shape == (2, 128, 128, 3)
    assert batch["eq_flag"].shape == (2,)
    assert batch["label"].shape == (2, 128, 128)
    assert batch["data"].dtype == np.float32
    assert batch["label"].dtype == np.int32
    # normalization happened: mean roughly centered
    assert abs(batch["data"].mean()) < 30


def test_test_clip_loader(cityscapes_fixture):
    root, data = cityscapes_fixture
    ds = Cityscape("leftImg8bit_val", root, data)
    cfg = default_config()
    cfg.SCALES = [[128, 256]]
    cfg.TEST.KEY_FRAME_INTERVAL = 5
    loader = TestClipLoader(ds, cfg, batch_clips=2)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["clip"].shape == (2, 5, H, W, 3)
    assert b["label"].shape == (2, 5, H, W)
    # GT only on the annotated frame (last, with key_offset=0)
    assert b["ann_pos"] == 4
    assert (b["label"][:, :4] == 255).all()
    assert (b["label"][0, 4] != 255).any()


def test_evaluate_segmentations_perfect(cityscapes_fixture):
    root, data = cityscapes_fixture
    ds = Cityscape("leftImg8bit_val", root, data)
    preds = [ds.load_annotation(e) for e in ds.segdb]
    assert ds.evaluate_segmentations(preds) == 1.0


def test_resize_and_vstack():
    im = np.random.default_rng(0).integers(0, 255, (100, 200, 3), np.uint8)
    out, scale = resize(im, 50, 1000)
    assert out.shape[:2] == (50, 100) and scale == 0.5
    out2, scale2 = resize(im, 150, 200)  # capped by max_size
    assert out2.shape[:2] == (100, 200)
    a = np.ones((1, 4, 4), np.float32)
    b = np.ones((1, 6, 2), np.float32)
    v = tensor_vstack([a, b])
    assert v.shape == (2, 6, 4)


def test_transform_roundtrip():
    from accel_tpu.data.image import transform_inverse

    im = np.random.default_rng(1).integers(0, 255, (8, 8, 3), np.uint8)
    t = transform(im, [103.06, 115.9, 123.15])
    assert t.shape == (1, 8, 8, 3)
    back = transform_inverse(t, [103.06, 115.9, 123.15])
    np.testing.assert_allclose(back, im, atol=1)


def test_prefetching_iter():
    def gen():
        for i in range(5):
            yield i

    out = list(PrefetchingIter(gen(), depth=2, transform=lambda x: x * 2))
    assert out == [0, 2, 4, 6, 8]


def test_prefetching_iter_propagates_error():
    def gen():
        yield 1
        raise ValueError("boom")

    it = PrefetchingIter(gen())
    assert next(it) == 1
    with pytest.raises(ValueError):
        next(it)


def test_train_clip_loader(cityscapes_fixture):
    from accel_tpu.data.loader import TrainClipLoader

    root, data = cityscapes_fixture
    ds = Cityscape("leftImg8bit_val", root, data)
    cfg = default_config()
    cfg.SCALES = [[128, 256]]
    cfg.TRAIN.BATCH_IMAGES = 2
    cfg.TRAIN.CLIP_LENGTH = 4
    cfg.TRAIN.CROP_SIZE = [128, 128]
    loader = TrainClipLoader(ds, cfg, seed=3)
    batch = next(iter(loader))
    assert batch["clip"].shape == (2, 4, 128, 128, 3)
    assert batch["label"].shape == (2, 4, 128, 128)
    assert batch["clip"].dtype == np.float32
    for b in range(2):
        ann_frames = [(batch["label"][b, f] != 255).any() for f in range(4)]
        assert sum(ann_frames) == 1, "exactly one annotated frame per clip"


def test_clip_loader_scales_carries_native_gt(cityscapes_fixture):
    """When SCALES resizes, items must carry the NATIVE-resolution GT so
    eval scores at GT res (reference protocol: predictions upsampled to GT,
    not GT downsampled to predictions)."""
    root, data = cityscapes_fixture
    ds = Cityscape("leftImg8bit_val", root, data)
    cfg = default_config()
    cfg.SCALES = [[64, 128]]  # half the fixture's native 128x256
    cfg.TEST.KEY_FRAME_INTERVAL = 3
    loader = TestClipLoader(ds, cfg, batch_clips=2)
    b = next(iter(loader))
    # frames scaled to 64x128, padded to the 128 multiple
    assert b["clip"].shape == (2, 3, 128, 128, 3)
    assert "label_native" in b and len(b["label_native"]) == 2
    ann, scaled_hw = b["label_native"][0]
    assert ann.shape == (H, W) and tuple(scaled_hw) == (64, 128)
    # device-side label is still the scaled nearest GT (static shapes)
    assert b["label"].shape == (2, 3, 128, 128)

    # identity SCALES -> no native payload
    cfg.SCALES = [[H, W]]
    assert "label_native" not in next(iter(TestClipLoader(ds, cfg, batch_clips=2)))


def test_pred_eval_clips_scores_at_native_gt_res(cityscapes_fixture, tiny_accel):
    """pred_eval_clips under a resizing SCALES must equal a hand-computed
    native-res scoring of the same predictions (crop padding, nearest-resize
    pred to GT shape, confusion at GT res)."""
    import jax

    from accel_tpu.core.metrics import SegConfusionAccumulator
    from accel_tpu.core.pipeline import clip_predictions
    from accel_tpu.core.predictor import pred_eval_clips
    from accel_tpu.data.image import resize_to

    root, data = cityscapes_fixture
    ds = Cityscape("leftImg8bit_val", root, data)
    m, variables = tiny_accel
    cfg = default_config()
    cfg.SCALES = [[64, 128]]
    cfg.TEST.KEY_FRAME_INTERVAL = 3
    loader = TestClipLoader(ds, cfg, batch_clips=2)
    items = list(loader)

    miou, iou, _ = pred_eval_clips(
        m, variables, iter(items), 19, 3, "direct")

    run = jax.jit(lambda v, c: clip_predictions(m, v, c, 3, "direct"))
    acc = SegConfusionAccumulator(19)
    for item in items:
        preds = np.asarray(run(variables, item["clip"]))
        for b2, nat in enumerate(item["label_native"]):
            if nat is None:
                continue
            ann, shw = nat
            p = preds[b2, int(item["ann_pos"]), : shw[0], : shw[1]]
            p = resize_to(p, *ann.shape, interp="nearest")
            acc.update(p[None], ann[None])
    expect_miou, _ = acc.result()
    assert miou == pytest.approx(expect_miou, abs=1e-9)


def test_generator_covers_post_annotated_frames(tmp_path):
    """The synthetic generator must write sequence frames THROUGH
    annotated+k-1: clip training with ann_pos < k-1 and the offset sweep
    with offset < k-1 place clip frames after the annotated one (real
    Cityscapes snippets run to annotated+9). A missing frame silently
    degrades to a static fallback, corrupting cascade supervision."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_synthetic_dataset as gen

    import functools

    rng = np.random.default_rng(0)
    for writer, style in (
        (gen.write_snippet, "bands"),
        (gen.write_snippet_hard, "hard"),
        (functools.partial(gen.write_snippet_hard, motion=6.0, pan=8.0,
                           n_occluders=2), "extreme"),
        (functools.partial(gen.write_snippet_hard, motion=3.0, pan=4.0,
                           n_occluders=2, failure=True), "failure"),
    ):
        out = str(tmp_path / style)
        writer(out, "train", "c", 0, 64, 128, rng)
        seq_dir = os.path.join(out, "leftImg8bit_sequence", "train", "c")
        frames = sorted(int(f.split("_")[2]) for f in os.listdir(seq_dir))
        # k=10 interval ladder: keyframe up to annotated-9, clip frames
        # through annotated+9 (the real snippet range)
        assert min(frames) <= ANNOTATED_FRAME - 9
        assert max(frames) >= ANNOTATED_FRAME + 9, (
            f"{style}: sequence ends at {max(frames)}; the k=10 offset "
            f"sweep needs frames through {ANNOTATED_FRAME + 9}"
        )
