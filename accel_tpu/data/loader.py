"""Train/test data loaders.

Reference counterparts (SURVEY.md §2): ``<net>/core/loader.py`` —
``TrainDataLoader`` samples (keyframe, current) pairs from the video
sequences with a random offset and emits ``data``, ``data_ref``,
``eq_flag``, ``label``; ``TestDataLoader`` walks video frames with the
keyframe schedule. Host side is pure numpy (+ the native extension);
device transfer/sharding happens in the caller or the prefetcher.
"""

from __future__ import annotations

import numpy as np

from accel_tpu.data.image import resize, resize_to, transform


def _apply_scales(im: np.ndarray, scales, interp: str = "bilinear"):
    """Short-side resize per the reference's SCALES config ([target, max]).
    Identity when the image already satisfies the target."""
    if not scales:
        return im
    target, max_size = int(scales[0][0]), int(scales[0][1])
    h, w = im.shape[:2]
    if min(h, w) == target and max(h, w) <= max_size:
        return im
    out, _ = resize(im, target, max_size, interp)
    return out


def _pad_to_multiple(im: np.ndarray, mult: int, value: float = 0.0) -> np.ndarray:
    h, w = im.shape[:2]
    ph = (-h) % mult
    pw = (-w) % mult
    if ph == 0 and pw == 0:
        return im
    pad = [(0, ph), (0, pw)] + [(0, 0)] * (im.ndim - 2)
    return np.pad(im, pad, constant_values=value)


class TrainPairLoader:
    """Yields pair batches for the (key, cur) training objective.

    Batch dict: 'data' (N,H,W,3) f32, 'data_ref' (N,H,W,3) f32,
    'eq_flag' (N,) f32, 'label' (N,H,W) int32 (255 ignore).

    Pairs: cur = the annotated frame; ref sampled uniformly from
    [MIN_OFFSET, MAX_OFFSET] frames relative to it in the video snippet
    (reference loader semantics). Without a sequence directory, falls back
    to eq pairs (ref == cur) so per-frame training still works.
    """

    def __init__(self, imdb, cfg, shuffle: bool = True, seed: int = 0):
        self.imdb = imdb
        self.cfg = cfg
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.batch_size = int(cfg.TRAIN.BATCH_IMAGES)
        self.crop = tuple(int(x) for x in cfg.TRAIN.CROP_SIZE) if cfg.TRAIN.CROP_SIZE else None
        self.flip = bool(cfg.TRAIN.FLIP)
        self.min_off = int(cfg.TRAIN.MIN_OFFSET)
        self.max_off = int(cfg.TRAIN.MAX_OFFSET)
        self.means = np.asarray(cfg.network.PIXEL_MEANS, np.float32)
        self.stds = np.asarray(cfg.network.PIXEL_STDS, np.float32)
        self.scales = cfg.get("SCALES")
        self.entries = [e for e in imdb.segdb if e["annotation"]]
        self.has_seq = getattr(imdb, "has_sequences", lambda: False)()

    @property
    def epoch_size(self) -> int:
        return max(len(self.entries) // self.batch_size, 1)

    def _load_pair(self, entry):
        cur = _apply_scales(self.imdb.load_image(entry["image"]), self.scales)
        label = self.imdb.load_annotation(entry)
        if label.shape[:2] != cur.shape[:2]:
            label = resize_to(label, *cur.shape[:2], interp="nearest")
        off = int(self.rng.integers(self.min_off, self.max_off + 1))
        if off == 0 or not self.has_seq:
            return cur, cur.copy(), 1.0, label
        from accel_tpu.data.cityscapes import ANNOTATED_FRAME

        ref_path = self.imdb.sequence_frame(entry, ANNOTATED_FRAME + off)
        try:
            ref = _apply_scales(self.imdb.load_image(ref_path), self.scales)
        except FileNotFoundError:
            return cur, cur.copy(), 1.0, label
        return cur, ref, 0.0, label

    def _augment(self, cur, ref, label):
        if self.crop:
            ch, cw = self.crop
            h, w = cur.shape[:2]
            if h > ch or w > cw:
                y0 = int(self.rng.integers(0, max(h - ch, 0) + 1))
                x0 = int(self.rng.integers(0, max(w - cw, 0) + 1))
                cur = cur[y0 : y0 + ch, x0 : x0 + cw]
                ref = ref[y0 : y0 + ch, x0 : x0 + cw]
                label = label[y0 : y0 + ch, x0 : x0 + cw]
        if self.flip and self.rng.random() < 0.5:
            cur = cur[:, ::-1]
            ref = ref[:, ::-1]
            label = label[:, ::-1]
        return cur, ref, label

    def __iter__(self):
        while True:
            order = (
                self.rng.permutation(len(self.entries))
                if self.shuffle
                else np.arange(len(self.entries))
            )
            for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
                datas, refs, eqs, labels = [], [], [], []
                for j in order[i : i + self.batch_size]:
                    cur, ref, eq, label = self._load_pair(self.entries[j])
                    cur, ref, label = self._augment(cur, ref, label)
                    datas.append(transform(_pad_to_multiple(cur, 128), self.means, self.stds))
                    refs.append(transform(_pad_to_multiple(ref, 128), self.means, self.stds))
                    labels.append(_pad_to_multiple(label, 128, 255)[None])
                    eqs.append(eq)
                yield {
                    "data": np.concatenate(datas, 0),
                    "data_ref": np.concatenate(refs, 0),
                    "eq_flag": np.asarray(eqs, np.float32),
                    "label": np.concatenate(labels, 0).astype(np.int32),
                }


class TrainClipLoader:
    """Yields clip batches for the clip-unrolled (cascade) training
    objective (``core.pipeline.clip_loss_and_stats``): per annotated frame,
    ``clip_length`` consecutive frames with the keyframe first and the
    annotated frame at a RANDOM in-clip position per sample, so the loss
    supervises every keyframe offset 0..k-1 across a batch — the
    incremental-propagation analog of the pair loader's random offset.

    Batch dict: 'clip' (N,F,H,W,3) f32, 'label' (N,F,H,W) int32 (255
    everywhere except each clip's annotated frame).
    """

    def __init__(self, imdb, cfg, shuffle: bool = True, seed: int = 0):
        self.imdb = imdb
        self.cfg = cfg
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.batch_size = int(cfg.TRAIN.BATCH_IMAGES)
        self.clip_length = int(cfg.TRAIN.CLIP_LENGTH)
        self.crop = tuple(int(x) for x in cfg.TRAIN.CROP_SIZE) if cfg.TRAIN.CROP_SIZE else None
        self.flip = bool(cfg.TRAIN.FLIP)
        self.means = np.asarray(cfg.network.PIXEL_MEANS, np.float32)
        self.stds = np.asarray(cfg.network.PIXEL_STDS, np.float32)
        self.scales = cfg.get("SCALES")
        self.entries = [e for e in imdb.segdb if e["annotation"]]
        self.has_seq = getattr(imdb, "has_sequences", lambda: False)()

    @property
    def epoch_size(self) -> int:
        return max(len(self.entries) // self.batch_size, 1)

    def _load_clip(self, entry):
        from accel_tpu.data.cityscapes import ANNOTATED_FRAME

        k = self.clip_length
        ann_pos = int(self.rng.integers(0, k))
        frames = []
        for i in range(k):
            fidx = ANNOTATED_FRAME - ann_pos + i
            im = None
            if self.has_seq:
                try:
                    im = self.imdb.load_image(self.imdb.sequence_frame(entry, fidx))
                except FileNotFoundError:
                    im = None
            if im is None:
                im = self.imdb.load_image(entry["image"])
            frames.append(_apply_scales(im, self.scales))
        label = self.imdb.load_annotation(entry)
        if label.shape[:2] != frames[0].shape[:2]:
            label = resize_to(label, *frames[0].shape[:2], interp="nearest")
        return frames, label, ann_pos

    def _augment(self, frames, label):
        if self.crop:
            ch, cw = self.crop
            h, w = frames[0].shape[:2]
            if h > ch or w > cw:
                y0 = int(self.rng.integers(0, max(h - ch, 0) + 1))
                x0 = int(self.rng.integers(0, max(w - cw, 0) + 1))
                frames = [f[y0 : y0 + ch, x0 : x0 + cw] for f in frames]
                label = label[y0 : y0 + ch, x0 : x0 + cw]
        if self.flip and self.rng.random() < 0.5:
            frames = [f[:, ::-1] for f in frames]
            label = label[:, ::-1]
        return frames, label

    def __iter__(self):
        while True:
            order = (
                self.rng.permutation(len(self.entries))
                if self.shuffle
                else np.arange(len(self.entries))
            )
            for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
                clips, labels = [], []
                for j in order[i : i + self.batch_size]:
                    frames, label, ann_pos = self._load_clip(self.entries[j])
                    frames, label = self._augment(frames, label)
                    clip = np.stack(
                        [transform(_pad_to_multiple(f, 128), self.means, self.stds)[0]
                         for f in frames], 0,
                    )
                    lab_full = np.full((len(frames), *clip.shape[1:3]), 255, np.int32)
                    lab = _pad_to_multiple(label, 128, 255)
                    lab_full[ann_pos, : lab.shape[0], : lab.shape[1]] = lab
                    clips.append(clip)
                    labels.append(lab_full)
                yield {
                    "clip": np.stack(clips, 0),
                    "label": np.stack(labels, 0),
                }


class TestClipLoader:
    """Yields clip batches for video eval.

    Per annotated frame, the clip is the ``interval`` consecutive frames
    ending ``key_offset`` frames after the annotated one, with the keyframe
    first — i.e. the annotated frame sits ``interval-1-key_offset`` steps
    after the keyframe (reference protocol: mIoU as a function of the
    annotated frame's distance from the keyframe; SURVEY.md Appendix B).

    Batch dict: 'clip' (B,F,H,W,3) f32, 'label' (B,F,H,W) int32 with 255
    everywhere except each clip's annotated frame, 'entry_idx' (B,).
    """

    __test__ = False  # pytest: not a test class (reference naming)

    def __init__(self, imdb, cfg, batch_clips: int = 1, max_items: int | None = None):
        self.imdb = imdb
        self.cfg = cfg
        self.interval = int(cfg.TEST.KEY_FRAME_INTERVAL)
        self.key_offset = int(cfg.TEST.KEY_FRAME_OFFSET)
        self.batch_clips = batch_clips
        self.means = np.asarray(cfg.network.PIXEL_MEANS, np.float32)
        self.stds = np.asarray(cfg.network.PIXEL_STDS, np.float32)
        self.scales = cfg.get("SCALES")
        entries = [e for e in imdb.segdb if e["annotation"]]
        self.entries = entries[:max_items] if max_items else entries
        self.has_seq = getattr(imdb, "has_sequences", lambda: False)()
        # position of the annotated frame within each clip (constant for a
        # loader: clip layout is keyframe-first with the annotated frame
        # key_offset frames before the clip end)
        self.ann_pos = self.interval - 1 - self.key_offset
        assert 0 <= self.ann_pos < self.interval, "KEY_FRAME_OFFSET out of range"
        # entry -> segdb index, precomputed (id-keyed; list.index would be
        # O(N^2) across the epoch)
        self._entry_idx = {id(e): i for i, e in enumerate(imdb.segdb)}

    def __len__(self):
        return (len(self.entries) + self.batch_clips - 1) // self.batch_clips

    def _load_clip(self, entry):
        from accel_tpu.data.cityscapes import ANNOTATED_FRAME

        k = self.interval
        ann_pos = self.ann_pos
        frames = []
        for i in range(k):
            fidx = ANNOTATED_FRAME - ann_pos + i
            if self.has_seq:
                path = self.imdb.sequence_frame(entry, fidx)
                try:
                    im = self.imdb.load_image(path)
                except FileNotFoundError:
                    im = self.imdb.load_image(entry["image"])
            else:
                im = self.imdb.load_image(entry["image"])
            im = _apply_scales(im, self.scales)
            frames.append(transform(_pad_to_multiple(im, 128), self.means, self.stds)[0])
        clip = np.stack(frames, 0)
        label_full = np.full((k, *clip.shape[1:3]), 255, np.int32)
        ann = self.imdb.load_annotation(entry)
        native = None
        if ann.shape[:2] != im.shape[:2]:
            # SCALES resized the frames: the reference protocol evaluates at
            # NATIVE GT resolution (predictions upsampled to GT, not GT
            # downsampled to predictions). Carry the native annotation plus
            # the scaled valid extent; pred_eval_clips crops the padding,
            # nearest-resizes the annotated frame's prediction to GT res and
            # scores there. The device-side label still gets a nearest-
            # resized GT so the non-native fast path keeps static shapes.
            native = (ann, im.shape[:2])
            ann = resize_to(ann, *im.shape[:2], interp="nearest")
        label_full[ann_pos, : ann.shape[0], : ann.shape[1]] = ann
        return clip, label_full, ann_pos, native

    def __iter__(self):
        for i in range(0, len(self.entries), self.batch_clips):
            chunk = self.entries[i : i + self.batch_clips]
            clips, labels, idxs, natives = [], [], [], []
            for e in chunk:
                clip, label, _, native = self._load_clip(e)
                clips.append(clip)
                labels.append(label)
                idxs.append(self._entry_idx[id(e)])
                natives.append(native)
            # pad last batch to full size with repeats (static shapes for jit)
            while len(clips) < self.batch_clips:
                clips.append(clips[-1])
                labels.append(np.full_like(labels[-1], 255))
                idxs.append(-1)
                natives.append(None)
            item = {
                "clip": np.stack(clips, 0),
                "label": np.stack(labels, 0),
                "entry_idx": np.asarray(idxs),
                "ann_pos": self.ann_pos,
            }
            if any(n is not None for n in natives):
                item["label_native"] = natives
            yield item
