"""Host input pipeline: decode -> resize/normalize (native) -> batch ->
prefetch.

Behavioral reference: ``lib/roi_data_layer/roibatchLoader.py`` +
``minibatch.py`` (BGR load, mean subtraction, resize to training scale, pad,
emit the 10-tensor batch — SURVEY.md §2.2).  TPU design: a background
prefetch thread keeps N batches in flight so host preprocessing overlaps
device compute; the heavy per-pixel work runs in the native C++ layer
(csrc/host_preproc.cpp) with a numpy fallback.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, NamedTuple, Optional, Sequence

import jax
import numpy as np

from stereo_rcnn_tpu.config import Config
from stereo_rcnn_tpu.data.kitti import KittiDataset, pack_ground_truth
from stereo_rcnn_tpu.geometry.calib import StereoCalib
from stereo_rcnn_tpu.train.targets import GroundTruth
from stereo_rcnn_tpu.utils.host_preproc import resize_subtract_pad


class PipelineBatch(NamedTuple):
    """One host-side batch.  The last batch of an epoch may be PADDED with
    wrap-around frames from the epoch order: ``n_valid`` <= B gives the real
    frame count (consumers must not score the pad replicas — the reference
    DataLoader simply yields a short batch, which fixed TPU shapes cannot)."""

    images_left: np.ndarray    # [B, H, W, 3]
    images_right: np.ndarray   # [B, H, W, 3]
    gt: GroundTruth            # leaves [B, G, ...]
    scales: np.ndarray         # [B] image resize factor
    calib: StereoCalib         # leaves [B, ...] — WORKING-resolution calib
    n_valid: int               # real (non-pad) frames in this batch
    content_wh: np.ndarray = None  # [B, 2] letterboxed CONTENT extent (w, h)
    #  in working-res px — smaller than the padded canvas when the source
    #  aspect ratio differs (KITTI 1242x375 in a 1280x384 canvas leaves
    #  ~8 px of right padding); the solver's truncation detection must
    #  compare box edges against this, not the canvas.


def load_image(path: str) -> np.ndarray:
    """uint8 [H, W, 3] BGR.  Supports .png (cv2/PIL) and .npy fixtures."""
    if path.endswith(".npy"):
        arr = np.load(path)
        return np.clip(arr, 0, 255).astype(np.uint8)
    try:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_COLOR)      # BGR already
        if img is None:
            raise FileNotFoundError(path)
        return img
    except ImportError:
        from PIL import Image
        rgb = np.asarray(Image.open(path).convert("RGB"))
        return rgb[..., ::-1].copy()                  # -> BGR


class KittiPipeline:
    """Iterates (images_left, images_right, GroundTruth, scales) batches."""

    def __init__(self, cfg: Config, dataset: KittiDataset, batch_size: int,
                 shuffle: bool = True, seed: int = 0,
                 image_ext: str = ".png", prefetch: int = 2):
        self.cfg = cfg
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.image_ext = image_ext
        self.prefetch = prefetch

    def _load_example(self, idx: int):
        cfg = self.cfg
        p = self.ds.paths(idx)
        left_path = p["left"].replace(".png", self.image_ext)
        right_path = p["right"].replace(".png", self.image_ext)
        img_l = load_image(left_path)
        img_r = load_image(right_path)
        sh, sw = img_l.shape[:2]
        th, tw = cfg.data.image_h, cfg.data.image_w
        scale = min(th / sh, tw / sw)
        means = cfg.backbone.pixel_means_bgr
        out_l = resize_subtract_pad(img_l, th, tw, scale, means)
        out_r = resize_subtract_pad(img_r, th, tw, scale, means)
        annos, calib = self.ds.load_annotation(idx, float(sw))
        gt = pack_ground_truth(annos, cfg.train.max_gt_boxes, scale=scale)
        # Working-resolution calibration rides with the example (real KITTI
        # calib varies per frame; baking one frame's calib into the jit
        # closure would skew every other frame's 3D solve).
        calib_s = jax.tree.map(np.asarray, calib.scale(scale))
        content = np.asarray([sw * scale, sh * scale], np.float32)
        return out_l, out_r, gt, scale, calib_s, content

    def _epoch_indices(self):
        """[n_batches, B] index array + per-batch valid counts.  The ragged
        tail is PADDED (static shapes require a full batch) with WRAP-AROUND
        frames from the start of this epoch's (shuffled) order — distinct
        frames that differ per epoch, so training on the pad replicas is an
        unbiased resample of the dataset rather than the same last frame
        over-weighted every epoch.  The true length rides in ``n_valid``;
        evaluation consumers must still not score the replicas."""
        idx = np.arange(len(self.ds))
        if self.shuffle:
            self.rng.shuffle(idx)
        bs = self.batch_size
        n_full = len(idx) // bs
        tail = len(idx) - n_full * bs
        counts = [bs] * n_full
        if tail:
            pad = np.resize(idx, len(idx) + bs - tail)[len(idx):]
            idx = np.concatenate([idx, pad])
            counts.append(tail)
        return idx.reshape(-1, bs), counts

    def _make_batch(self, indices: Sequence[int], n_valid: int):
        ex = [self._load_example(int(i)) for i in indices]
        imgs_l = np.stack([e[0] for e in ex])
        imgs_r = np.stack([e[1] for e in ex])
        gt = GroundTruth(*[np.stack([e[2][i] for e in ex])
                           for i in range(len(GroundTruth._fields))])
        scales = np.asarray([e[3] for e in ex], np.float32)
        calib = jax.tree.map(lambda *xs: np.stack(xs),
                             *[e[4] for e in ex])
        content = np.stack([e[5] for e in ex])
        return PipelineBatch(imgs_l, imgs_r, gt, scales, calib, n_valid,
                             content)

    def __iter__(self) -> Iterator[PipelineBatch]:
        """Background-threaded prefetching iterator over one epoch."""
        batches, counts = self._epoch_indices()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def worker():
            try:
                for b, n in zip(batches, counts):
                    q.put(self._make_batch(b, n))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item

    def steps_per_epoch(self) -> int:
        """Batches per epoch (including a padded tail batch, if any)."""
        return -(-len(self.ds) // self.batch_size)
