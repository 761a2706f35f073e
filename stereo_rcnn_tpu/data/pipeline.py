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
from typing import Iterator, Optional, Sequence

import numpy as np

from stereo_rcnn_tpu.config import Config
from stereo_rcnn_tpu.data.kitti import KittiDataset, pack_ground_truth
from stereo_rcnn_tpu.train.targets import GroundTruth
from stereo_rcnn_tpu.utils.host_preproc import resize_subtract_pad


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
        return out_l, out_r, gt, scale

    def _epoch_indices(self):
        idx = np.arange(len(self.ds))
        if self.shuffle:
            self.rng.shuffle(idx)
        # Drop ragged tail: shapes must be static.
        n = (len(idx) // self.batch_size) * self.batch_size
        return idx[:n].reshape(-1, self.batch_size)

    def _make_batch(self, indices: Sequence[int]):
        ex = [self._load_example(int(i)) for i in indices]
        imgs_l = np.stack([e[0] for e in ex])
        imgs_r = np.stack([e[1] for e in ex])
        gt = GroundTruth(*[np.stack([e[2][i] for e in ex])
                           for i in range(10)])
        scales = np.asarray([e[3] for e in ex], np.float32)
        return imgs_l, imgs_r, gt, scales

    def __iter__(self) -> Iterator:
        """Background-threaded prefetching iterator over one epoch."""
        batches = self._epoch_indices()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def worker():
            try:
                for b in batches:
                    q.put(self._make_batch(b))
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
        return len(self.ds) // self.batch_size
