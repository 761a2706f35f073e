"""KITTI 3D-object AP evaluator (AP_bev / AP_3d / AP_2d), host-side numpy.

The reference writes KITTI-format result .txt files and relies on the
EXTERNAL C++ devkit for AP (SURVEY.md §3.3); this module vendors the
evaluation so the framework is self-contained: difficulty gating (Easy /
Moderate / Hard on min-height / occlusion / truncation), greedy score-sorted
matching with ignore handling, and 40-point (default, devkit-2017 style) or
11-point interpolated AP.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Sequence

import numpy as np

from stereo_rcnn_tpu.evalkit.rotate_iou import iou_3d, rotated_iou_bev

DIFFICULTIES = ("easy", "moderate", "hard")
# (min 2D bbox height px, max occlusion, max truncation) — devkit constants.
_DIFF_GATES = {"easy": (40.0, 0, 0.15), "moderate": (25.0, 1, 0.30),
               "hard": (25.0, 2, 0.50)}


@dataclasses.dataclass
class FrameObjects:
    """Ground truth or detections for one frame (Car class)."""

    box2d: np.ndarray        # [N, 4] left-image xyxy
    box3d: np.ndarray        # [N, 7] (x, y, z, h, w, l, ry)
    score: np.ndarray        # [N] (ones for gt)
    occlusion: np.ndarray    # [N] int (gt only; zeros for dets)
    truncation: np.ndarray   # [N] (gt only)

    @staticmethod
    def empty() -> "FrameObjects":
        return FrameObjects(np.zeros((0, 4)), np.zeros((0, 7)),
                            np.zeros((0,)), np.zeros((0,), int),
                            np.zeros((0,)))


def _gt_classification(gt: FrameObjects, difficulty: str):
    """valid / ignored split per devkit rules: an object harder than the
    current difficulty is IGNORED (matches don't count as TP or FP)."""
    min_h, max_occ, max_trunc = _DIFF_GATES[difficulty]
    h = gt.box2d[:, 3] - gt.box2d[:, 1]
    valid = (h >= min_h) & (gt.occlusion <= max_occ) & \
        (gt.truncation <= max_trunc)
    ignored = ~valid
    return valid, ignored


def _match_frame(gt: FrameObjects, det: FrameObjects, iou_fn, thresh: float,
                 difficulty: str):
    """Returns (det_tp, det_ignored, n_valid_gt) for one frame.

    Greedy: detections in descending score claim their best unmatched gt.
    """
    valid, ignored = _gt_classification(gt, difficulty)
    n_det = len(det.score)
    det_tp = np.zeros(n_det, bool)
    det_ign = np.zeros(n_det, bool)
    if n_det == 0:
        return det_tp, det_ign, int(valid.sum())
    if len(gt.score) == 0:
        return det_tp, det_ign, 0

    iou = iou_fn(det.box3d, gt.box3d)            # [Ndet, Ngt]
    order = np.argsort(-det.score)
    taken = np.zeros(len(gt.score), bool)
    for d in order:
        cand = iou[d] >= thresh
        cand &= ~taken
        if not cand.any():
            continue
        g = int(np.argmax(np.where(cand, iou[d], -1.0)))
        taken[g] = True
        if valid[g]:
            det_tp[d] = True
        else:
            det_ign[d] = True                    # matched an ignored gt
    return det_tp, det_ign, int(valid.sum())


def _average_precision(recalls: np.ndarray, precisions: np.ndarray,
                       n_points: int = 40) -> float:
    """Interpolated AP (devkit: R40 sampling, skipping recall 0)."""
    ap = 0.0
    samples = np.linspace(0.0, 1.0, n_points + 1)[1:]
    for r in samples:
        mask = recalls >= r - 1e-9
        ap += float(precisions[mask].max()) if mask.any() else 0.0
    return ap / n_points * 100.0


def evaluate(gts: Sequence[FrameObjects], dets: Sequence[FrameObjects],
             metric: str = "3d", iou_thresh: float = 0.7,
             n_points: int = 40) -> Dict[str, float]:
    """AP per difficulty over a list of frames.

    metric: "3d" (volume IoU), "bev" (rotated BEV IoU), or "2d" (left-image
    axis-aligned IoU).
    """
    if metric == "3d":
        iou_fn = iou_3d
    elif metric == "bev":
        def iou_fn(a, b):
            return rotated_iou_bev(a[:, [0, 2, 4, 5, 6]],
                                   b[:, [0, 2, 4, 5, 6]])
    elif metric == "2d":
        def iou_fn(a, b):                         # uses box2d via closure
            raise NotImplementedError
    else:
        raise ValueError(metric)

    results = {}
    for diff in DIFFICULTIES:
        rows = []            # (score, is_tp, is_ignored)
        n_gt_total = 0
        for gt, det in zip(gts, dets):
            if metric == "2d":
                tp, ign, n_valid = _match_frame_2d(gt, det, iou_thresh, diff)
            else:
                tp, ign, n_valid = _match_frame(gt, det, iou_fn, iou_thresh,
                                                diff)
            n_gt_total += n_valid
            for s, t, i in zip(det.score, tp, ign):
                rows.append((s, t, i))
        if n_gt_total == 0 or not rows:
            results[diff] = 0.0
            continue
        rows.sort(key=lambda r: -r[0])
        tps = np.cumsum([r[1] for r in rows])
        fps = np.cumsum([(not r[1]) and (not r[2]) for r in rows])
        recalls = tps / n_gt_total
        precisions = tps / np.maximum(tps + fps, 1)
        results[diff] = _average_precision(recalls, precisions, n_points)
    return results


def _match_frame_2d(gt: FrameObjects, det: FrameObjects, thresh: float,
                    difficulty: str):
    valid, ignored = _gt_classification(gt, difficulty)
    n_det = len(det.score)
    det_tp = np.zeros(n_det, bool)
    det_ign = np.zeros(n_det, bool)
    if n_det == 0:
        return det_tp, det_ign, int(valid.sum())
    if len(gt.score) == 0:
        return det_tp, det_ign, 0
    a, b = det.box2d, gt.box2d
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
    area_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[None, :]
    iou = inter / np.maximum(area_a + area_b - inter, 1e-9)
    order = np.argsort(-det.score)
    taken = np.zeros(len(gt.score), bool)
    for d in order:
        cand = (iou[d] >= thresh) & ~taken
        if not cand.any():
            continue
        g = int(np.argmax(np.where(cand, iou[d], -1.0)))
        taken[g] = True
        det_tp[d] = valid[g]
        det_ign[d] = not valid[g]
    return det_tp, det_ign, int(valid.sum())


# ---------------------------------------------------------------------------
# KITTI result-file IO (the reference's test_net.py output format).
# ---------------------------------------------------------------------------

def write_result_file(path: str, types: Sequence[str], boxes2d: np.ndarray,
                      dims: np.ndarray, locations: np.ndarray,
                      rys: np.ndarray, alphas: np.ndarray,
                      scores: np.ndarray) -> None:
    """KITTI format: type trunc occ alpha bbox(4) dims(h,w,l) loc(3) ry
    score  (reference: test_net.py result writer, SURVEY.md §3.3)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for i, t in enumerate(types):
            b, d, l = boxes2d[i], dims[i], locations[i]
            f.write(f"{t} -1 -1 {alphas[i]:.6f} "
                    f"{b[0]:.2f} {b[1]:.2f} {b[2]:.2f} {b[3]:.2f} "
                    f"{d[0]:.2f} {d[1]:.2f} {d[2]:.2f} "
                    f"{l[0]:.2f} {l[1]:.2f} {l[2]:.2f} "
                    f"{rys[i]:.6f} {scores[i]:.4f}\n")


def read_result_file(path: str) -> FrameObjects:
    if not os.path.exists(path):
        return FrameObjects.empty()
    box2d, box3d, score = [], [], []
    with open(path) as f:
        for line in f:
            p = line.split()
            if len(p) < 16 or p[0] != "Car":
                continue
            box2d.append([float(x) for x in p[4:8]])
            h, w, l = (float(x) for x in p[8:11])
            x, y, z = (float(x) for x in p[11:14])
            box3d.append([x, y, z, h, w, l, float(p[14])])
            score.append(float(p[15]))
    n = len(score)
    return FrameObjects(np.asarray(box2d).reshape(n, 4),
                        np.asarray(box3d).reshape(n, 7),
                        np.asarray(score), np.zeros(n, int), np.zeros(n))
