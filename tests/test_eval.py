import numpy as np

from stereo_rcnn_tpu.evalkit import (FrameObjects, evaluate, iou_3d,
                                     rotated_iou_bev)


def test_rotated_iou_identity():
    boxes = np.array([[0.0, 10.0, 1.6, 3.9, 0.3]])
    iou = rotated_iou_bev(boxes, boxes)
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-6)


def test_rotated_iou_axis_aligned_matches_simple():
    # Two axis-aligned BEV boxes: [x, z, w, l, ry=0] -> extents l in x, w in z.
    a = np.array([[0.0, 0.0, 2.0, 4.0, 0.0]])    # x:[-2,2], z:[-1,1]
    b = np.array([[1.0, 0.0, 2.0, 4.0, 0.0]])    # x:[-1,3], z:[-1,1]
    iou = rotated_iou_bev(a, b)
    # inter = 3*2=6, union = 8+8-6=10
    np.testing.assert_allclose(iou, [[0.6]], atol=1e-6)


def test_rotated_iou_90deg():
    # Square box rotated 90 deg == same box.
    a = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = np.array([[0.0, 0.0, 2.0, 2.0, np.pi / 2]])
    np.testing.assert_allclose(rotated_iou_bev(a, b), [[1.0]], atol=1e-5)


def test_rotated_iou_disjoint():
    a = np.array([[0.0, 0.0, 2.0, 4.0, 0.5]])
    b = np.array([[100.0, 0.0, 2.0, 4.0, 0.5]])
    np.testing.assert_allclose(rotated_iou_bev(a, b), [[0.0]], atol=1e-9)


def test_iou3d_height_overlap():
    # Same BEV footprint, half vertical overlap.
    a = np.array([[0.0, 0.0, 10.0, 2.0, 1.6, 3.9, 0.0]])
    b = np.array([[0.0, 1.0, 10.0, 2.0, 1.6, 3.9, 0.0]])
    # y spans: a [-2, 0], b [-1, 1] -> overlap 1 of height 2.
    iou = iou_3d(a, b)
    np.testing.assert_allclose(iou, [[1.0 / 3.0]], atol=1e-5)


def _frame(boxes3d, heights=60.0, scores=None):
    n = len(boxes3d)
    b3 = np.asarray(boxes3d, float).reshape(n, 7)
    box2d = np.zeros((n, 4))
    box2d[:, 3] = heights                    # tall enough for "easy"
    return FrameObjects(
        box2d=box2d, box3d=b3,
        score=np.asarray(scores if scores is not None else np.ones(n), float),
        occlusion=np.zeros(n, int), truncation=np.zeros(n))


def test_perfect_detections_ap100():
    gt = [_frame([[0, 1.6, 10, 1.5, 1.6, 3.9, 0.1],
                  [3, 1.6, 20, 1.5, 1.6, 3.9, -0.5]])]
    det = [_frame([[0, 1.6, 10, 1.5, 1.6, 3.9, 0.1],
                   [3, 1.6, 20, 1.5, 1.6, 3.9, -0.5]],
                  scores=[0.9, 0.8])]
    res = evaluate(gt, det, metric="3d", iou_thresh=0.7)
    assert res["easy"] > 99.0
    res_bev = evaluate(gt, det, metric="bev", iou_thresh=0.7)
    assert res_bev["easy"] > 99.0


def test_false_positives_reduce_ap():
    gt = [_frame([[0, 1.6, 10, 1.5, 1.6, 3.9, 0.0]])]
    det_good = [_frame([[0, 1.6, 10, 1.5, 1.6, 3.9, 0.0]], scores=[0.9])]
    det_fp = [_frame([[0, 1.6, 10, 1.5, 1.6, 3.9, 0.0],
                      [50, 1.6, 50, 1.5, 1.6, 3.9, 0.0]],
                     scores=[0.5, 0.9])]   # high-scoring FP first
    ap_good = evaluate(gt, det_good, metric="3d")["easy"]
    ap_fp = evaluate(gt, det_fp, metric="3d")["easy"]
    assert ap_fp < ap_good


def test_difficulty_gating():
    # A short (25px) gt is ignored for easy but counted for moderate.
    gt = [FrameObjects(
        box2d=np.array([[0.0, 0.0, 30.0, 30.0]]),
        box3d=np.array([[0, 1.6, 40, 1.5, 1.6, 3.9, 0.0]]),
        score=np.ones(1), occlusion=np.zeros(1, int),
        truncation=np.zeros(1))]
    det = [_frame([[0, 1.6, 40, 1.5, 1.6, 3.9, 0.0]], scores=[0.9])]
    res = evaluate(gt, det, metric="3d")
    assert res["easy"] == 0.0            # no valid easy gt
    assert res["moderate"] > 99.0


def test_ignored_gt_absorbs_duplicate_detections():
    """Devkit semantics: an ignored gt (too hard for the difficulty) can
    absorb ANY number of detections — duplicates become "ignored", never
    FP.  Regression test for the round-2 advisor finding (taken[g] was set
    for ignored-gt matches, so the second duplicate fell through to FP)."""
    gt = [FrameObjects(
        box2d=np.array([[0.0, 0.0, 100.0, 60.0],      # valid (tall)
                        [200.0, 0.0, 230.0, 25.0]]),  # short -> easy-ignored
        box3d=np.array([[0, 1.6, 10, 1.5, 1.6, 3.9, 0.0],
                        [5, 1.6, 40, 1.5, 1.6, 3.9, 0.0]]),
        score=np.ones(2), occlusion=np.zeros(2, int),
        truncation=np.zeros(2))]
    det = [_frame([[0, 1.6, 10, 1.5, 1.6, 3.9, 0.0],
                   [5, 1.6, 40, 1.5, 1.6, 3.9, 0.0],   # dup 1 on ignored gt
                   [5, 1.6, 40, 1.5, 1.6, 3.9, 0.0]],  # dup 2 on ignored gt
                  scores=[0.9, 0.8, 0.7])]
    res = evaluate(gt, det, metric="3d", iou_thresh=0.7)
    assert res["easy"] > 99.0    # both duplicates ignored, zero FP
