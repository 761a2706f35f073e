"""Legacy "+1" box-width convention (VERDICT r2 missing #5 / next #4).

The reference's ``bbox_transform.py`` measures widths as ``x2 - x1 + 1``
in encode (``bbox_transform``), decode (``bbox_transform_inv``), IoU
(``bbox_overlaps``) and clips to ``size - 1`` (``clip_boxes``) — including
the decode asymmetry where ``x2 = ctr + 0.5 * w`` with no ``- 1``.  These
tests pin both conventions numerically so converting the released
checkpoint cannot be confounded by sub-pixel coder drift.
"""

import jax.numpy as jnp
import numpy as np

from stereo_rcnn_tpu.config import Config, load_config
from stereo_rcnn_tpu.geometry.boxes import (box_area, clip_boxes,
                                            decode_stereo_boxes,
                                            encode_stereo_boxes,
                                            pairwise_iou)


def test_legacy_iou_hand_computed():
    # Inclusive 10x10 boxes: [0,0,9,9] and [5,0,14,9] overlap on a 5x10
    # strip under the +1 convention -> inter 50, union 150, IoU 1/3.
    a = jnp.asarray([[0.0, 0.0, 9.0, 9.0]])
    b = jnp.asarray([[5.0, 0.0, 14.0, 9.0]])
    np.testing.assert_allclose(pairwise_iou(a, b, off=1.0), [[1 / 3]],
                               rtol=1e-6)
    np.testing.assert_allclose(pairwise_iou(a, a, off=1.0), [[1.0]],
                               rtol=1e-6)
    # Continuous: both boxes 9x9, inter 4x9=36, union 81+81-36=126.
    np.testing.assert_allclose(pairwise_iou(a, b, off=0.0),
                               [[36.0 / 126.0]], rtol=1e-6)


def test_legacy_area():
    box = jnp.asarray([[2.0, 3.0, 11.0, 7.0]])
    assert float(box_area(box, off=1.0)[0]) == 50.0      # 10 x 5 inclusive
    assert float(box_area(box, off=0.0)[0]) == 36.0      # 9 x 4 continuous


def test_continuous_roundtrip_exact():
    anchors = jnp.asarray([[10.0, 20.0, 50.0, 60.0]])
    gt_l = jnp.asarray([[12.0, 18.0, 55.0, 66.0]])
    gt_r = jnp.asarray([[8.0, 18.0, 51.0, 66.0]])
    t = encode_stereo_boxes(anchors, gt_l, gt_r, off=0.0)
    dl, dr = decode_stereo_boxes(anchors, t, off=0.0)
    np.testing.assert_allclose(dl, gt_l, atol=1e-4)
    np.testing.assert_allclose(dr, gt_r, atol=1e-4)


def test_legacy_roundtrip_has_reference_asymmetry():
    """Reference quirk, reproduced on purpose: encode uses w = x2 - x1 + 1
    but decode emits x2 = ctr + 0.5 * w (no -1), so a round trip returns
    x1/y1 exactly and x2/y2 inflated by exactly +1."""
    anchors = jnp.asarray([[10.0, 20.0, 50.0, 60.0]])
    gt_l = jnp.asarray([[12.0, 18.0, 55.0, 66.0]])
    gt_r = jnp.asarray([[8.0, 18.0, 51.0, 66.0]])
    t = encode_stereo_boxes(anchors, gt_l, gt_r, off=1.0)
    dl, dr = decode_stereo_boxes(anchors, t, off=1.0)
    expect_l = gt_l + jnp.asarray([0.0, 0.0, 1.0, 1.0])
    expect_r = gt_r + jnp.asarray([0.0, 0.0, 1.0, 1.0])
    np.testing.assert_allclose(dl, expect_l, atol=1e-4)
    np.testing.assert_allclose(dr, expect_r, atol=1e-4)


def test_legacy_clip_to_size_minus_one():
    boxes = jnp.asarray([[-3.0, -2.0, 500.0, 400.0]])
    out = clip_boxes(boxes, 375.0, 450.0, off=1.0)
    np.testing.assert_allclose(out, [[0.0, 0.0, 449.0, 374.0]])
    out_c = clip_boxes(boxes, 375.0, 450.0, off=0.0)
    np.testing.assert_allclose(out_c, [[0.0, 0.0, 450.0, 375.0]])


def test_config_default_and_override():
    cfg = Config()
    assert cfg.box_convention == "legacy" and cfg.box_off == 1.0
    cfg2 = load_config(overrides={"box_convention": "continuous"})
    assert cfg2.box_off == 0.0


def test_nms_respects_convention():
    """Two small boxes whose +1 IoU crosses a 0.5 threshold while the
    continuous IoU does not: legacy suppresses, continuous keeps both."""
    from stereo_rcnn_tpu.ops.nms import nms_mask
    # 4x4 inclusive boxes offset by 1px: +1 IoU = (3*4)/(16+16-12) = 0.6;
    # continuous (w=3): inter 2*3=6, union 9+9-6=12 -> 0.5 (not > 0.5).
    boxes = jnp.asarray([[0.0, 0.0, 3.0, 3.0], [1.0, 0.0, 4.0, 3.0]])
    scores = jnp.asarray([0.9, 0.8])
    keep_legacy = nms_mask(boxes, scores, 0.5, off=1.0)
    keep_cont = nms_mask(boxes, scores, 0.5, off=0.0)
    assert keep_legacy.tolist() == [True, False]
    assert keep_cont.tolist() == [True, True]
