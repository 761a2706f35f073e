import jax
import jax.numpy as jnp
import numpy as np

from stereo_rcnn_tpu.config import RCNNConfig, RPNConfig
from stereo_rcnn_tpu.geometry import generate_anchors
from stereo_rcnn_tpu.config import AnchorConfig
from stereo_rcnn_tpu.train import (GroundTruth, anchor_targets,
                                   proposal_targets)


def make_gt(boxes_l, boxes_r, max_g=8, ignore_boxes=()):
    g = max_g
    n = len(boxes_l)
    ni = len(ignore_boxes)
    left = jnp.zeros((g, 4)).at[:n].set(jnp.asarray(boxes_l)) if n else \
        jnp.zeros((g, 4))
    if ni:
        left = left.at[n:n + ni].set(jnp.asarray(ignore_boxes))
    gt = GroundTruth(
        left=left,
        right=jnp.zeros((g, 4)).at[:n].set(jnp.asarray(boxes_r)),
        cls=jnp.zeros((g,), jnp.int32).at[:n].set(1),
        dims=jnp.zeros((g, 3)).at[:n].set(jnp.array([1.5, 1.6, 3.9])),
        alpha=jnp.zeros((g,)).at[:n].set(0.5),
        kpt_u=jnp.zeros((g,)).at[:n].set(
            jnp.asarray([0.5 * (b[0] + b[2]) for b in boxes_l])),
        kpt_type=jnp.zeros((g,), jnp.int32),
        kpt_visible=jnp.zeros((g,), bool).at[:n].set(True),
        border_u=jnp.zeros((g, 2)).at[:n].set(
            jnp.asarray([[b[0] + 1, b[2] - 1] for b in boxes_l])),
        valid=jnp.zeros((g,), bool).at[:n].set(True),
        location=jnp.zeros((g, 3)),
        ry=jnp.zeros((g,)),
        ignore=jnp.zeros((g,), bool).at[n:n + ni].set(True)
        if ni else jnp.zeros((g,), bool),
    )
    return gt


def test_anchor_targets_basic():
    acfg = AnchorConfig(strides=(4, 8), scales=(32.0, 64.0))
    anchors = generate_anchors(acfg, 128, 256)
    gt = make_gt([[40.0, 40.0, 80.0, 72.0]], [[30.0, 40.0, 70.0, 72.0]])
    cfg = RPNConfig(batch_size=64)
    tgt = anchor_targets(anchors, gt, cfg, 128, 256, jax.random.PRNGKey(0))
    assert int(tgt.num_fg) >= 1                      # best-anchor guarantee
    assert int(tgt.num_sampled) <= cfg.batch_size
    # All fg-sampled anchors have finite stereo targets.
    fg = (tgt.labels == 1) & (tgt.weights > 0)
    assert np.isfinite(np.asarray(tgt.box_targets)[np.asarray(fg)]).all()


def test_anchor_targets_empty_image():
    acfg = AnchorConfig(strides=(4,), scales=(32.0,))
    anchors = generate_anchors(acfg, 64, 64)
    gt = make_gt([], [])
    cfg = RPNConfig(batch_size=32)
    tgt = anchor_targets(anchors, gt, cfg, 64, 64, jax.random.PRNGKey(0))
    assert int(tgt.num_fg) == 0
    assert int(tgt.num_sampled) == cfg.batch_size    # all background


def test_proposal_targets_sampling():
    gt = make_gt([[40.0, 40.0, 80.0, 72.0], [100.0, 20.0, 140.0, 60.0]],
                 [[30.0, 40.0, 70.0, 72.0], [90.0, 20.0, 130.0, 60.0]])
    # Proposals: near-duplicates of gt0 + junk.
    pl = jnp.array([[42.0, 41.0, 78.0, 70.0],
                    [0.0, 0.0, 20.0, 20.0],
                    [200.0, 200.0, 240.0, 230.0]] + [[0, 0, 4, 4]] * 13,
                   jnp.float32)
    pr = pl - jnp.array([8.0, 0.0, 8.0, 0.0])
    pv = jnp.array([True, True, True] + [False] * 13)
    cfg = RCNNConfig(rois_per_image=16)
    tgt = proposal_targets(pl, pr, pv, gt, cfg, jax.random.PRNGKey(1))
    assert tgt.rois_left.shape == (16, 4)
    # gt boxes are appended, so at least 3 fg (prop0 + 2 gt).
    assert int(tgt.num_fg) >= 3
    fg_rows = np.asarray(tgt.cls) > 0
    assert fg_rows.sum() == int(tgt.num_fg)
    # Keypoint weight only on fg rows with kpt in-roi.
    kw = np.asarray(tgt.kpt_weight)
    assert (kw[~fg_rows] == 0).all()
    assert kw.sum() >= 1
    # Joint kpt bin within [0, 4*grid).
    assert (np.asarray(tgt.kpt_bin) >= 0).all()
    assert (np.asarray(tgt.kpt_bin) < 4 * cfg.kpt_grid).all()


def test_anchor_targets_ignore_region_excluded_from_bg():
    """Anchors inside an ignore region (DontCare/Van) must not be sampled
    as background negatives."""
    acfg = AnchorConfig(strides=(4,), scales=(32.0,))
    anchors = generate_anchors(acfg, 128, 128)
    ignore_box = [8.0, 8.0, 56.0, 56.0]
    gt = make_gt([], [], ignore_boxes=[ignore_box])
    cfg = RPNConfig(batch_size=32)
    tgt = anchor_targets(anchors, gt, cfg, 128, 128, jax.random.PRNGKey(0))
    # Sampled negatives must not sit mostly inside the ignore region.
    sampled_bg = np.asarray((tgt.labels == 0) & (tgt.weights > 0))
    a = np.asarray(anchors)
    lt = np.maximum(a[:, :2], ignore_box[:2])
    rb = np.minimum(a[:, 2:], ignore_box[2:])
    wh = np.maximum(rb - lt, 0)
    frac = wh[:, 0] * wh[:, 1] / np.maximum(
        (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]), 1e-9)
    assert not (sampled_bg & (frac > cfg.ignore_overlap)).any()
    # But anchors away from the region ARE still sampled.
    assert sampled_bg.sum() > 0


def test_anchor_targets_best_anchor_unconditional():
    """Reference guarantees every gt at least one positive anchor, with no
    IoU floor."""
    acfg = AnchorConfig(strides=(8,), scales=(64.0,))
    anchors = generate_anchors(acfg, 128, 128)
    # A tiny gt box: IoU with every 64px anchor is well under 0.1.
    gt = make_gt([[60.0, 60.0, 68.0, 68.0]], [[56.0, 60.0, 64.0, 68.0]])
    cfg = RPNConfig(batch_size=32)
    tgt = anchor_targets(anchors, gt, cfg, 128, 128, jax.random.PRNGKey(0))
    assert int(tgt.num_fg) >= 1


def test_proposal_targets_ignore_region_excluded_from_bg():
    gt = make_gt([[40.0, 40.0, 80.0, 72.0]], [[30.0, 40.0, 70.0, 72.0]],
                 ignore_boxes=[[100.0, 10.0, 160.0, 60.0]])
    pl = jnp.array([[42.0, 41.0, 78.0, 70.0],      # fg (near gt)
                    [110.0, 15.0, 150.0, 55.0],    # inside ignore region
                    [0.0, 0.0, 20.0, 20.0]] +      # clean bg
                   [[0, 0, 4, 4]] * 13, jnp.float32)
    pr = pl - jnp.array([8.0, 0.0, 8.0, 0.0])
    pv = jnp.array([True, True, True] + [False] * 13)
    cfg = RCNNConfig(rois_per_image=16)
    tgt = proposal_targets(pl, pr, pv, gt, cfg, jax.random.PRNGKey(3))
    rl = np.asarray(tgt.rois_left)
    w = np.asarray(tgt.weights)
    # The ignore-region proposal must never be a sampled background row.
    ignore_rows = (np.abs(rl - np.array([110.0, 15.0, 150.0, 55.0]))
                   < 1e-3).all(-1)
    bg_rows = (np.asarray(tgt.cls) == 0) & (w > 0)
    assert not (ignore_rows & bg_rows).any()


def test_proposal_targets_all_background():
    gt = make_gt([], [])
    pl = jnp.array([[10.0, 10.0, 50.0, 50.0]] * 8, jnp.float32)
    pv = jnp.ones((8,), bool)
    cfg = RCNNConfig(rois_per_image=8)
    tgt = proposal_targets(pl, pl, pv, gt, cfg, jax.random.PRNGKey(2))
    assert int(tgt.num_fg) == 0
    assert (np.asarray(tgt.cls) == 0).all()


def test_anchor_targets_zero_iou_gt_promotes_nothing():
    """A valid gt overlapping NO inside anchor must not promote an
    arbitrary anchor (argmax of an all-zero IoU column is 0).  Regression
    test for the round-2 advisor finding."""
    acfg = AnchorConfig(strides=(4,), scales=(32.0,))
    anchors = generate_anchors(acfg, 64, 64)
    # gt far outside the 64x64 image: zero IoU with every inside anchor.
    gt = make_gt([[300.0, 300.0, 340.0, 340.0]],
                 [[290.0, 300.0, 330.0, 340.0]])
    cfg = RPNConfig(batch_size=32)
    tgt = anchor_targets(anchors, gt, cfg, 64, 64, jax.random.PRNGKey(0))
    assert int(tgt.num_fg) == 0
    assert not bool((tgt.labels == 1).any())
