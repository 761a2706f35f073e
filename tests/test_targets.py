import jax
import jax.numpy as jnp
import numpy as np

from stereo_rcnn_tpu.config import RCNNConfig, RPNConfig
from stereo_rcnn_tpu.geometry import generate_anchors
from stereo_rcnn_tpu.config import AnchorConfig
from stereo_rcnn_tpu.train import (GroundTruth, anchor_targets,
                                   proposal_targets)


def make_gt(boxes_l, boxes_r, max_g=8):
    g = max_g
    n = len(boxes_l)
    gt = GroundTruth(
        left=jnp.zeros((g, 4)).at[:n].set(jnp.asarray(boxes_l)),
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


def test_proposal_targets_all_background():
    gt = make_gt([], [])
    pl = jnp.array([[10.0, 10.0, 50.0, 50.0]] * 8, jnp.float32)
    pv = jnp.ones((8,), bool)
    cfg = RCNNConfig(rois_per_image=8)
    tgt = proposal_targets(pl, pl, pv, gt, cfg, jax.random.PRNGKey(2))
    assert int(tgt.num_fg) == 0
    assert (np.asarray(tgt.cls) == 0).all()
