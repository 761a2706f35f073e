"""Fixed-shape training target assignment.

Behavioral references:
  * ``lib/model/rpn/anchor_target_layer.py`` — ``_AnchorTargetLayer``:
    assigns anchors by IoU against UNION gt boxes, builds stereo 6-tuple
    regression targets against the (left, right) gt pair, subsamples 256
    anchors with <=50% foreground.
  * ``lib/model/rpn/proposal_target_layer.py`` — ``_ProposalTargetLayer``:
    samples 128 RoIs/image (fg fraction 0.25) matched to gt pairs; builds
    class, 6-tuple box, dim (vs class-mean), viewpoint (sin, cos) and
    keypoint-bin targets.

TPU design: no dynamic subsampling — eligibility masks are converted to a
fixed-size sample via the random-priority top-k trick (add uniform noise to
eligible entries, take top-k; ineligible entries get -inf priority), which
is exactly "sample without replacement" under jit.  Padded GT slots are
masked everywhere via ``gt_valid``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from stereo_rcnn_tpu.config import RCNNConfig, RPNConfig
from stereo_rcnn_tpu.geometry.boxes import (encode_stereo_boxes, pairwise_iou,
                                            union_box)


class GroundTruth(NamedTuple):
    """Per-image padded ground truth (leading dims [..., G]).

    Slots are one of three kinds:
      * real objects: ``valid=True, ignore=False`` — drive all losses;
      * ignore regions (DontCare/Van/Truck for the Car class — reference
        ``lib/datasets/kitti.py`` ignore handling): ``valid=False,
        ignore=True`` — anchors/rois overlapping them are EXCLUDED from
        negative sampling (never mined as background);
      * padding: ``valid=False, ignore=False`` — inert.
    """

    left: jnp.ndarray        # [G, 4] left-image boxes
    right: jnp.ndarray       # [G, 4] right-image boxes
    cls: jnp.ndarray         # [G] int class (1 = Car)
    dims: jnp.ndarray        # [G, 3] (h, w, l) metres
    alpha: jnp.ndarray       # [G] viewpoint angle
    kpt_u: jnp.ndarray       # [G] visible perspective keypoint u (image px)
    kpt_type: jnp.ndarray    # [G] int corner index 0..3
    kpt_visible: jnp.ndarray # [G] bool — kpt inside the left box
    border_u: jnp.ndarray    # [G, 2] visible-boundary u (left, right)
    valid: jnp.ndarray       # [G] bool — padded/ignore slots are False
    location: jnp.ndarray    # [G, 3] 3D bottom-center (x, y, z), metres
    ry: jnp.ndarray          # [G] yaw around camera Y
    ignore: jnp.ndarray      # [G] bool — slot is an ignore REGION


def zeros_ground_truth(g: int) -> GroundTruth:
    """All-padding GroundTruth of capacity ``g`` (numpy leaves)."""
    import numpy as np
    return GroundTruth(
        left=np.zeros((g, 4), np.float32),
        right=np.zeros((g, 4), np.float32),
        cls=np.zeros((g,), np.int32),
        dims=np.zeros((g, 3), np.float32),
        alpha=np.zeros((g,), np.float32),
        kpt_u=np.zeros((g,), np.float32),
        kpt_type=np.zeros((g,), np.int32),
        kpt_visible=np.zeros((g,), bool),
        border_u=np.zeros((g, 2), np.float32),
        valid=np.zeros((g,), bool),
        location=np.zeros((g, 3), np.float32),
        ry=np.zeros((g,), np.float32),
        ignore=np.zeros((g,), bool),
    )


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray        # [A] int: 1 fg, 0 bg, -1 ignore
    weights: jnp.ndarray       # [A] float: 1 for the sampled 256 anchors
    box_targets: jnp.ndarray   # [A, 6] stereo deltas (defined where fg)
    num_fg: jnp.ndarray        # scalar
    num_sampled: jnp.ndarray   # scalar


def _sample_topk(eligible: jnp.ndarray, k: int, rng: jax.Array) -> jnp.ndarray:
    """Boolean mask selecting up to k eligible entries uniformly at random
    (fixed shapes; fewer than k eligible -> all of them)."""
    n = eligible.shape[0]
    priority = jnp.where(eligible, jax.random.uniform(rng, (n,)), -jnp.inf)
    kth = jax.lax.top_k(priority, k)[0][-1]
    return eligible & (priority >= kth)


def _ignore_fraction(boxes: jnp.ndarray, gt: GroundTruth) -> jnp.ndarray:
    """Max intersection-over-box-area of each box vs the ignore regions.

    Reference semantics (``lib/datasets/kitti.py`` DontCare handling):
    a candidate mostly inside an unlabeled-vehicle/DontCare region must not
    be mined as a background negative."""
    ign = gt.ignore
    lt = jnp.maximum(boxes[:, None, :2], gt.left[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], gt.left[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]                        # [A, G]
    area = jnp.maximum((boxes[:, 2] - boxes[:, 0]) *
                       (boxes[:, 3] - boxes[:, 1]), 1e-9)[:, None]
    frac = jnp.where(ign[None, :], inter / area, 0.0)
    return frac.max(axis=1)


def anchor_targets(anchors: jnp.ndarray, gt: GroundTruth, cfg: RPNConfig,
                   im_h: float, im_w: float, rng: jax.Array,
                   off: float = 0.0) -> AnchorTargets:
    """RPN targets for one image (vmap over batch).

    ``off`` is the box-width convention offset (``Config.box_off``): the
    reference's ``bbox_overlaps`` and ``bbox_transform`` both use the
    legacy "+1" widths, which shifts anchor IoUs against the 0.7/0.3
    thresholds by sub-pixel amounts.
    """
    a = anchors.shape[0]
    # allowed_border=0: only anchors fully inside the image participate
    # (reference _AnchorTargetLayer ``self._allowed_border = 0``).
    ab = cfg.allowed_border
    inside = ((anchors[:, 0] >= -ab) & (anchors[:, 1] >= -ab) &
              (anchors[:, 2] <= im_w + ab) & (anchors[:, 3] <= im_h + ab))

    gt_union = union_box(gt.left, gt.right)
    iou = pairwise_iou(anchors, gt_union, off)             # [A, G]
    # Only inside anchors participate (the reference subsets to inside
    # anchors BEFORE computing overlaps, so the best-anchor guarantee is
    # taken over inside anchors only).
    iou = jnp.where(gt.valid[None, :] & inside[:, None], iou, 0.0)
    max_iou = iou.max(axis=1)
    argmax_gt = iou.argmax(axis=1)

    labels = jnp.full((a,), -1, jnp.int32)
    labels = jnp.where(max_iou < cfg.negative_overlap, 0, labels)
    # Background anchors sitting mostly inside an ignore region go back to
    # "don't care" so they are never sampled as negatives.
    in_ignore = _ignore_fraction(anchors, gt) > cfg.ignore_overlap
    labels = jnp.where((labels == 0) & in_ignore, -1, labels)
    labels = jnp.where(max_iou >= cfg.positive_overlap, 1, labels)
    # Each gt's best anchor is positive even below threshold —
    # UNCONDITIONALLY, as in the reference (labels[gt_argmax_overlaps] = 1).
    # Guarded against all-zero IoU columns: a gt overlapping NO inside
    # anchor would otherwise promote argmax=0 (an arbitrary anchor) to
    # positive and regress it toward a possibly distant box.
    best_ok = gt.valid & (iou.max(axis=0) > 0.0)               # [G]
    best_per_gt = jnp.where(best_ok, iou.argmax(axis=0), -1)   # [G]
    is_best = jnp.zeros((a,), bool).at[best_per_gt].set(
        best_ok, mode="drop")
    labels = jnp.where(is_best, 1, labels)
    labels = jnp.where(inside, labels, -1)

    # Subsample: up to fg_fraction*batch positives, rest negatives.
    rng_fg, rng_bg = jax.random.split(rng)
    n_fg_max = int(cfg.batch_size * cfg.fg_fraction)
    fg_sel = _sample_topk(labels == 1, n_fg_max, rng_fg)
    n_fg = fg_sel.sum()
    bg_sel = _sample_topk(labels == 0, cfg.batch_size, rng_bg)
    # Keep only (batch_size - n_fg) backgrounds: drop the extras by
    # priority order — re-sample with the exact budget.
    bg_budget = cfg.batch_size - n_fg
    bg_priority = jnp.where(bg_sel, jax.random.uniform(rng_bg, (a,)),
                            -jnp.inf)
    order = jnp.argsort(-bg_priority)
    rank = jnp.zeros((a,), jnp.int32).at[order].set(jnp.arange(a))
    bg_sel = bg_sel & (rank < bg_budget)

    weights = (fg_sel | bg_sel).astype(jnp.float32)
    matched_left = gt.left[argmax_gt]
    matched_right = gt.right[argmax_gt]
    box_targets = encode_stereo_boxes(anchors, matched_left, matched_right,
                                      off)
    return AnchorTargets(labels=labels, weights=weights,
                         box_targets=box_targets, num_fg=n_fg,
                         num_sampled=weights.sum())


class RoiTargets(NamedTuple):
    rois_left: jnp.ndarray    # [S, 4] sampled proposals (gt-augmented)
    rois_right: jnp.ndarray   # [S, 4]
    cls: jnp.ndarray          # [S] int class target (0 = bg)
    weights: jnp.ndarray      # [S] 1.0 for sampled rois
    box_targets: jnp.ndarray  # [S, 6]
    dim_targets: jnp.ndarray  # [S, 3] gt_dims - mean_dims
    orien_targets: jnp.ndarray  # [S, 2] (sin a, cos a)
    kpt_bin: jnp.ndarray      # [S] int in [0, 4*grid) joint (type, u) bin
    kpt_weight: jnp.ndarray   # [S] 1.0 where the kpt loss applies
    border_bins: jnp.ndarray  # [S, 2] int boundary bins
    border_weight: jnp.ndarray  # [S]
    num_fg: jnp.ndarray


def proposal_targets(prop_left: jnp.ndarray, prop_right: jnp.ndarray,
                     prop_valid: jnp.ndarray, gt: GroundTruth,
                     cfg: RCNNConfig, rng: jax.Array,
                     off: float = 0.0) -> RoiTargets:
    """Sample second-stage rois + build all head targets for one image.

    Fixed output size S = cfg.rois_per_image.  GT pairs are appended to the
    proposal set before sampling (reference behavior) so foreground exists
    even early in training.
    """
    s = cfg.rois_per_image
    grid = cfg.kpt_grid

    cand_left = jnp.concatenate([prop_left, gt.left], axis=0)
    cand_right = jnp.concatenate([prop_right, gt.right], axis=0)
    cand_valid = jnp.concatenate([prop_valid, gt.valid], axis=0)

    iou = pairwise_iou(union_box(cand_left, cand_right),
                       union_box(gt.left, gt.right), off)
    iou = jnp.where(gt.valid[None, :], iou, 0.0)
    max_iou = jnp.where(cand_valid, iou.max(axis=1), 0.0)
    argmax_gt = iou.argmax(axis=1)

    is_fg = max_iou >= cfg.fg_thresh
    # Candidates mostly inside an ignore region are excluded from the
    # background pool (reference DontCare semantics).
    in_ignore = _ignore_fraction(cand_left, gt) > cfg.ignore_overlap
    is_bg = (max_iou < cfg.bg_thresh_hi) & (max_iou >= cfg.bg_thresh_lo) & \
        cand_valid & ~in_ignore

    rng_fg, rng_bg = jax.random.split(rng)
    n_fg_max = int(s * cfg.fg_fraction)
    fg_sel = _sample_topk(is_fg, n_fg_max, rng_fg)
    n_fg = fg_sel.sum()
    n = cand_left.shape[0]
    bg_priority = jnp.where(is_bg & ~fg_sel,
                            jax.random.uniform(rng_bg, (n,)), -jnp.inf)
    order = jnp.argsort(-bg_priority)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n))
    bg_sel = (bg_priority > -jnp.inf) & (rank < s - n_fg)

    # Gather the sampled rois into fixed [S]: fg first, then bg.
    sel_priority = jnp.where(fg_sel, 2.0, jnp.where(bg_sel, 1.0, 0.0)) \
        + jax.random.uniform(jax.random.fold_in(rng, 7), (n,)) * 0.5
    take = jax.lax.top_k(sel_priority, s)[1]               # [S]
    sel_fg = fg_sel[take]
    sel_any = (fg_sel | bg_sel)[take]

    rois_l = cand_left[take]
    rois_r = cand_right[take]
    g_idx = argmax_gt[take]
    cls = jnp.where(sel_fg, gt.cls[g_idx], 0).astype(jnp.int32)

    box_targets = encode_stereo_boxes(rois_l, gt.left[g_idx],
                                      gt.right[g_idx], off) \
        / jnp.asarray(cfg.bbox_target_stds)
    # Dim targets are offsets from the PER-CLASS mean size (reference
    # encodes dims relative to the class mean; ``mean_dims_hwl`` may be a
    # flat [3] shared across classes or [K-1, 3] per foreground class —
    # indexed here exactly as models/detector.py::postprocess_boxes decodes
    # them, so train/test stay inverse operations).  bg rows (cls 0) clamp
    # to class 1's mean; their dim loss weight is zero.
    mean_dims = jnp.asarray(cfg.mean_dims_hwl, jnp.float32).reshape(-1, 3)
    dim_targets = gt.dims[g_idx] - mean_dims[
        jnp.clip(cls - 1, 0, mean_dims.shape[0] - 1)]
    orien_targets = jnp.stack([jnp.sin(gt.alpha[g_idx]),
                               jnp.cos(gt.alpha[g_idx])], axis=-1)

    # Keypoint joint (type, u-bin) target within the LEFT roi.
    w = jnp.maximum(rois_l[:, 2] - rois_l[:, 0], 1e-3)
    rel = (gt.kpt_u[g_idx] - rois_l[:, 0]) / w
    in_roi = (rel >= 0.0) & (rel < 1.0)
    ubin = jnp.clip((rel * grid).astype(jnp.int32), 0, grid - 1)
    kpt_bin = gt.kpt_type[g_idx] * grid + ubin
    kpt_weight = (sel_fg & in_roi & gt.kpt_visible[g_idx]).astype(jnp.float32)

    rel_b = (gt.border_u[g_idx] - rois_l[:, 0:1]) / w[:, None]
    border_bins = jnp.clip((rel_b * grid).astype(jnp.int32), 0, grid - 1)
    border_in = (rel_b >= 0.0).all(-1) & (rel_b < 1.0).all(-1)
    border_weight = (sel_fg & border_in).astype(jnp.float32)

    return RoiTargets(
        rois_left=rois_l, rois_right=rois_r, cls=cls,
        weights=sel_any.astype(jnp.float32), box_targets=box_targets,
        dim_targets=dim_targets, orien_targets=orien_targets,
        kpt_bin=kpt_bin, kpt_weight=kpt_weight, border_bins=border_bins,
        border_weight=border_weight, num_fg=n_fg,
    )
