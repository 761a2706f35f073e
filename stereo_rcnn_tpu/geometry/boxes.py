"""2D box utilities and the stereo paired-box coder.

Behavioral reference: ``lib/model/rpn/bbox_transform.py`` —
``bbox_transform_inv``, ``clip_boxes``, ``bbox_overlaps`` and the stereo
6-tuple variant encoding ``[du, dv, dw, dh, du_r, dw_r]`` where the left and
right boxes of a pair share the same vertical extent (v, h) and are encoded
against one shared anchor.  Everything here is pure jnp with static shapes
and broadcasts cleanly under vmap/jit.

Box convention: ``[x1, y1, x2, y2]`` in pixel coordinates, inclusive corners
are NOT used — boxes are continuous (x2 > x1), widths are ``x2 - x1``.
(The reference uses the legacy "+1" pixel convention in places; we use the
modern continuous convention uniformly and note it here for parity reviews.)
"""

from __future__ import annotations

import jax.numpy as jnp

# Clamp on log-space size deltas at decode time (matches the reference's
# implicit clamp via cfg; prevents exp overflow on garbage background preds).
_MAX_DELTA_WH = 4.0


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0) * \
        jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)


def pairwise_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix [N, M].  Reference: bbox_transform.bbox_overlaps."""
    lt = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    rb = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes_a)[:, None] + box_area(boxes_b)[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def union_box(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """Union (merged) box of an aligned L/R pair — used for paired NMS and
    for RPN anchor matching (reference matches anchors against merged GT)."""
    return jnp.concatenate([
        jnp.minimum(left[..., :2], right[..., :2]),
        jnp.maximum(left[..., 2:4], right[..., 2:4]),
    ], axis=-1)


def clip_boxes(boxes: jnp.ndarray, im_h, im_w) -> jnp.ndarray:
    """Clip to image bounds.  Reference: bbox_transform.clip_boxes."""
    x1 = jnp.clip(boxes[..., 0], 0.0, im_w)
    y1 = jnp.clip(boxes[..., 1], 0.0, im_h)
    x2 = jnp.clip(boxes[..., 2], 0.0, im_w)
    y2 = jnp.clip(boxes[..., 3], 0.0, im_h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    wh = boxes[..., 2:4] - boxes[..., 0:2]
    c = boxes[..., 0:2] + 0.5 * wh
    return jnp.concatenate([c, wh], axis=-1)


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    half = 0.5 * boxes[..., 2:4]
    return jnp.concatenate([boxes[..., :2] - half, boxes[..., :2] + half],
                           axis=-1)


# ---------------------------------------------------------------------------
# Stereo 6-tuple coder.
#
# A proposal pair is represented as 6 numbers against one anchor
# (xa, ya, wa, ha):
#   t = [tx, ty, tw, th, tx_r, tw_r]
# where (tx, ty, tw, th) encode the LEFT box exactly like Faster R-CNN and
# (tx_r, tw_r) encode the RIGHT box's horizontal center/width against the
# same anchor.  The right box inherits (y, h) from the left box — rectified
# stereo shares vertical extent (SURVEY.md §3.4 fact 3).
# ---------------------------------------------------------------------------

def encode_stereo_boxes(anchors: jnp.ndarray, left: jnp.ndarray,
                        right: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] anchors + [..., 4] left/right gt -> [..., 6] deltas."""
    a = xyxy_to_cxcywh(anchors)
    l = xyxy_to_cxcywh(left)
    r = xyxy_to_cxcywh(right)
    aw = jnp.maximum(a[..., 2], 1e-6)
    ah = jnp.maximum(a[..., 3], 1e-6)
    tx = (l[..., 0] - a[..., 0]) / aw
    ty = (l[..., 1] - a[..., 1]) / ah
    tw = jnp.log(jnp.maximum(l[..., 2], 1e-6) / aw)
    th = jnp.log(jnp.maximum(l[..., 3], 1e-6) / ah)
    tx_r = (r[..., 0] - a[..., 0]) / aw
    tw_r = jnp.log(jnp.maximum(r[..., 2], 1e-6) / aw)
    return jnp.stack([tx, ty, tw, th, tx_r, tw_r], axis=-1)


def decode_stereo_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray):
    """Inverse of :func:`encode_stereo_boxes`.

    Returns ``(left_boxes, right_boxes)`` each ``[..., 4]`` xyxy; the right
    box shares the decoded left (y, h).
    Reference: stereo variant of ``bbox_transform_inv``.
    """
    a = xyxy_to_cxcywh(anchors)
    aw, ah = a[..., 2], a[..., 3]
    cx = a[..., 0] + deltas[..., 0] * aw
    cy = a[..., 1] + deltas[..., 1] * ah
    w = aw * jnp.exp(jnp.clip(deltas[..., 2], -_MAX_DELTA_WH, _MAX_DELTA_WH))
    h = ah * jnp.exp(jnp.clip(deltas[..., 3], -_MAX_DELTA_WH, _MAX_DELTA_WH))
    cx_r = a[..., 0] + deltas[..., 4] * aw
    w_r = aw * jnp.exp(jnp.clip(deltas[..., 5], -_MAX_DELTA_WH, _MAX_DELTA_WH))
    left = cxcywh_to_xyxy(jnp.stack([cx, cy, w, h], axis=-1))
    right = cxcywh_to_xyxy(jnp.stack([cx_r, cy, w_r, h], axis=-1))
    return left, right


def encode_boxes(anchors: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Plain 4-tuple Faster-R-CNN encoding (used by tests/utility paths)."""
    return encode_stereo_boxes(anchors, gt, gt)[..., :4]


def decode_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    pad = jnp.stack([deltas[..., 0], deltas[..., 2]], axis=-1)
    left, _ = decode_stereo_boxes(anchors, jnp.concatenate([deltas, pad], -1))
    return left
