"""2D box utilities and the stereo paired-box coder.

Behavioral reference: ``lib/model/rpn/bbox_transform.py`` —
``bbox_transform_inv``, ``clip_boxes``, ``bbox_overlaps`` and the stereo
6-tuple variant encoding ``[du, dv, dw, dh, du_r, dw_r]`` where the left and
right boxes of a pair share the same vertical extent (v, h) and are encoded
against one shared anchor.  Everything here is pure jnp with static shapes
and broadcasts cleanly under vmap/jit.

Box convention: ``[x1, y1, x2, y2]`` in pixel coordinates.  Every function
takes ``off`` — the box-width offset — selecting between the two historical
conventions:

* ``off=0.0`` — modern continuous boxes: width ``x2 - x1``.
* ``off=1.0`` — the reference's legacy "+1" inclusive-pixel convention
  (``bbox_transform.py``: ``widths = x2 - x1 + 1.0`` in ``bbox_transform``
  / ``bbox_transform_inv`` / ``bbox_overlaps``; ``clip_boxes`` clips to
  ``size - 1``).  Faithfully reproduced INCLUDING the decode asymmetry:
  the reference decodes ``x2 = ctr + 0.5 * w`` with no ``- 1``, so an
  encode→decode round trip inflates ``x2``/``y2`` by exactly ``off`` — a
  converted reference checkpoint only reproduces the reference's boxes if
  we keep that quirk.

Model/training call sites thread ``off`` from ``Config.box_offset``
(``box_convention: "legacy" | "continuous"``); sub-pixel width shifts move
IoU thresholds enough to change AP tenths (SURVEY §7 "hard parts"), so the
default is reference-exact.
"""

from __future__ import annotations

import jax.numpy as jnp

# Clamp on log-space size deltas at decode time (matches the reference's
# implicit clamp via cfg; prevents exp overflow on garbage background preds).
_MAX_DELTA_WH = 4.0


def box_area(boxes: jnp.ndarray, off: float = 0.0) -> jnp.ndarray:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0] + off, 0.0) * \
        jnp.maximum(boxes[..., 3] - boxes[..., 1] + off, 0.0)


def pairwise_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray,
                 off: float = 0.0) -> jnp.ndarray:
    """IoU matrix [N, M].  Reference: bbox_transform.bbox_overlaps
    (intersection width ``min(x2) - max(x1) + 1`` under the legacy
    convention)."""
    lt = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    rb = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = jnp.maximum(rb - lt + off, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes_a, off)[:, None] + \
        box_area(boxes_b, off)[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def union_box(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """Union (merged) box of an aligned L/R pair — used for paired NMS and
    for RPN anchor matching (reference matches anchors against merged GT)."""
    return jnp.concatenate([
        jnp.minimum(left[..., :2], right[..., :2]),
        jnp.maximum(left[..., 2:4], right[..., 2:4]),
    ], axis=-1)


def clip_boxes(boxes: jnp.ndarray, im_h, im_w, off: float = 0.0
               ) -> jnp.ndarray:
    """Clip to image bounds.  Reference: bbox_transform.clip_boxes (legacy
    clips the inclusive corner to ``size - 1``)."""
    x1 = jnp.clip(boxes[..., 0], 0.0, im_w - off)
    y1 = jnp.clip(boxes[..., 1], 0.0, im_h - off)
    x2 = jnp.clip(boxes[..., 2], 0.0, im_w - off)
    y2 = jnp.clip(boxes[..., 3], 0.0, im_h - off)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray, off: float = 0.0) -> jnp.ndarray:
    """Legacy (+1): ``w = x2 - x1 + 1``, ``ctr = x1 + 0.5 * w`` — exactly
    the reference's ``bbox_transform`` center (which sits ``+0.5`` past the
    true inclusive-pixel center; part of the faithful quirk set)."""
    wh = boxes[..., 2:4] - boxes[..., 0:2] + off
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
                        right: jnp.ndarray,
                        off: float = 0.0) -> jnp.ndarray:
    """[..., 4] anchors + [..., 4] left/right gt -> [..., 6] deltas."""
    a = xyxy_to_cxcywh(anchors, off)
    l = xyxy_to_cxcywh(left, off)
    r = xyxy_to_cxcywh(right, off)
    aw = jnp.maximum(a[..., 2], 1e-6)
    ah = jnp.maximum(a[..., 3], 1e-6)
    tx = (l[..., 0] - a[..., 0]) / aw
    ty = (l[..., 1] - a[..., 1]) / ah
    tw = jnp.log(jnp.maximum(l[..., 2], 1e-6) / aw)
    th = jnp.log(jnp.maximum(l[..., 3], 1e-6) / ah)
    tx_r = (r[..., 0] - a[..., 0]) / aw
    tw_r = jnp.log(jnp.maximum(r[..., 2], 1e-6) / aw)
    return jnp.stack([tx, ty, tw, th, tx_r, tw_r], axis=-1)


def decode_stereo_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray,
                        off: float = 0.0):
    """Inverse of :func:`encode_stereo_boxes`.

    Returns ``(left_boxes, right_boxes)`` each ``[..., 4]`` xyxy; the right
    box shares the decoded left (y, h).
    Reference: stereo variant of ``bbox_transform_inv``.  Under ``off=1``
    the corners come out ``x2 = ctr + 0.5 * w`` with NO ``- 1`` — the
    reference's decode asymmetry, kept deliberately (module docstring).
    """
    a = xyxy_to_cxcywh(anchors, off)
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


def encode_boxes(anchors: jnp.ndarray, gt: jnp.ndarray,
                 off: float = 0.0) -> jnp.ndarray:
    """Plain 4-tuple Faster-R-CNN encoding (used by tests/utility paths)."""
    return encode_stereo_boxes(anchors, gt, gt, off)[..., :4]


def decode_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray,
                 off: float = 0.0) -> jnp.ndarray:
    pad = jnp.stack([deltas[..., 0], deltas[..., 2]], axis=-1)
    left, _ = decode_stereo_boxes(anchors, jnp.concatenate([deltas, pad], -1),
                                  off)
    return left
