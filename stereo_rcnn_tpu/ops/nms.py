"""Fixed-shape, jit-able non-maximum suppression.

Behavioral reference: ``lib/model/csrc/cuda/nms.cu`` + wrapper
``lib/model/roi_layers/nms.py`` — greedy IoU suppression over
score-sorted boxes.  The CUDA bitmask design does not map to TPU; instead we
use the TPU-native formulation: one O(N^2) IoU matrix (VPU-friendly batched
arithmetic) followed by a sequential `lax.fori_loop` sweep over rows carrying
a keep/alive mask.  All shapes static; output is a padded index list.

For the stereo pipeline NMS always runs on the UNION box of each left/right
proposal pair (SURVEY.md §3.4 fact 3), which keeps pairs aligned — callers
pass whatever boxes define suppression.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stereo_rcnn_tpu.geometry.boxes import pairwise_iou


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh: float,
             valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy NMS keep-mask.

    Args:
      boxes: [N, 4] xyxy.
      scores: [N] — suppression visits boxes in descending score order.
      iou_thresh: IoU above which a lower-scored box is suppressed.
      valid: optional [N] bool; invalid boxes are never kept.

    Returns: [N] bool keep mask (in the ORIGINAL box order).
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)                      # high → low
    sorted_boxes = boxes[order]
    iou = pairwise_iou(sorted_boxes, sorted_boxes)    # [N, N]
    overlap = iou > iou_thresh

    if valid is not None:
        sorted_valid = valid[order]
    else:
        sorted_valid = jnp.ones((n,), dtype=bool)

    def body(i, alive):
        keep_i = alive[i]
        # If box i is kept, kill every later box that overlaps it.
        kill = overlap[i] & (jnp.arange(n) > i) & keep_i
        return alive & ~kill

    alive = jax.lax.fori_loop(0, n, body, sorted_valid)
    # Scatter back to original order.
    keep = jnp.zeros((n,), dtype=bool).at[order].set(alive)
    return keep


def nms_indices(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh: float,
                top_k: int, valid: jnp.ndarray | None = None):
    """NMS returning padded indices of the ``top_k`` surviving boxes by
    score, plus a validity mask.  Fixed output shape [top_k]."""
    keep = nms_mask(boxes, scores, iou_thresh, valid=valid)
    masked_scores = jnp.where(keep, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked_scores, top_k)
    out_valid = top_scores > -jnp.inf
    # Clamp indices of invalid slots to 0 so gathers stay in-bounds.
    top_idx = jnp.where(out_valid, top_idx, 0)
    return top_idx, out_valid
