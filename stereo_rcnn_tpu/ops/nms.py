"""Fixed-shape, jit-able non-maximum suppression — TPU-native.

Behavioral reference: ``lib/model/csrc/cuda/nms.cu`` + wrapper
``lib/model/roi_layers/nms.py`` — greedy IoU suppression over score-sorted
boxes.  Neither the CUDA bitmask design nor a naive sequential sweep maps
well to TPU (a 1024-iteration ``fori_loop`` costs hundreds of ms); instead
we use **leader election**: each round, every still-alive box with no
higher-scored alive overlapper is a *leader* — greedy provably keeps it —
and every alive box overlapped by a leader is killed.  Each round is two
[N, N] @ [N] matvecs that land on the MXU, and the loop runs a fixed small
number of rounds (suppression chains at IoU~0.5-0.7 are shallow; each round
finalises at least one box, and in practice dozens).

Exactness: by induction over rounds, the kept set after round k equals the
greedy prefix whose decisions depend only on boxes finalised in earlier
rounds; with enough rounds the fixpoint IS greedy NMS.  Boxes still
undecided after ``rounds`` (pathological equal-score chains) are dropped —
they are by construction low-score chain tails.

For the stereo pipeline NMS always runs on the UNION box of each left/right
proposal pair (SURVEY.md §3.4 fact 3), which keeps pairs aligned — callers
pass whatever boxes define suppression.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stereo_rcnn_tpu.geometry.boxes import pairwise_iou

_DEFAULT_ROUNDS = 32


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh: float,
             valid: jnp.ndarray | None = None,
             rounds: int = _DEFAULT_ROUNDS,
             off: float = 0.0) -> jnp.ndarray:
    """Greedy NMS keep-mask (original box order).

    Args:
      boxes: [N, 4] xyxy.
      scores: [N] — suppression follows descending score order.
      iou_thresh: IoU above which a lower-scored box is suppressed.
      valid: optional [N] bool; invalid boxes are never kept.
      rounds: leader-election rounds (each >=1 box finalised per round).
      off: box-width convention offset (``Config.box_off``; the reference's
        CUDA nms uses the legacy "+1" widths).
    """
    n = boxes.shape[0]
    iou = pairwise_iou(boxes, boxes, off)
    overlap = (iou > iou_thresh).astype(jnp.float32)        # [N, N], sym
    idx = jnp.arange(n)
    # higher[j, i] = box j precedes box i in greedy order.
    higher = ((scores[:, None] > scores[None, :]) |
              ((scores[:, None] == scores[None, :]) &
               (idx[:, None] < idx[None, :]))).astype(jnp.float32)
    dominates = overlap * higher                            # [N(j), N(i)]

    alive0 = jnp.ones((n,), jnp.float32) if valid is None else \
        valid.astype(jnp.float32)

    def body(_, carry):
        alive, kept = carry
        # blocked_i = exists alive j that precedes i and overlaps it.
        blocked = (alive @ dominates) > 0.0                 # [N]
        leader = alive * (1.0 - blocked.astype(jnp.float32))
        kept = jnp.maximum(kept, leader)
        # kill everything a leader overlaps (leaders kill themselves out of
        # the alive set too — they are finalised as kept).
        killed = (leader @ overlap) > 0.0
        alive = alive * (1.0 - killed.astype(jnp.float32)) * \
            (1.0 - leader)
        return alive, kept

    _, kept = jax.lax.fori_loop(0, rounds, body,
                                (alive0, jnp.zeros((n,), jnp.float32)))
    return kept > 0.5


def nms_indices(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh: float,
                top_k: int, valid: jnp.ndarray | None = None,
                rounds: int = _DEFAULT_ROUNDS, off: float = 0.0):
    """NMS returning padded indices of the ``top_k`` surviving boxes by
    score, plus a validity mask.  Fixed output shape [top_k]."""
    keep = nms_mask(boxes, scores, iou_thresh, valid=valid, rounds=rounds,
                    off=off)
    masked_scores = jnp.where(keep, scores, -jnp.inf)
    k_eff = min(top_k, masked_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(masked_scores, k_eff)
    if k_eff < top_k:
        pad = top_k - k_eff
        top_scores = jnp.concatenate(
            [top_scores, jnp.full((pad,), -jnp.inf, top_scores.dtype)])
        top_idx = jnp.concatenate([top_idx, jnp.zeros((pad,), top_idx.dtype)])
    out_valid = top_scores > -jnp.inf
    # Clamp indices of invalid slots to 0 so gathers stay in-bounds.
    top_idx = jnp.where(out_valid, top_idx, 0)
    return top_idx, out_valid
