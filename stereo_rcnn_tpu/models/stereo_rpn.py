"""Stereo Region Proposal Network.

Behavioral reference: ``lib/model/rpn/stereo_rpn.py`` — ``_Stereo_RPN``:
per FPN level, a shared 3x3 conv over ``concat(P_L, P_R)`` (512 in) feeding
1x1 heads for objectness (2 per anchor, softmax) and the stereo 6-tuple
box deltas (6 per anchor); plus ``lib/model/rpn/proposal_layer.py`` —
``_ProposalLayer``: decode pairs, pre-NMS top-K by score, NMS on the UNION
box of each pair (keeps pairing), emit aligned left/right rois.

TPU design: the head is applied level-by-level with SHARED parameters (a
python loop over 5 levels — static, unrolled by trace); outputs are
flattened level-major to match anchor order and processed as one big
fixed-shape tensor.  Proposal selection is fully fixed-shape:
top-k → union-box NMS (`ops.nms`) → padded top-k, all inside jit.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stereo_rcnn_tpu.config import RPNConfig
from stereo_rcnn_tpu.geometry.boxes import (clip_boxes, decode_stereo_boxes,
                                            union_box)
from stereo_rcnn_tpu.ops.nms import nms_indices


class StereoRPNHead(nn.Module):
    """Shared-across-levels stereo RPN head.

    Input: lists of left/right pyramid features [H_l, W_l, C] per level
    (batch handled by caller via vmap or a leading batch axis).
    Output: (logits [A_total, 2], deltas [A_total, 6]) flattened level-major,
    row-major, anchor-minor — the order of ``geometry.anchors``.
    """

    num_anchors: int = 3
    conv_dim: int = 512
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats_left: Sequence[jnp.ndarray],
                 feats_right: Sequence[jnp.ndarray]):
        # Reference-parity init (rpn_fpn.py: normal_init 0.01 on all three,
        # zero bias); keeps init-time proposals/objectness near zero even
        # when the un-normalised backbone's features are large (see
        # RCNNHead's init comment).
        rpn_init = nn.initializers.normal(stddev=0.01)
        conv = nn.Conv(self.conv_dim, (3, 3), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype, name="rpn_conv",
                       kernel_init=rpn_init)
        cls_head = nn.Conv(self.num_anchors * 2, (1, 1), dtype=self.dtype,
                           name="rpn_cls", kernel_init=rpn_init)
        box_head = nn.Conv(self.num_anchors * 6, (1, 1), dtype=self.dtype,
                           name="rpn_box", kernel_init=rpn_init)
        logits_all: List[jnp.ndarray] = []
        deltas_all: List[jnp.ndarray] = []
        for fl, fr in zip(feats_left, feats_right):
            x = jnp.concatenate([fl, fr], axis=-1)          # [..., H, W, 2C]
            x = nn.relu(conv(x))
            logits = cls_head(x)                            # [..., H, W, 2A]
            deltas = box_head(x)                            # [..., H, W, 6A]
            lead = logits.shape[:-3]
            hw = logits.shape[-3] * logits.shape[-2]
            logits_all.append(
                logits.reshape(*lead, hw * self.num_anchors, 2))
            deltas_all.append(
                deltas.reshape(*lead, hw * self.num_anchors, 6))
        return (jnp.concatenate(logits_all, axis=-2).astype(jnp.float32),
                jnp.concatenate(deltas_all, axis=-2).astype(jnp.float32))


class Proposals(NamedTuple):
    left: jnp.ndarray     # [N, 4] left rois, padded
    right: jnp.ndarray    # [N, 4] aligned right rois
    scores: jnp.ndarray   # [N] objectness
    valid: jnp.ndarray    # [N] bool


def select_proposals(logits: jnp.ndarray, deltas: jnp.ndarray,
                     anchors: jnp.ndarray, im_h: int, im_w: int,
                     cfg: RPNConfig, train: bool,
                     off: float = 0.0) -> Proposals:
    """Fixed-shape proposal selection for ONE image pair.

    Reference: ``_ProposalLayer.forward`` — decode, clip, (min-size filter),
    pre-NMS top-K, union-box NMS, post-NMS top-N.  ``off`` is the box-width
    convention offset (``Config.box_off``).
    """
    pre_n = cfg.train_pre_nms_top_n if train else cfg.test_pre_nms_top_n
    post_n = cfg.train_post_nms_top_n if train else cfg.test_post_nms_top_n

    scores = jax.nn.softmax(logits, axis=-1)[..., 1]         # fg prob [A]
    left, right = decode_stereo_boxes(anchors, deltas, off)
    left = clip_boxes(left, im_h, im_w, off)
    right = clip_boxes(right, im_h, im_w, off)

    # Min-size filter on the left box (reference RPN_MIN_SIZE; legacy
    # widths are x2 - x1 + 1).
    w = left[:, 2] - left[:, 0] + off
    h = left[:, 3] - left[:, 1] + off
    ok = (w >= cfg.min_size) & (h >= cfg.min_size)
    scores = jnp.where(ok, scores, -1.0)

    # Pre-NMS top-K (static K).
    top_scores, top_idx = jax.lax.top_k(scores, pre_n)
    left_k = left[top_idx]
    right_k = right[top_idx]
    union_k = union_box(left_k, right_k)

    keep_idx, keep_valid = nms_indices(union_k, top_scores, cfg.nms_thresh,
                                       post_n, valid=top_scores >= 0,
                                       off=off)
    return Proposals(
        left=left_k[keep_idx],
        right=right_k[keep_idx],
        scores=top_scores[keep_idx],
        valid=keep_valid,
    )
