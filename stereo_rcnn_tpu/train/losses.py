"""Detection losses + learned multi-task uncertainty weighting.

Behavioral reference: ``lib/model/utils/net_utils.py`` — ``_smooth_l1_loss``;
``trainval_net.py`` — the 6-way learned uncertainty combination
``total = sum_i loss_i * exp(-uncert_i) + uncert_i`` (SURVEY.md §2.2 Train
CLI row: this is why the released checkpoint name embeds a negative loss).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from stereo_rcnn_tpu.models.heads import RCNNOutputs
from stereo_rcnn_tpu.train.targets import AnchorTargets, RoiTargets

LOSS_NAMES = ("rpn_cls", "rpn_box", "rcnn_cls", "rcnn_box", "dim_orien",
              "kpt")


def smooth_l1(diff: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Huber/smooth-L1 (reference: net_utils._smooth_l1_loss, sigma form)."""
    ad = jnp.abs(diff)
    return jnp.where(ad < beta, 0.5 * ad ** 2 / beta, ad - 0.5 * beta)


def softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-element cross entropy with integer labels."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def rpn_losses(logits: jnp.ndarray, deltas: jnp.ndarray,
               tgt: AnchorTargets) -> Dict[str, jnp.ndarray]:
    """logits [A, 2], deltas [A, 6] for one image."""
    labels = jnp.maximum(tgt.labels, 0)
    ce = softmax_ce(logits, labels) * tgt.weights
    n = jnp.maximum(tgt.num_sampled, 1.0)
    cls_loss = ce.sum() / n

    fg = ((tgt.labels == 1) & (tgt.weights > 0)).astype(jnp.float32)
    box = smooth_l1(deltas - tgt.box_targets, beta=1.0 / 9.0).sum(-1) * fg
    # Reference normalizes by the FULL sampled anchor batch (outside_weights
    # = 1/RPN_BATCHSIZE), not the foreground count.
    box_loss = box.sum() / n
    return {"rpn_cls": cls_loss, "rpn_box": box_loss}


def rcnn_losses(out: RCNNOutputs, kpt_logits: jnp.ndarray,
                tgt: RoiTargets,
                kpt_softmax: str = "joint") -> Dict[str, jnp.ndarray]:
    """Head losses for one image's S sampled rois.

    kpt_logits: [S, 6, G].  ``kpt_softmax`` selects the perspective-keypoint
    loss semantics (config ``rcnn.kpt_softmax``; see that field's docs):
    "joint" = one CE over the flattened 4*G bins; "per_channel" = CE over G
    bins on the GT corner's channel only.
    """
    w = tgt.weights
    n = jnp.maximum(w.sum(), 1.0)
    cls_loss = (softmax_ce(out.cls_logits, tgt.cls) * w).sum() / n

    fg = (tgt.cls > 0).astype(jnp.float32) * w
    nfg = jnp.maximum(fg.sum(), 1.0)
    # Per-class regression: gather the deltas of the target class.
    cls_idx = tgt.cls[:, None, None]
    box_pred = jnp.take_along_axis(
        out.box_deltas, jnp.broadcast_to(cls_idx, (w.shape[0], 1, 6)),
        axis=1)[:, 0]
    box_loss = (smooth_l1(box_pred - tgt.box_targets).sum(-1) * fg).sum() / nfg

    dims_pred = jnp.take_along_axis(
        out.dims, jnp.broadcast_to(cls_idx, (w.shape[0], 1, 3)), 1)[:, 0]
    orien_pred = jnp.take_along_axis(
        out.orien, jnp.broadcast_to(cls_idx, (w.shape[0], 1, 2)), 1)[:, 0]
    dim_l = smooth_l1(dims_pred - tgt.dim_targets).sum(-1)
    ori_l = smooth_l1(orien_pred - tgt.orien_targets).sum(-1)
    dim_orien_loss = ((dim_l + ori_l) * fg).sum() / nfg

    # Perspective keypoint CE (semantics per `kpt_softmax`) + CE over G for
    # each boundary channel.  tgt.kpt_bin is always the flat joint index
    # (type * G + ubin), so both modes decode type/ubin from it.
    s, _, g = kpt_logits.shape
    if kpt_softmax == "joint":
        persp = kpt_logits[:, :4, :].reshape(s, 4 * g)
        kpt_ce = softmax_ce(persp, tgt.kpt_bin) * tgt.kpt_weight
    elif kpt_softmax == "per_channel":
        kpt_type = tgt.kpt_bin // g                       # [S] GT corner
        ubin = tgt.kpt_bin % g                            # [S] GT u-bin
        chan = jnp.take_along_axis(
            kpt_logits[:, :4, :],
            jnp.broadcast_to(kpt_type[:, None, None], (s, 1, g)),
            axis=1)[:, 0]                                 # [S, G]
        kpt_ce = softmax_ce(chan, ubin) * tgt.kpt_weight
    else:
        raise ValueError(f"rcnn.kpt_softmax: unknown mode {kpt_softmax!r} "
                         "(expected 'joint' or 'per_channel')")
    b_ce = (softmax_ce(kpt_logits[:, 4, :], tgt.border_bins[:, 0]) +
            softmax_ce(kpt_logits[:, 5, :], tgt.border_bins[:, 1])) \
        * tgt.border_weight
    denom = jnp.maximum(tgt.kpt_weight.sum() + tgt.border_weight.sum(), 1.0)
    kpt_loss = (kpt_ce.sum() + b_ce.sum()) / denom

    return {"rcnn_cls": cls_loss, "rcnn_box": box_loss,
            "dim_orien": dim_orien_loss, "kpt": kpt_loss}


def combine_with_uncertainty(losses: Dict[str, jnp.ndarray],
                             uncert: jnp.ndarray) -> jnp.ndarray:
    """total = sum_i loss_i * exp(-s_i) + s_i   (trainval_net.py)."""
    stacked = jnp.stack([losses[k] for k in LOSS_NAMES])
    return (stacked * jnp.exp(-uncert) + uncert).sum()
