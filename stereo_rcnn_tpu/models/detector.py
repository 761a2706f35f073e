"""The flagship model: Stereo R-CNN, end-to-end jit-compiled.

Behavioral reference: ``lib/model/stereo_rcnn/stereo_rcnn.py`` —
``_StereoRCNN.forward`` (SURVEY.md §3.4): shared-weight backbone over left
and right images, stereo RPN on per-level concatenated features, paired
RoIAlign (left feats x left rois, right feats x right rois), concatenated
pooled features through the FC trunk to cls/box/dim-orien heads, and a
keypoint branch on left pooled features.

TPU design:
  * The left/right backbone applications are fused into ONE batched call
    ([2B, H, W, 3]) — twice the MXU batch, zero extra weights.
  * Every stage is fixed-shape; per-image ragged work (proposal selection,
    RoIAlign) is vmapped over the batch.
  * Inference postprocessing (per-class NMS, top-k detections) is inside
    jit; the host only receives final padded detections.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from stereo_rcnn_tpu.config import Config
from stereo_rcnn_tpu.geometry.anchors import generate_anchors
from stereo_rcnn_tpu.geometry.boxes import (clip_boxes, decode_stereo_boxes,
                                            union_box)
from stereo_rcnn_tpu.models.heads import KeypointHead, RCNNHead, RCNNOutputs
from stereo_rcnn_tpu.models.resnet_fpn import ResNetFPN
from stereo_rcnn_tpu.models.stereo_rpn import (Proposals, StereoRPNHead,
                                               select_proposals)
from stereo_rcnn_tpu.ops.nms import nms_indices
from stereo_rcnn_tpu.ops.roi_align import multilevel_roi_align
from stereo_rcnn_tpu.ops.roi_align_pallas import (
    stereo_roi_align_batched_packed)


class StereoRCNN(nn.Module):
    """Container module exposing the three parameterised stages.

    Use the ``backbone`` / ``rpn`` / ``heads`` methods via
    ``module.apply(params, ..., method=...)``; composition lives in the
    functional pipelines below so that training can interpose target
    sampling between RPN and the heads.
    """

    cfg: Config

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        self.backbone_net = ResNetFPN(
            depth=c.backbone.depth, fpn_dim=c.backbone.fpn_dim,
            frozen_stages=c.backbone.frozen_stages, dtype=dtype,
            norm=c.backbone.norm, upsample=c.backbone.fpn_upsample,
            remat=c.backbone.remat)
        self.rpn_head = StereoRPNHead(
            num_anchors=c.anchors.num_anchors_per_cell,
            conv_dim=c.rpn.conv_dim, dtype=dtype)
        self.rcnn_head = RCNNHead(num_classes=c.rcnn.num_classes,
                                  fc_dim=c.rcnn.fc_dim, dtype=dtype)
        self.kpt_head = KeypointHead(grid=c.rcnn.kpt_grid, dtype=dtype)

    def backbone(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """images: [N, H, W, 3] mean-subtracted BGR."""
        return self.backbone_net(images)

    def rpn(self, feats_left, feats_right):
        return self.rpn_head(feats_left, feats_right)

    def heads(self, pooled_concat: jnp.ndarray) -> RCNNOutputs:
        return self.rcnn_head(pooled_concat)

    def keypoints(self, pooled_left: jnp.ndarray) -> jnp.ndarray:
        return self.kpt_head(pooled_left)

    def __call__(self, images_left: jnp.ndarray, images_right: jnp.ndarray):
        """Init-friendly full pass on one batch (inference path).

        Runs the keypoint branch on one RoI's pooled features so that
        ``init`` creates its parameters (the inference fast path defers
        keypoints until after NMS and doesn't touch them here)."""
        raw = forward_raw(self, images_left, images_right, train=False)
        pk = self.cfg.rcnn.kpt_pool_size
        c = raw["kpt_feats"].shape[-1]
        self.kpt_head(raw["kpt_feats"][0, :1, :pk * pk].reshape(
            1, pk, pk, c))
        return raw


# ---------------------------------------------------------------------------
# Functional composition (usable both inside module.init and under apply).
# ---------------------------------------------------------------------------

def forward_raw(model: StereoRCNN, images_left: jnp.ndarray,
                images_right: jnp.ndarray, train: bool):
    """Backbone + RPN + proposals + paired RoIAlign + heads, batched.

    Returns a dict of raw network outputs with static shapes.
    """
    cfg = model.cfg
    b, im_h, im_w, _ = images_left.shape

    # One fused backbone call for both streams (shared weights).
    feats = model.backbone(jnp.concatenate([images_left, images_right], 0))
    feats_l = [f[:b] for f in feats]
    feats_r = [f[b:] for f in feats]

    logits, deltas = model.rpn(feats_l, feats_r)             # [B, A, 2|6]

    anchors = generate_anchors(cfg.anchors, im_h, im_w, off=cfg.box_off)
    sel = functools.partial(select_proposals, anchors=anchors, im_h=im_h,
                            im_w=im_w, cfg=cfg.rpn, train=train,
                            off=cfg.box_off)
    props: Proposals = jax.vmap(sel)(logits, deltas)         # [B, N, ...]

    pooled = roi_features(model, feats_l, feats_r, props.left, props.right)
    outputs = model.heads(pooled["concat"])

    # The keypoint CONVS are deferred to after NMS (run_keypoints): at
    # ~0.9 GFLOP per RoI they were ~30% of inference time when applied to
    # all test_post_nms_top_n proposals, yet only the ~max_detections
    # survivors are ever decoded.  The pooled 14x14 features travel as
    # PACKED ROWS [B, N, rows, C] (rows >= pk*pk; the first pk*pk rows
    # are the kpt samples): run_keypoints gathers its D<<N survivors
    # BEFORE slicing, so the full-size [B*N] kpt block is never
    # re-materialized outside the RoIAlign kernel's own output.
    n = props.left.shape[1]
    rows = pooled["left_kpt_rows"].shape[1]
    return {
        "rpn_logits": logits,
        "rpn_deltas": deltas,
        "anchors": anchors,
        "proposals": props,
        "rcnn": jax.tree.map(lambda x: x.reshape(b, n, *x.shape[1:]),
                             outputs),
        "kpt_feats": pooled["left_kpt_rows"].reshape(
            b, n, rows, pooled["left_kpt_rows"].shape[-1]),
    }


def roi_features(model: StereoRCNN, feats_l, feats_r, rois_left, rois_right):
    """Paired multilevel RoIAlign producing the head inputs.

    rois_*: [B, N, 4].  Returns dict with
      concat: [B*N, P, P, 2C]  (left||right, for the FC trunk)
      left_kpt: [B*N, Pk, Pk, C] (left-only, for the keypoint branch —
        a slice of left_kpt_rows; consumed by training, DCE'd by the
        inference path which slices after the survivor gather instead)
      left_kpt_rows: [B*N, rows, C] with rows >= Pk*Pk; the first Pk*Pk
        rows are the kpt samples (for the Pallas path this is the
        kernel's raw packed output, rows = Pk*Pk + 2*P*P)
    """
    cfg = model.cfg
    strides = cfg.anchors.strides[:4]                 # rois use P2..P5 only
    p = cfg.rcnn.pooling_size
    pk = cfg.rcnn.kpt_pool_size
    sr = cfg.rcnn.sampling_ratio

    b, n = rois_left.shape[:2]
    if cfg.rcnn.roi_align_impl == "pallas":
        # Fused stereo kernel: left 7x7 + right 7x7 + left 14x14 in one
        # grid pass (the 7x7/sr2 and 14x14/sr1 sample positions coincide,
        # so one sampling pass serves both left outputs).  Differentiable:
        # custom_vjp backward is a Pallas hat-matrix-transpose kernel, so
        # training uses this path too (interpret mode auto-enables off-TPU).
        # The kernel emits ONE packed block per roi; consumers slice it
        # lazily (see stereo_roi_align_batched_packed docstring).
        packed = stereo_roi_align_batched_packed(
            tuple(feats_l[:4]), tuple(feats_r[:4]), rois_left, rois_right,
            tuple(strides), p, pk, None,
            cfg.rcnn.roi_align_hat)                   # [B, N, rows, C]
        c = packed.shape[-1]
        kk, pp = pk * pk, p * p
        flat = packed.reshape(b * n, kk + 2 * pp, c)
        pl_ = flat[:, kk:kk + pp].reshape(b * n, p, p, c)
        pr_ = flat[:, kk + pp:].reshape(b * n, p, p, c)
        return {
            "concat": jnp.concatenate([pl_, pr_], axis=-1),
            "left_kpt": flat[:, :kk].reshape(b * n, pk, pk, c),
            "left_kpt_rows": flat,
        }

    def align(feats, rois, size, sampling):
        return multilevel_roi_align(list(feats[:4]), rois, strides,
                                    size, sampling)

    pl_ = align(feats_l, rois_left, p, sr)
    pr_ = align(feats_r, rois_right, p, sr)
    # Keypoint pool: 14x14 output already oversamples the bins — use
    # sampling_ratio 1 (same positions as the 7x7/sr-2 pools).
    pk_l = align(feats_l, rois_left, pk, 1)
    c = pl_.shape[-1]
    return {
        "concat": jnp.concatenate([pl_, pr_], axis=-1)
                    .reshape(b * n, p, p, 2 * c),
        "left_kpt": pk_l.reshape(b * n, pk, pk, c),
        "left_kpt_rows": pk_l.reshape(b * n, pk * pk, c),
    }


# ---------------------------------------------------------------------------
# Inference post-processing: final detections (fixed shape).
# ---------------------------------------------------------------------------

class Detections(NamedTuple):
    """Padded per-image detections (all [B, D, ...])."""

    box_left: jnp.ndarray     # [B, D, 4]
    box_right: jnp.ndarray    # [B, D, 4]
    score: jnp.ndarray        # [B, D]
    cls: jnp.ndarray          # [B, D] int (1 = Car)
    dims: jnp.ndarray         # [B, D, 3] (h, w, l) metres
    alpha: jnp.ndarray        # [B, D] viewpoint angle
    kpt_u: jnp.ndarray        # [B, D] perspective keypoint u (image px)
    kpt_type: jnp.ndarray     # [B, D] int corner index 0..3 of that keypoint
    kpt_prob: jnp.ndarray     # [B, D] confidence of the keypoint peak
    border_u: jnp.ndarray     # [B, D, 2] visible-boundary u (image px)
    valid: jnp.ndarray        # [B, D] bool


def postprocess_boxes(raw: dict, cfg: Config, im_h: int, im_w: int):
    """Decode head outputs into final padded detections, per image.

    Reference: the decode + per-class threshold + NMS block of ``demo.py`` /
    ``test_net.py`` (SURVEY.md §3.1 "post" step).

    Returns ``(det, idx, rois)``: detections whose keypoint fields are
    placeholders (filled by ``run_keypoints``), the [B, D] surviving
    proposal indices, and the [B, D, 4] PROPOSAL boxes those detections
    decoded from (the keypoint bins are defined against the proposal).
    """

    # Per-class decode + per-class NMS (the reference's Car-only release is
    # the K=2 special case; upstream ``test_net.py`` loops classes the same
    # way).  Each foreground class runs the class-indexed block under a
    # vmap, then the per-class survivor lists are merged by a global top-k
    # on score so the output stays the fixed [max_detections] layout the
    # solver/alignment stages compile against.  ``mean_dims_hwl`` may be a
    # flat [3] (shared across classes) or [K-1, 3] (per foreground class).
    rc_ = cfg.rcnn
    mean_dims = jnp.asarray(rc_.mean_dims_hwl, jnp.float32).reshape(-1, 3)
    if mean_dims.shape[0] not in (1, rc_.num_classes - 1):
        raise ValueError(
            f"mean_dims_hwl must be [3] or [(num_classes-1), 3]; got "
            f"{mean_dims.shape} for num_classes={rc_.num_classes}")

    def one_image(props: Proposals, rcnn: RCNNOutputs):
        rc = cfg.rcnn
        probs = jax.nn.softmax(rcnn.cls_logits, axis=-1)     # [N, K]
        off = cfg.box_off
        stds = jnp.asarray(rc.bbox_target_stds)

        def per_class(c):
            score = jnp.where(props.valid, probs[:, c], 0.0)
            # Un-normalize: training targets are divided by
            # BBOX_NORMALIZE_STDS (reference test-time ``bbox_pred * stds
            # + means`` with zero means).
            deltas = rcnn.box_deltas[:, c, :] * stds
            box_l, box_r = decode_stereo_boxes(props.left, deltas, off)
            box_l = clip_boxes(box_l, im_h, im_w, off)
            box_r = clip_boxes(box_r, im_h, im_w, off)
            keep = score >= rc.score_thresh
            idx, valid = nms_indices(union_box(box_l, box_r), score,
                                     rc.final_nms_thresh, rc.max_detections,
                                     valid=keep, off=off)
            dims = (mean_dims[jnp.minimum(c - 1, mean_dims.shape[0] - 1)]
                    + rcnn.dims[idx, c, :])
            sin_a, cos_a = rcnn.orien[idx, c, 0], rcnn.orien[idx, c, 1]
            score = score[idx]
            d = idx.shape[0]
            zeros = jnp.zeros((d,), jnp.float32)
            det = Detections(
                box_left=box_l[idx], box_right=box_r[idx], score=score,
                cls=jnp.full((d,), c, jnp.int32),
                dims=dims, alpha=jnp.arctan2(sin_a, cos_a),
                kpt_u=zeros, kpt_type=jnp.zeros((d,), jnp.int32),
                kpt_prob=zeros, border_u=jnp.zeros((d, 2), jnp.float32),
                valid=valid & (score > 0),
            )
            return det, idx, props.left[idx]

        dets, idxs, rois = jax.vmap(per_class)(
            jnp.arange(1, rc.num_classes))            # [K-1, D, ...]

        flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), dets)
        # Global top-k over all classes' survivors: with K=2 this is an
        # identity re-sort (nms_indices already orders by score).
        order = jax.lax.top_k(jnp.where(flat.valid, flat.score, -1.0),
                              rc.max_detections)[1]
        det = jax.tree.map(lambda x: x[order], flat)
        idx = idxs.reshape(-1)[order]
        roi = rois.reshape((-1,) + rois.shape[2:])[order]
        return det, idx, roi

    return jax.vmap(one_image)(raw["proposals"], raw["rcnn"])


def decode_keypoints(kpt_logits: jnp.ndarray, rois: jnp.ndarray,
                     kpt_softmax: str = "joint"):
    """Keypoint decode (reference semantics, SURVEY.md §3.4 fact 5 —
    explicitly uncertain, hence the ``kpt_softmax`` parity switch,
    config ``rcnn.kpt_softmax``):

    - "joint": channels 0..3 form a JOINT distribution over (corner
      type, u-bin) — softmax over 4*G — localising which vertical edge
      is visible and where (our default reconstruction).
    - "per_channel": each corner-type channel is an independent G-bin
      softmax; the decoded keypoint is the highest per-channel
      probability across all four channels.  NOTE the argmax differs
      from "joint" in general: per-channel normalisers reorder peaks
      across channels even though within-channel order is preserved.

    Channels 4..5 are independent G-bin boundary distributions in both
    modes.  Bins span the PROPOSAL RoI the keypoint branch pooled (the
    same box the training targets in train/targets.py are defined
    against), NOT the regressed box — decoding against the regressed box
    would shift kpt_u/border_u by the regression delta.

    kpt_logits: [D, 6, G]; rois: [D, 4] proposal boxes.
    """
    kl = kpt_logits
    d, _, g = kl.shape
    if kpt_softmax == "joint":
        persp_prob = jax.nn.softmax(kl[:, :4, :].reshape(d, 4 * g), axis=-1)
    elif kpt_softmax == "per_channel":
        persp_prob = jax.nn.softmax(kl[:, :4, :], axis=-1).reshape(d, 4 * g)
    else:
        raise ValueError(f"rcnn.kpt_softmax: unknown mode {kpt_softmax!r} "
                         "(expected 'joint' or 'per_channel')")
    flat_idx = jnp.argmax(persp_prob, axis=-1)           # [D]
    kpt_type = (flat_idx // g).astype(jnp.int32)
    kpt_bin = (flat_idx % g).astype(jnp.float32)
    peak = jnp.take_along_axis(persp_prob, flat_idx[:, None], 1)[:, 0]
    w = jnp.maximum(rois[:, 2] - rois[:, 0], 1e-3)
    kpt_u = rois[:, 0] + (kpt_bin + 0.5) / g * w         # [D]
    border_bin = jnp.argmax(kl[:, 4:6, :], axis=-1).astype(jnp.float32)
    border_u = rois[:, 0:1] + (border_bin + 0.5) / g * w[:, None]
    return kpt_u, kpt_type, peak, border_u


def run_keypoints(model: StereoRCNN, params, raw: dict, det: Detections,
                  idx: jnp.ndarray, rois: jnp.ndarray) -> Detections:
    """Run the keypoint convs on the NMS SURVIVORS only and fill the
    keypoint fields of ``det``.

    The branch costs ~0.9 GFLOP per RoI; gathering the already-pooled
    14x14 features for the D<<N surviving proposals before the convs cuts
    the branch's work ~10x with bit-identical results (same features,
    same weights, fewer rows).  ``raw["kpt_feats"]`` is [B, N, rows, C]
    packed rows (first pk*pk rows = the kpt samples); slicing AFTER the
    gather keeps the full-size block un-rematerialized.
    """
    kf = jax.vmap(lambda f, i: f[i])(raw["kpt_feats"], idx)  # [B,D,rows,C]
    b, d = kf.shape[:2]
    pk = model.cfg.rcnn.kpt_pool_size
    kf = kf[:, :, :pk * pk].reshape(b * d, pk, pk, kf.shape[-1])
    kl = model.apply(params, kf, method=lambda m, x: m.keypoints(x))
    kl = kl.reshape(b, d, *kl.shape[1:])                     # [B, D, 6, G]
    dec = functools.partial(decode_keypoints,
                            kpt_softmax=model.cfg.rcnn.kpt_softmax)
    kpt_u, kpt_type, peak, border_u = jax.vmap(dec)(kl, rois)
    return det._replace(kpt_u=kpt_u, kpt_type=kpt_type, kpt_prob=peak,
                        border_u=border_u)


def build_model(cfg: Config) -> StereoRCNN:
    return StereoRCNN(cfg=cfg)


def init_params(cfg: Config, rng: jax.Array, im_h: int | None = None,
                im_w: int | None = None):
    model = build_model(cfg)
    h = im_h or cfg.data.image_h
    w = im_w or cfg.data.image_w
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    # jit the init: eager init dispatches thousands of tiny ops (minutes on
    # a remote TPU); compiled it is one program.
    return jax.jit(model.init)(rng, dummy, dummy)


def make_inference_fn(cfg: Config, im_h: int | None = None,
                      im_w: int | None = None):
    """Returns jittable ``fn(params, images_left, images_right) ->
    Detections`` — the canonical end-to-end inference path."""
    model = build_model(cfg)
    h = im_h or cfg.data.image_h
    w = im_w or cfg.data.image_w

    def fn(params, images_left, images_right):
        raw = model.apply(params, images_left, images_right,
                          method=lambda m, l, r: forward_raw(m, l, r,
                                                             train=False))
        det, idx, rois = postprocess_boxes(raw, cfg, h, w)
        return run_keypoints(model, params, raw, det, idx, rois)

    return fn
