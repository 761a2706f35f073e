"""Training: loss forward, optimizer, and the pjit-able train step.

Behavioral reference: ``trainval_net.py`` (SURVEY.md §3.2): SGD(momentum
0.9, lr 1e-3 decayed 10x at epoch 10), gradient clipping at 10, batch of
stereo pairs, 6 losses combined with learned uncertainty weights, frozen
conv1/layer1/all-BN (cfg.RESNET.FIXED_BLOCKS=1).

TPU design: one pure ``train_step(state, batch, rng)`` function, jitted
over a ``Mesh`` with the batch sharded on the ``data`` axis — XLA inserts
the gradient ``psum`` over ICI automatically from the sharding annotations
(no NCCL-style code; SURVEY.md §2.3).  All target assignment runs on-device
inside the same jit region.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from stereo_rcnn_tpu.config import Config
from stereo_rcnn_tpu.geometry.anchors import generate_anchors
from stereo_rcnn_tpu.models.detector import StereoRCNN, build_model, roi_features
from stereo_rcnn_tpu.models.stereo_rpn import select_proposals
from stereo_rcnn_tpu.train.losses import (LOSS_NAMES, combine_with_uncertainty,
                                          rcnn_losses, rpn_losses)
from stereo_rcnn_tpu.train.targets import (GroundTruth, anchor_targets,
                                           proposal_targets)


class Batch(NamedTuple):
    """One device-side training batch (leading dim B)."""

    images_left: jnp.ndarray   # [B, H, W, 3] mean-subtracted BGR
    images_right: jnp.ndarray  # [B, H, W, 3]
    gt: GroundTruth            # leaves [B, G, ...]


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any                # {'model': flax params, 'uncert': [6]}
    opt_state: Any


# ---------------------------------------------------------------------------
# Parameter partitioning: frozen vs decayed vs plain vs uncertainty.
# ---------------------------------------------------------------------------

def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def param_label(path, _leaf, freeze_stem: bool = True,
                train_bn: bool = False) -> str:
    """Optimizer partition for one param.

    ``freeze_stem`` mirrors the reference's FIXED_BLOCKS=1 (conv1 + layer1
    frozen) — that semantics presumes PRETRAINED caffe weights, so it only
    applies to the ``norm="frozen"`` backbone; a from-scratch GroupNorm or
    affine backbone trains its stem (freezing random weights would silently
    cap quality).  ``train_bn`` (the "affine" norm mode) lets the per-channel
    scale/bias train — REQUIRED there, because affine mode zero-initialises
    the residual-branch scales (zero-gamma) and a zeroed-out update would
    leave every residual branch permanently dead.
    """
    p = _path_str(path)
    segs = p.split("/")
    if segs[0] == "uncert":
        return "uncert"
    # GroupNorm ("group" backbone) affine params DO train (no decay).
    if "gn" in segs:
        return "plain"
    # BN constants: frozen (pretrained) unless in trainable-affine mode.
    if any(s.startswith("bn") or s.endswith("_bn") for s in segs):
        return "plain" if train_bn else "frozen"
    # Stem conv (directly under the backbone — NOT the bottleneck-internal
    # convs that share the name "conv1") and all of layer1.
    if freeze_stem and "backbone_net" in segs:
        nxt = segs[segs.index("backbone_net") + 1]
        if nxt == "conv1" or nxt.startswith("layer1_"):
            return "frozen"
    # Weight decay only on kernels (not biases).
    return "decay" if segs[-1] == "kernel" else "plain"


def make_optimizer(cfg: Config, steps_per_epoch: int):
    t = cfg.train
    boundaries = {t.lr_decay_step * steps_per_epoch: t.lr_decay_gamma}
    schedule = optax.piecewise_constant_schedule(t.learning_rate, boundaries)

    def sgd():
        return optax.sgd(schedule, momentum=t.momentum)

    tx = optax.chain(
        optax.clip_by_global_norm(t.grad_clip),
        optax.multi_transform(
            {
                "frozen": optax.set_to_zero(),
                "decay": optax.chain(
                    optax.add_decayed_weights(t.weight_decay), sgd()),
                "plain": sgd(),
                "uncert": sgd(),
            },
            lambda params: jax.tree_util.tree_map_with_path(
                functools.partial(
                    param_label,
                    freeze_stem=cfg.backbone.norm == "frozen",
                    train_bn=cfg.backbone.norm == "affine"),
                params),
        ),
    )
    return tx, schedule


def init_train_state(cfg: Config, rng: jax.Array, steps_per_epoch: int = 1000,
                     model_params=None) -> TrainState:
    from stereo_rcnn_tpu.models.detector import init_params
    if model_params is None:
        model_params = init_params(cfg, rng)
    params = {"model": model_params["params"],
              "uncert": jnp.zeros((len(LOSS_NAMES),), jnp.float32)}
    tx, _ = make_optimizer(cfg, steps_per_epoch)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))


# ---------------------------------------------------------------------------
# Loss forward.
# ---------------------------------------------------------------------------

def compute_losses(model: StereoRCNN, model_params, batch: Batch,
                   rng: jax.Array, cfg: Config) -> Dict[str, jnp.ndarray]:
    """All 6 losses, averaged over the local batch.

    The Pallas RoIAlign path is fully differentiable (custom_vjp with a
    Pallas backward kernel — see ops/roi_align_pallas.py), so training uses
    whichever ``cfg.rcnn.roi_align_impl`` the config selects."""
    b, im_h, im_w, _ = batch.images_left.shape
    variables = {"params": model_params}

    feats = model.apply(variables, jnp.concatenate(
        [batch.images_left, batch.images_right], 0), method=StereoRCNN.backbone)
    feats_l = [f[:b] for f in feats]
    feats_r = [f[b:] for f in feats]
    logits, deltas = model.apply(variables, feats_l, feats_r,
                                 method=StereoRCNN.rpn)

    anchors = generate_anchors(cfg.anchors, im_h, im_w, off=cfg.box_off)
    rngs = jax.random.split(rng, 2 * b)
    at = jax.vmap(lambda g, r: anchor_targets(anchors, g, cfg.rpn,
                                              im_h, im_w, r,
                                              off=cfg.box_off))(
        batch.gt, rngs[:b])
    rpn_l = jax.vmap(rpn_losses)(logits, deltas, at)

    # Proposals feed the second stage as constants (no grad through boxes).
    sel = functools.partial(select_proposals, anchors=anchors, im_h=im_h,
                            im_w=im_w, cfg=cfg.rpn, train=True,
                            off=cfg.box_off)
    props = jax.vmap(sel)(jax.lax.stop_gradient(logits),
                          jax.lax.stop_gradient(deltas))
    rt = jax.vmap(lambda pl, pr, pv, g, r: proposal_targets(
        pl, pr, pv, g, cfg.rcnn, r, off=cfg.box_off))(
        props.left, props.right, props.valid, batch.gt, rngs[b:])

    pooled = roi_features(model, feats_l, feats_r, rt.rois_left,
                          rt.rois_right)
    outs = model.apply(variables, pooled["concat"], method=StereoRCNN.heads)
    kpt_logits = model.apply(variables, pooled["left_kpt"],
                             method=StereoRCNN.keypoints)
    s = cfg.rcnn.rois_per_image
    outs = jax.tree.map(lambda x: x.reshape(b, s, *x.shape[1:]), outs)
    kpt_logits = kpt_logits.reshape(b, s, *kpt_logits.shape[1:])
    rc_l = jax.vmap(functools.partial(
        rcnn_losses, kpt_softmax=cfg.rcnn.kpt_softmax))(outs, kpt_logits, rt)

    losses = {**rpn_l, **rc_l}
    losses = {k: v.mean() for k, v in losses.items()}
    losses["num_fg_rpn"] = at.num_fg.astype(jnp.float32).mean()
    losses["num_fg_rcnn"] = rt.num_fg.astype(jnp.float32).mean()
    return losses


def make_train_step(cfg: Config, steps_per_epoch: int = 1000):
    """Returns ``step_fn(state, batch, rng) -> (state, metrics)`` — pure,
    jit/pjit it with the batch sharded over the mesh's data axis."""
    model = build_model(cfg)
    tx, schedule = make_optimizer(cfg, steps_per_epoch)

    def step_fn(state: TrainState, batch: Batch, rng: jax.Array):
        def loss_fn(params):
            losses = compute_losses(model, params["model"], batch, rng, cfg)
            total = combine_with_uncertainty(losses, params["uncert"])
            return total, losses

        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {**losses, "total": total,
                   "lr": schedule(state.step),
                   "grad_norm": optax.global_norm(grads)}
        metrics.update({f"uncert_{k}": params["uncert"][i]
                        for i, k in enumerate(LOSS_NAMES)})
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), metrics

    return step_fn
