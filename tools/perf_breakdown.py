#!/usr/bin/env python
"""Stage-wise latency breakdown of the inference pipeline on the real TPU.

Times nested prefixes of the pipeline (backbone -> +RPN+proposals ->
+RoIAlign -> +heads -> +postprocess/NMS -> +3D solve+align) so the
difference between consecutive rows is the cost of that stage.  Guides
the single-chip perf push (VERDICT round 1 item 5).

Usage: python tools/perf_breakdown.py [--batch 16] [--iters 20]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--impl", default="pallas", choices=["pallas", "xla"])
    args = ap.parse_args()

    from stereo_rcnn_tpu.utils.cache import enable_compile_cache
    enable_compile_cache("perf")
    import dataclasses
    from stereo_rcnn_tpu.config import Config
    from stereo_rcnn_tpu.data.synthetic import synthetic_batch
    from stereo_rcnn_tpu.geometry.anchors import generate_anchors
    from stereo_rcnn_tpu.inference import solve_and_align, broadcast_calib
    from stereo_rcnn_tpu.models import build_model, init_params
    from stereo_rcnn_tpu.models.detector import (forward_raw,
                                                 postprocess_boxes,
                                                 roi_features, run_keypoints)
    from stereo_rcnn_tpu.models.stereo_rpn import select_proposals

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, rcnn=dataclasses.replace(cfg.rcnn, roi_align_impl=args.impl))
    h, w = cfg.data.image_h, cfg.data.image_w
    model = build_model(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    il, ir, _, calib = synthetic_batch(cfg, batch=args.batch, seed=7,
                                       n_objects=5)
    left, right = jnp.asarray(il), jnp.asarray(ir)
    calib_b = broadcast_calib(calib, args.batch)

    def backbone_only(params, l, r):
        feats = model.apply(params, jnp.concatenate([l, r], 0),
                            method=lambda m, x: m.backbone(x))
        return [f.sum() for f in feats]

    def upto_rpn(params, l, r):
        b = l.shape[0]
        feats = model.apply(params, jnp.concatenate([l, r], 0),
                            method=lambda m, x: m.backbone(x))
        fl = [f[:b] for f in feats]
        fr = [f[b:] for f in feats]
        logits, deltas = model.apply(params, fl, fr,
                                     method=lambda m, a, c: m.rpn(a, c))
        anchors = generate_anchors(cfg.anchors, h, w, off=cfg.box_off)
        sel = functools.partial(select_proposals, anchors=anchors, im_h=h,
                                im_w=w, cfg=cfg.rpn, train=False,
                                off=cfg.box_off)
        props = jax.vmap(sel)(logits, deltas)
        return props.left.sum(), props.valid.sum()

    def upto_roialign(params, l, r):
        b = l.shape[0]
        feats = model.apply(params, jnp.concatenate([l, r], 0),
                            method=lambda m, x: m.backbone(x))
        fl = [f[:b] for f in feats]
        fr = [f[b:] for f in feats]
        logits, deltas = model.apply(params, fl, fr,
                                     method=lambda m, a, c: m.rpn(a, c))
        anchors = generate_anchors(cfg.anchors, h, w, off=cfg.box_off)
        sel = functools.partial(select_proposals, anchors=anchors, im_h=h,
                                im_w=w, cfg=cfg.rpn, train=False,
                                off=cfg.box_off)
        props = jax.vmap(sel)(logits, deltas)
        pooled = model.apply(
            params, fl, fr, props.left, props.right,
            method=lambda m, a, c, rl, rr: roi_features(m, a, c, rl, rr))
        return pooled["concat"].sum()

    def full_net(params, l, r):
        raw = model.apply(params, l, r,
                          method=lambda m, a, c: forward_raw(m, a, c,
                                                             train=False))
        return raw["rcnn"].cls_logits.sum(), raw["kpt_feats"].sum()

    def with_post(params, l, r):
        raw = model.apply(params, l, r,
                          method=lambda m, a, c: forward_raw(m, a, c,
                                                             train=False))
        det, idx, rois = postprocess_boxes(raw, cfg, h, w)
        det = run_keypoints(model, params, raw, det, idx, rois)
        return det.box_left.sum(), det.kpt_u.sum(), det.valid.sum()

    def full_3d(params, l, r):
        raw = model.apply(params, l, r,
                          method=lambda m, a, c: forward_raw(m, a, c,
                                                             train=False))
        det, idx, rois = postprocess_boxes(raw, cfg, h, w)
        det = run_keypoints(model, params, raw, det, idx, rois)
        out = solve_and_align(det, l, r, calib_b, cfg)
        return out.position.sum(), out.z_refined.sum()

    stages = [("backbone(LR)", backbone_only), ("+rpn+proposals", upto_rpn),
              ("+roialign", upto_roialign), ("+heads", full_net),
              ("+postprocess+kpt", with_post), ("+solve+align", full_3d)]

    prev = 0.0
    print(f"batch={args.batch} impl={args.impl} res={h}x{w}")
    for name, fn in stages:
        jfn = jax.jit(fn)
        out = jfn(params, left, right)
        jax.tree.map(lambda x: float(jnp.asarray(x).sum()), out)  # sync
        t0 = time.time()
        for _ in range(args.iters):
            out = jfn(params, left, right)
            jax.tree.map(lambda x: float(jnp.asarray(x).sum()), out)
        dt = (time.time() - t0) / args.iters * 1000
        print(f"{name:16s} {dt:8.2f} ms/batch  (+{dt - prev:7.2f} ms)  "
              f"{args.batch / dt * 1000:7.1f} pairs/s")
        prev = dt


if __name__ == "__main__":
    main()
