#!/usr/bin/env python
"""End-to-end learning smoke: overfit a tiny from-scratch model on a few
synthetic stereo scenes, then run full inference + 3D solve and score with
the vendored KITTI evaluator.  Proves the whole loop train -> detect ->
solve -> AP (SURVEY.md §4 golden-parity strategy, synthetic edition).

Usage: python tools/smoke_e2e.py [--steps 400] [--scenes 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--platform", default="cpu",
                    help="cpu (default; keeps the TPU free) or axon")
    args = ap.parse_args()
    if args.platform == "cpu":
        # Must override via config -- the axon sitecustomize force-sets
        # jax_platforms and ignores the env var.
        jax.config.update("jax_platforms", "cpu")

    from stereo_rcnn_tpu.config import tiny_test_config
    import dataclasses
    from stereo_rcnn_tpu.data.synthetic import synthetic_batch
    from stereo_rcnn_tpu.evalkit import FrameObjects, evaluate
    from stereo_rcnn_tpu.inference import make_full_pipeline
    from stereo_rcnn_tpu.train import Batch, init_train_state, make_train_step

    cfg = tiny_test_config().replace(compute_dtype="float32")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, learning_rate=args.lr))

    il, ir, gt, calib = synthetic_batch(cfg, batch=args.scenes, seed=0,
                                        n_objects=3)
    batch = Batch(images_left=jnp.asarray(il), images_right=jnp.asarray(ir),
                  gt=jax.tree.map(jnp.asarray, gt))

    state = init_train_state(cfg, jax.random.PRNGKey(0), steps_per_epoch=1000)
    step_fn = jax.jit(make_train_step(cfg, steps_per_epoch=1000))
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(args.steps):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, batch, sub)
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i}: total={float(metrics['total']):.2f} "
                  f"rpn_cls={float(metrics['rpn_cls']):.3f} "
                  f"rcnn_cls={float(metrics['rcnn_cls']):.3f} "
                  f"rcnn_box={float(metrics['rcnn_box']):.3f}", flush=True)
    print(f"trained {args.steps} steps in {time.time() - t0:.0f}s")

    # Inference + 3D solve on the training scenes (overfit check).
    params = {"params": state.params["model"]}
    pipeline = jax.jit(make_full_pipeline(cfg, calib))
    out = pipeline(params, batch.images_left, batch.images_right)
    det = jax.device_get(out.det)
    pos = np.asarray(out.position)
    rys = np.asarray(out.ry)

    gts, dets = [], []
    for b in range(args.scenes):
        v = np.asarray(det.valid[b])
        sel = np.nonzero(v)[0]
        dets.append(FrameObjects(
            box2d=np.asarray(det.box_left[b])[sel],
            box3d=np.concatenate(
                [pos[b][sel], np.asarray(det.dims[b])[sel],
                 rys[b][sel][:, None]], -1),
            score=np.asarray(det.score[b])[sel],
            occlusion=np.zeros(len(sel), int), truncation=np.zeros(len(sel))))
        gv = np.asarray(gt.valid[b])
        gsel = np.nonzero(gv)[0]
        # Synthetic gt: recover 3D from projection-consistent fields — we
        # stored dims/alpha; reconstruct location is not kept in GroundTruth,
        # so evaluate 2D AP (left box) + report 3D diagnostics instead.
        gts.append(FrameObjects(
            box2d=np.asarray(gt.left[b])[gsel],
            box3d=np.zeros((len(gsel), 7)),
            score=np.ones(len(gsel)),
            occlusion=np.zeros(len(gsel), int),
            truncation=np.zeros(len(gsel))))

    res2d = evaluate(gts, dets, metric="2d", iou_thresh=0.5)
    n_det = sum(len(d.score) for d in dets)
    n_gt = sum(len(g.score) for g in gts)
    print(f"detections: {n_det} (gt: {n_gt})")
    print("AP_2d@0.5:", {k: round(v, 2) for k, v in res2d.items()})
    ok = max(res2d.values()) >= 60.0
    print("SMOKE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
