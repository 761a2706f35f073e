#!/usr/bin/env python
"""End-to-end learning smoke: train a tiny from-scratch model on synthetic
stereo scenes, then run full inference + 3D solve and score 2D / BEV / 3D
AP with the vendored KITTI evaluator — on the TRAINING scenes (overfit
check) and on HELD-OUT scenes (generalisation check).  Proves the whole
loop train -> detect -> solve -> align -> AP (SURVEY.md §4 golden-parity
strategy, synthetic edition; reference equivalence: test_net.py's full 3D
result flow).

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


def _score(det_out, gt, n_scenes):
    """Build (gts, dets) FrameObjects lists from padded pipeline output and
    packed GroundTruth (shared helper in evalkit)."""
    from stereo_rcnn_tpu.evalkit import frame_objects_from_outputs

    return frame_objects_from_outputs(det_out, gt, n_scenes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--scenes", type=int, default=8,
                    help="scenes per training batch")
    ap.add_argument("--pool", type=int, default=40,
                    help="pre-rendered training batches cycled during "
                         "training (data diversity for generalisation)")
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--size", default=None,
                    help="working resolution HxW (multiples of 64), e.g. "
                         "256x512 — larger images mean larger disparities "
                         "and proportionally better depth resolution")
    ap.add_argument("--platform", default="cpu",
                    help="cpu (default; keeps the TPU free) or axon")
    args = ap.parse_args()
    if args.platform == "cpu":
        # Must override via config -- the axon sitecustomize force-sets
        # jax_platforms and ignores the env var.
        jax.config.update("jax_platforms", "cpu")
    from stereo_rcnn_tpu.utils.cache import enable_compile_cache
    # CPU caches hold XLA:CPU AOT executables, which are µarch-specific —
    # fingerprint them or a VM migration silently recompiles everything.
    enable_compile_cache(f"smoke_{args.platform}",
                         fingerprint=(args.platform == "cpu"))

    from stereo_rcnn_tpu.config import tiny_test_config
    import dataclasses
    from stereo_rcnn_tpu.data.synthetic import synthetic_batch
    from stereo_rcnn_tpu.evalkit import evaluate
    from stereo_rcnn_tpu.inference import make_full_pipeline
    from stereo_rcnn_tpu.train import Batch, init_train_state, make_train_step

    cfg = tiny_test_config().replace(compute_dtype="float32")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, learning_rate=args.lr))
    if args.size:
        h_, w_ = (int(t) for t in args.size.split("x"))
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, image_h=h_, image_w=w_))

    # Pre-render a pool of distinct scene batches (host-side) and cycle:
    # the smoke must show GENERALISATION, and a single repeated batch only
    # ever demonstrates memorisation.  Seeds 2.. (0/1 are eval).
    print(f"rendering {args.pool} x {args.scenes} training scenes...",
          flush=True)
    pool = []
    calib = None
    for p in range(args.pool):
        il, ir, gt, calib = synthetic_batch(cfg, batch=args.scenes,
                                            seed=2 + p, n_objects=3)
        pool.append(Batch(images_left=jnp.asarray(il),
                          images_right=jnp.asarray(ir),
                          gt=jax.tree.map(jnp.asarray, gt)))

    # Compress the reference 12-epoch LR schedule into the smoke's step
    # budget (decay lands at 10/12 of training, as upstream).
    spe = max(args.steps // 12, 1)
    state = init_train_state(cfg, jax.random.PRNGKey(0), steps_per_epoch=spe)
    step_fn = jax.jit(make_train_step(cfg, steps_per_epoch=spe))
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(args.steps):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, pool[i % args.pool], sub)
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i}: total={float(metrics['total']):.2f} "
                  f"rpn_cls={float(metrics['rpn_cls']):.3f} "
                  f"rcnn_cls={float(metrics['rcnn_cls']):.3f} "
                  f"rcnn_box={float(metrics['rcnn_box']):.3f}", flush=True)
    print(f"trained {args.steps} steps in {time.time() - t0:.0f}s")

    # Inference + 3D solve on training AND held-out scenes.  Held-out AP
    # aggregates several fresh batches — a single 8-scene batch quantises
    # AP into ~25-point jumps and the verdict becomes a coin flip.
    params = {"params": state.params["model"]}
    pipeline = jax.jit(make_full_pipeline(cfg, calib))
    results = {}
    # seed 2 is the first training pool batch; seeds < 2 and >= 2+pool
    # were never trained on.
    for name, seeds in (("train", [2]),
                        ("heldout", [1000 + i for i in range(4)])):
        gts, dets = [], []
        for seed in seeds:
            il_e, ir_e, gt_e, _ = synthetic_batch(cfg, batch=args.scenes,
                                                  seed=seed, n_objects=3)
            out = pipeline(params, jnp.asarray(il_e), jnp.asarray(ir_e))
            g, d = _score(out, gt_e, args.scenes)
            gts += g
            dets += d
        n_det = sum(len(d.score) for d in dets)
        n_gt = sum(len(g.score) for g in gts)
        r2d = evaluate(gts, dets, metric="2d", iou_thresh=0.5)
        rbev = evaluate(gts, dets, metric="bev", iou_thresh=0.5)
        r3d = evaluate(gts, dets, metric="3d", iou_thresh=0.5)
        results[name] = (r2d, rbev, r3d)
        print(f"[{name}] detections: {n_det} (gt: {n_gt})")
        for metric, r in (("2d", r2d), ("bev", rbev), ("3d", r3d)):
            print(f"[{name}] AP_{metric}@0.5:",
                  {k: round(v, 2) for k, v in r.items()})

    # PASS: the model learned (overfit 2D) AND the geometric pipeline
    # produces 3D boxes that score on scenes it never trained on.
    ok = (max(results["train"][0].values()) >= 60.0 and
          max(results["heldout"][2].values()) >= 20.0)
    print("SMOKE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
