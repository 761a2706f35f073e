#!/usr/bin/env python
"""Evaluation CLI: run inference over a KITTI split, write KITTI-format
result files, and compute AP_3d / AP_bev with the vendored evaluator.

Behavioral reference: ``test_net.py`` (SURVEY.md §3.3) — but AP is computed
in-process (the reference defers to the external C++ devkit).  Devkit
semantics: per-frame calibration is threaded through the jit as a batched
runtime argument, Van gts are match-time ignored, DontCare regions absorb
would-be FPs, and both R40 and paper-era R11 AP are reported.

Usage:
  python tools/test_net.py --kitti-root data/kitti/object \
      --ckpt-dir runs/exp0 --out results/
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kitti-root", required=True)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--out", default="results")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--config", default=None,
                   help="YAML config overlay (over the tiny base when "
                        "--tiny is also given); must match the "
                        "checkpoint's training config")
    p.add_argument("--image-ext", default=".png")
    p.add_argument("--platform", default="auto", choices=["auto", "cpu"],
                   help="cpu: force local CPU devices (debug / CI; the "
                        "sitecustomize ignores JAX_PLATFORMS, only an "
                        "in-process config update works)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from stereo_rcnn_tpu.utils.cache import enable_compile_cache
    enable_compile_cache("eval", fingerprint=(args.platform == "cpu"))
    from stereo_rcnn_tpu.config import load_config, tiny_test_config
    from stereo_rcnn_tpu.data import KittiDataset, KittiPipeline
    from stereo_rcnn_tpu.data.kitti import parse_label_file
    from stereo_rcnn_tpu.evalkit import (FrameObjects, evaluate,
                                         frame_objects_from_labels,
                                         write_result_file)
    from stereo_rcnn_tpu.inference import make_full_pipeline
    from stereo_rcnn_tpu.models import init_params
    from stereo_rcnn_tpu.train import init_train_state
    from stereo_rcnn_tpu.train.checkpoint import restore_checkpoint

    cfg = load_config(args.config,
                      base=tiny_test_config() if args.tiny else None)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, kitti_root=args.kitti_root))
    ds = KittiDataset(cfg.data)
    if len(ds) == 0:
        sys.exit(f"no data under {args.kitti_root}")
    print(f"{len(ds)} frames")

    params = None
    if args.ckpt_dir:
        state = init_train_state(cfg, jax.random.PRNGKey(0))
        state = restore_checkpoint(args.ckpt_dir, state)
        params = {"params": state.params["model"]}
        print(f"loaded checkpoint step {int(state.step)}")
    else:
        params = init_params(cfg, jax.random.PRNGKey(0))
        print("WARNING: random weights (no --ckpt-dir)")

    pipe = KittiPipeline(cfg, ds, args.batch, shuffle=False,
                         image_ext=args.image_ext)
    # Calib is a BATCHED RUNTIME argument: each frame's own calibration
    # (scaled to working resolution by the pipeline) flows through the jit.
    pipeline = jax.jit(make_full_pipeline(cfg))

    os.makedirs(args.out, exist_ok=True)
    # Per-frame raw material for the per-class AP loop below: detections
    # keep their class ids; gt label objects are re-filtered per evaluated
    # class (upstream ``test_net.py`` loops imdb classes the same way).
    det_frames, gt_objs = [], []
    frame = 0
    t0 = time.time()
    for pb in pipe:
        out = jax.block_until_ready(
            pipeline(params, jnp.asarray(pb.images_left),
                     jnp.asarray(pb.images_right),
                     jax.tree.map(jnp.asarray, pb.calib),
                     jnp.asarray(pb.content_wh)))
        det = jax.device_get(out.det)
        pos = np.asarray(out.position)
        ry = np.asarray(out.ry)
        for b in range(pb.n_valid):         # pad replicas are not scored
            fid = ds.ids[frame]
            scale = float(pb.scales[b])
            valid = np.asarray(det.valid[b])
            n = int(valid.sum())
            sel = np.nonzero(valid)[0]
            boxes2d = np.asarray(det.box_left[b])[sel] / scale
            dims = np.asarray(det.dims[b])[sel]
            locs = pos[b][sel]
            rys = ry[b][sel]
            alphas = np.asarray(det.alpha[b])[sel]
            scores = np.asarray(det.score[b])[sel]
            cls_ids = np.asarray(det.cls[b])[sel]
            cls_names = [cfg.data.classes[c] for c in cls_ids]
            write_result_file(
                os.path.join(args.out, f"{fid}.txt"), cls_names,
                boxes2d, dims, locs, rys, alphas, scores)
            det_frames.append((FrameObjects(
                box2d=boxes2d,
                box3d=np.concatenate([locs, dims, rys[:, None]], -1),
                score=scores, occlusion=np.zeros(n, int),
                truncation=np.zeros(n)), cls_ids))
            gt_objs.append(parse_label_file(ds.paths(frame)["label"]))
            frame += 1
    dt = time.time() - t0
    print(f"{frame} frames in {dt:.1f}s ({frame / dt:.2f} pairs/s)")

    def _take(fo: FrameObjects, keep: np.ndarray) -> FrameObjects:
        return FrameObjects(fo.box2d[keep], fo.box3d[keep], fo.score[keep],
                            fo.occlusion[keep], fo.truncation[keep])

    # KITTI AP is per evaluated class.  Devkit neighbor-ignore pairs: Van
    # gts are ignored when scoring Car (and vice versa) so boxes of the
    # sibling type absorb matches instead of counting as FPs.
    neighbors = {"Car": ("Van",), "Van": ("Car",),
                 "Pedestrian": ("Person_sitting",)}
    fg = [(i + 1, name) for i, name in enumerate(cfg.data.classes[1:])]
    for cls_id, cname in fg:
        prefix = f"[{cname}] " if len(fg) > 1 else ""
        gts = [frame_objects_from_labels(
            objs, evaluated_class=cname,
            neighbor_classes=neighbors.get(cname, ())) for objs in gt_objs]
        dets = [_take(fo, ids == cls_id) for fo, ids in det_frames]
        for metric, thresh in (("3d", 0.7), ("3d", 0.5), ("bev", 0.7),
                               ("bev", 0.5), ("2d", 0.7)):
            for n_points in (40, 11):
                res = evaluate(gts, dets, metric=metric, iou_thresh=thresh,
                               n_points=n_points)
                print(f"{prefix}AP_{metric}@{thresh} (R{n_points}): "
                      + " / ".join(f"{d}={res[d]:.2f}"
                                   for d in ("easy", "moderate", "hard")))


if __name__ == "__main__":
    main()
