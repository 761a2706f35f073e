#!/usr/bin/env python
"""Per-component 3D error diagnosis on held-out synthetic scenes.

AP_3d summarises everything at once; this tool answers *which* stage
limits it.  Detections are matched to ground truth by 2D IoU (>= 0.5)
and the matched pairs are decomposed into the error each 3D pipeline
input contributes:

  * dz / z        — depth error of the final position (and of the
                    pre-alignment solver depth, to isolate what the
                    dense photometric alignment adds)
  * dx, dy        — lateral / vertical position error
  * dims (h,w,l)  — regression head error, metres
  * d_alpha, d_ry — viewpoint / yaw error, radians
  * kpt_u         — perspective-keypoint column error, px, plus the
                    fraction with the correct corner type
  * disparity     — implied (left-right) box-center disparity error, px

No reference counterpart (the reference publishes only final APs); this
is a TPU-side tool for attributing held-out 3D error during training.

Usage: python tools/diag_3d.py --ckpt-dir runs/bench_ckpt [--batches 4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[N,4] x [M,4] corner-box IoU."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None] - inter, 1e-9)


def _stats(name, v, unit=""):
    v = np.asarray(v, np.float64)
    if v.size == 0:
        print(f"{name:24s} (no matches)")
        return
    q = np.percentile(np.abs(v), [50, 90])
    print(f"{name:24s} median={np.median(v):+8.3f}{unit}  "
          f"|p50|={q[0]:7.3f}  |p90|={q[1]:7.3f}  n={v.size}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n-objects", type=int, default=4)
    ap.add_argument("--seed-base", type=int, default=1000,
                    help="first scene seed; 1000+ = held-out, 0 = the "
                         "training pool's seeds (train.py renders seeds "
                         "0..steps_per_epoch-1)")
    ap.add_argument("--iou", type=float, default=0.5)
    ap.add_argument("--platform", default="auto", choices=["auto", "cpu"])
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step to restore (default: latest)")
    args = ap.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from stereo_rcnn_tpu.utils.cache import enable_compile_cache
    enable_compile_cache("eval", fingerprint=(args.platform == "cpu"))

    from stereo_rcnn_tpu.config import load_config
    from stereo_rcnn_tpu.data.synthetic import synthetic_batch
    from stereo_rcnn_tpu.inference import make_full_pipeline
    from stereo_rcnn_tpu.train import init_train_state
    from stereo_rcnn_tpu.train.checkpoint import restore_checkpoint

    cfg_path = args.config or os.path.join(args.ckpt_dir, "config.yaml")
    cfg = load_config(cfg_path if os.path.exists(cfg_path) else None)
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    state = restore_checkpoint(args.ckpt_dir, state, step=args.step)
    print(f"step {int(state.step)}, matching at 2D IoU >= {args.iou}")
    params = {"params": state.params["model"]}

    acc = {k: [] for k in ("dz", "dz_pct", "dz_solver_pct", "dx", "dy",
                           "dh", "dw", "dl", "dalpha", "dry", "dkpt_u",
                           "kpt_type_ok", "ddisp")}
    n_det = n_gt = n_match = 0
    pipeline = None
    for i in range(args.batches):
        il, ir, gt, calib = synthetic_batch(cfg, batch=args.batch,
                                            seed=args.seed_base + i,
                                            n_objects=args.n_objects)
        if pipeline is None:
            pipeline = jax.jit(make_full_pipeline(cfg, calib))
        out = jax.device_get(pipeline(params, jnp.asarray(il),
                                      jnp.asarray(ir)))
        det = out.det
        for b in range(args.batch):
            dsel = np.nonzero(np.asarray(det.valid[b]))[0]
            gsel = np.nonzero(np.asarray(gt.valid[b]))[0]
            n_det += len(dsel)
            n_gt += len(gsel)
            if not len(dsel) or not len(gsel):
                continue
            iou = _iou_matrix(np.asarray(det.box_left[b])[dsel],
                              np.asarray(gt.left[b])[gsel])
            # Greedy best-match per gt, score order.
            order = np.argsort(-np.asarray(det.score[b])[dsel])
            taken = set()
            for d in order:
                g = int(np.argmax(iou[d]))
                if iou[d, g] < args.iou or g in taken:
                    continue
                taken.add(g)
                n_match += 1
                di, gi = dsel[d], gsel[g]
                pos = np.asarray(out.position[b][di])
                gloc = np.asarray(gt.location[b][gi])
                acc["dz"].append(pos[2] - gloc[2])
                acc["dz_pct"].append(100 * (pos[2] - gloc[2]) / gloc[2])
                # Pre-alignment depth: solver position z before z_refined
                # replaced it (position[2] IS the refined z downstream of
                # solve_and_align's re-solve; z_refined is the raw aligned
                # depth — compare both to the gt).
                acc["dz_solver_pct"].append(
                    100 * (np.asarray(out.z_refined[b][di]) - gloc[2])
                    / gloc[2])
                acc["dx"].append(pos[0] - gloc[0])
                acc["dy"].append(pos[1] - gloc[1])
                ddims = np.asarray(det.dims[b][di]) - np.asarray(
                    gt.dims[b][gi])
                acc["dh"].append(ddims[0])
                acc["dw"].append(ddims[1])
                acc["dl"].append(ddims[2])
                da = (np.asarray(det.alpha[b][di])
                      - np.asarray(gt.alpha[b][gi]))
                acc["dalpha"].append(np.arctan2(np.sin(da), np.cos(da)))
                dr = np.asarray(out.ry[b][di]) - np.asarray(gt.ry[b][gi])
                acc["dry"].append(np.arctan2(np.sin(dr), np.cos(dr)))
                if bool(gt.kpt_visible[b][gi]):
                    acc["dkpt_u"].append(
                        np.asarray(det.kpt_u[b][di])
                        - np.asarray(gt.kpt_u[b][gi]))
                    acc["kpt_type_ok"].append(
                        float(int(det.kpt_type[b][di])
                              == int(gt.kpt_type[b][gi])))
                # Implied disparity of the box pair vs gt box pair.
                dcx = (np.asarray(det.box_left[b][di])[[0, 2]].mean()
                       - np.asarray(det.box_right[b][di])[[0, 2]].mean())
                gcx = (np.asarray(gt.left[b][gi])[[0, 2]].mean()
                       - np.asarray(gt.right[b][gi])[[0, 2]].mean())
                acc["ddisp"].append(dcx - gcx)

    print(f"{n_det} detections / {n_gt} gts / {n_match} matched")
    _stats("depth dz", acc["dz"], " m")
    _stats("depth dz", acc["dz_pct"], " %")
    _stats("aligned-z dz (raw)", acc["dz_solver_pct"], " %")
    _stats("lateral dx", acc["dx"], " m")
    _stats("vertical dy", acc["dy"], " m")
    _stats("dims dh", acc["dh"], " m")
    _stats("dims dw", acc["dw"], " m")
    _stats("dims dl", acc["dl"], " m")
    _stats("viewpoint dalpha", acc["dalpha"], " rad")
    _stats("yaw dry", acc["dry"], " rad")
    _stats("keypoint du", acc["dkpt_u"], " px")
    if acc["kpt_type_ok"]:
        print(f"{'kpt corner-type acc':24s} "
              f"{np.mean(acc['kpt_type_ok']) * 100:.1f}%  "
              f"n={len(acc['kpt_type_ok'])}")
    _stats("box disparity err", acc["ddisp"], " px")


if __name__ == "__main__":
    main()
