#!/usr/bin/env python
"""Demo CLI: run the full pipeline on one stereo pair and visualise
2D box pairs, keypoints, projected 3D boxes and a BEV plot.

Behavioral reference: ``demo.py`` (SURVEY.md §3.1).

Usage:
  python tools/demo.py --left l.png --right r.png --calib calib.txt \
      [--ckpt-dir runs/exp0] [--out demo_out.png]
  python tools/demo.py --synthetic [--out demo_out.png]   # no data needed
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--left")
    p.add_argument("--right")
    p.add_argument("--calib")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--out", default="demo_out.png")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", default="auto", choices=["auto", "cpu"],
                   help="cpu: force local CPU devices (the sitecustomize "
                        "ignores JAX_PLATFORMS; only an in-process config "
                        "update works)")
    return p.parse_args()


def main():
    args = parse_args()
    if not args.synthetic and not (args.left and args.right and args.calib):
        sys.exit("error: provide --left/--right/--calib, or --synthetic")
    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    from stereo_rcnn_tpu.utils.cache import enable_compile_cache
    enable_compile_cache("demo", fingerprint=(args.platform == "cpu"))
    from stereo_rcnn_tpu.config import Config, tiny_test_config
    from stereo_rcnn_tpu.geometry import (box3d_corners, default_kitti_calib,
                                          project)
    from stereo_rcnn_tpu.geometry.calib import read_kitti_calib
    from stereo_rcnn_tpu.inference import make_full_pipeline
    from stereo_rcnn_tpu.models import init_params
    from stereo_rcnn_tpu.utils.host_preproc import resize_subtract_pad

    cfg = tiny_test_config() if args.tiny else Config()
    h, w = cfg.data.image_h, cfg.data.image_w
    means = cfg.backbone.pixel_means_bgr

    if args.synthetic:
        from stereo_rcnn_tpu.data.synthetic import synthetic_batch
        il, ir, gt, calib = synthetic_batch(cfg, 1, seed=42)
        images_l, images_r = jnp.asarray(il), jnp.asarray(ir)
        scale = 1.0
    else:
        from stereo_rcnn_tpu.data.pipeline import load_image
        img_l = load_image(args.left)
        img_r = load_image(args.right)
        calib = read_kitti_calib(args.calib)
        sh, sw = img_l.shape[:2]
        scale = min(h / sh, w / sw)
        calib = calib.scale(scale)
        images_l = jnp.asarray(
            resize_subtract_pad(img_l, h, w, scale, means))[None]
        images_r = jnp.asarray(
            resize_subtract_pad(img_r, h, w, scale, means))[None]

    if args.ckpt_dir:
        from stereo_rcnn_tpu.train import init_train_state
        from stereo_rcnn_tpu.train.checkpoint import restore_checkpoint
        state = restore_checkpoint(args.ckpt_dir,
                                   init_train_state(cfg, jax.random.PRNGKey(0)))
        params = {"params": state.params["model"]}
    else:
        print("WARNING: random weights (no --ckpt-dir)")
        params = init_params(cfg, jax.random.PRNGKey(0))

    pipeline = jax.jit(make_full_pipeline(cfg, calib))
    out = jax.block_until_ready(pipeline(params, images_l, images_r))
    det = jax.device_get(out.det)
    valid = np.asarray(det.valid[0])
    print(f"{int(valid.sum())} detections")

    # ---- visualisation (matplotlib, like the reference demo) ----
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    img_show_l = np.clip(np.asarray(images_l[0]) + np.asarray(means),
                         0, 255).astype(np.uint8)[..., ::-1]
    img_show_r = np.clip(np.asarray(images_r[0]) + np.asarray(means),
                         0, 255).astype(np.uint8)[..., ::-1]
    fig, axes = plt.subplots(3, 1, figsize=(14, 12))
    axes[0].imshow(img_show_l)
    axes[0].set_title("left: 2D boxes + keypoints + projected 3D boxes")
    axes[1].imshow(img_show_r)
    axes[1].set_title("right: paired boxes")
    axes[2].set_title("bird's-eye view")

    for i in np.nonzero(valid)[0]:
        bl = np.asarray(det.box_left[0, i])
        br = np.asarray(det.box_right[0, i])
        axes[0].add_patch(Rectangle((bl[0], bl[1]), bl[2] - bl[0],
                                    bl[3] - bl[1], fill=False, color="lime"))
        axes[1].add_patch(Rectangle((br[0], br[1]), br[2] - br[0],
                                    br[3] - br[1], fill=False, color="cyan"))
        axes[0].plot([det.kpt_u[0, i]] * 2, [bl[1], bl[3]], "r-", lw=1)
        # Projected 3D wireframe.
        pos = np.asarray(out.position[0, i])
        ry = float(out.ry[0, i])
        corners = np.asarray(box3d_corners(
            jnp.asarray(pos), jnp.asarray(det.dims[0, i]), jnp.asarray(ry)))
        uv = np.asarray(project(jnp.asarray(corners), calib))
        edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
                 (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]
        for a, b in edges:
            axes[0].plot(uv[[a, b], 0], uv[[a, b], 1], "y-", lw=0.8)
        # BEV footprint.
        bev = corners[:4][:, [0, 2]]
        axes[2].plot(np.append(bev[:, 0], bev[0, 0]),
                     np.append(bev[:, 1], bev[0, 1]), "g-")
    axes[2].set_xlim(-30, 30)
    axes[2].set_ylim(0, 60)
    axes[2].set_aspect("equal")
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
