#!/usr/bin/env python
"""Serve a StableHLO export: run stereo pairs through a `.shlo` artifact
and write KITTI-format result files.

Deployment companion to ``tools/export_model.py``: the inference side
loads ONE artifact (network + NMS + 3D solver + dense alignment already
fused inside) — no model-building code runs here, only preprocessing,
``serving.load_pipeline`` and result IO.  Weights are a runtime input
(``--ckpt-dir``'s params_export), so new checkpoints serve without
re-exporting.

Usage:
  python tools/serve.py --artifact model.shlo --left-dir image_2 \
      --right-dir image_3 --calib-dir calib --out results/ \
      [--ckpt-dir runs/bench_ckpt]
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", required=True)
    p.add_argument("--left-dir", required=True)
    p.add_argument("--right-dir", required=True)
    p.add_argument("--calib-dir", required=True)
    p.add_argument("--out", default="results")
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--config", default=None,
                   help="YAML for the parameter-tree template (defaults "
                        "to <ckpt-dir>/config.yaml when present)")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--image-ext", default=".png")
    p.add_argument("--platform", default="auto", choices=["auto", "cpu"])
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from stereo_rcnn_tpu.utils.cache import enable_compile_cache
    enable_compile_cache("serve", fingerprint=(args.platform == "cpu"))

    from stereo_rcnn_tpu.config import Config, load_config, tiny_test_config
    from stereo_rcnn_tpu.data.pipeline import load_image
    from stereo_rcnn_tpu.evalkit import write_result_file
    from stereo_rcnn_tpu.geometry.calib import read_kitti_calib
    from stereo_rcnn_tpu.models import init_params
    from stereo_rcnn_tpu.serving import load_pipeline
    from stereo_rcnn_tpu.utils.host_preproc import resize_subtract_pad

    with open(args.artifact, "rb") as f:
        pipe = load_pipeline(f.read())
    batch = pipe.manifest["batch"]
    h, w = pipe.manifest["image_hw"]
    print(f"artifact: batch={batch} image_hw=[{h}, {w}] "
          f"platforms={pipe.manifest['platforms']}")

    cfg_yaml = args.config
    if cfg_yaml is None and args.ckpt_dir:
        cand = os.path.join(args.ckpt_dir, "config.yaml")
        cfg_yaml = cand if os.path.exists(cand) else None
    cfg = (load_config(cfg_yaml) if cfg_yaml
           else tiny_test_config() if args.tiny else Config())
    params = init_params(cfg, jax.random.PRNGKey(0))
    if args.ckpt_dir:
        from stereo_rcnn_tpu.train.checkpoint import restore_params
        params = restore_params(
            os.path.join(args.ckpt_dir, "params_export"), params)
        print(f"weights: {args.ckpt_dir}/params_export")
    else:
        print("WARNING: random weights (no --ckpt-dir)")

    ids = sorted(os.path.splitext(os.path.basename(p))[0] for p in
                 glob.glob(os.path.join(args.left_dir,
                                        f"*{args.image_ext}")))
    if not ids:
        sys.exit(f"no *{args.image_ext} under {args.left_dir}")
    print(f"{len(ids)} frames")
    means = cfg.backbone.pixel_means_bgr
    os.makedirs(args.out, exist_ok=True)

    def load_frame(fid):
        img_l = load_image(os.path.join(args.left_dir, fid + args.image_ext))
        img_r = load_image(os.path.join(args.right_dir,
                                        fid + args.image_ext))
        calib = read_kitti_calib(os.path.join(args.calib_dir, fid + ".txt"))
        sh, sw = img_l.shape[:2]
        scale = min(h / sh, w / sw)
        return (resize_subtract_pad(img_l, h, w, scale, means),
                resize_subtract_pad(img_r, h, w, scale, means),
                calib.scale(scale), scale,
                np.asarray([sw * scale, sh * scale], np.float32))

    t0 = time.time()
    done = 0
    for start in range(0, len(ids), batch):
        chunk = ids[start:start + batch]
        frames = [load_frame(fid) for fid in chunk]
        while len(frames) < batch:              # fixed-shape tail padding
            frames.append(frames[-1])
        il = jnp.asarray(np.stack([f[0] for f in frames]))
        ir = jnp.asarray(np.stack([f[1] for f in frames]))
        calib_b = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)),
                               *[f[2] for f in frames])
        cwh = jnp.asarray(np.stack([f[4] for f in frames]))
        out = jax.block_until_ready(pipe(params, il, ir, calib_b, cwh))
        det = jax.device_get(out.det)
        pos, ry = np.asarray(out.position), np.asarray(out.ry)
        for b, fid in enumerate(chunk):         # pads are never written
            scale = frames[b][3]
            sel = np.nonzero(np.asarray(det.valid[b]))[0]
            write_result_file(
                os.path.join(args.out, f"{fid}.txt"),
                ["Car"] * len(sel),
                np.asarray(det.box_left[b])[sel] / scale,
                np.asarray(det.dims[b])[sel], pos[b][sel], ry[b][sel],
                np.asarray(det.alpha[b])[sel],
                np.asarray(det.score[b])[sel])
            done += 1
    dt = time.time() - t0
    print(f"served {done} frames in {dt:.1f}s ({done / dt:.2f} pairs/s) "
          f"-> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
