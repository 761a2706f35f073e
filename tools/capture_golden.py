#!/usr/bin/env python
"""Golden-capture tool: convert the RELEASED reference checkpoint and dump
our model's outputs on a fixed stereo pair as ``.npz`` goldens.

Run this the moment ``/root/reference`` + the released ``.pth``
(``models_stereo/stereo_rcnn_epoch_12_loss_*.pth``, SURVEY.md §2.2 Demo
row) become available:

  python tools/capture_golden.py --pth stereo_rcnn_epoch_12.pth \
      --left demo_left.png --right demo_right.png --calib calib.txt \
      --out goldens/demo.npz

It prints the conversion report (matched torch prefixes + unclaimed keys)
— any unclaimed key means the NAME_MAP in ``convert/stereo_import.py``
needs a spelling fix for the real checkpoint.  The golden then pins
detections/keypoints/3D solves for regression tests, closing the
BASELINE.md north-star loop (reference-checkpoint AP parity).
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_state_dict(path: str):
    import torch
    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.numpy() for k, v in sd.items()}, \
        {k: v for k, v in (ckpt.items() if isinstance(ckpt, dict) else [])
         if k != "model"}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pth", required=True)
    ap.add_argument("--left", required=True)
    ap.add_argument("--right", required=True)
    ap.add_argument("--calib", required=True)
    ap.add_argument("--out", default="goldens/demo.npz")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from stereo_rcnn_tpu.config import Config
    from stereo_rcnn_tpu.convert.stereo_import import (import_detector,
                                                       merge_params)
    from stereo_rcnn_tpu.data.pipeline import load_image
    from stereo_rcnn_tpu.geometry.calib import read_kitti_calib
    from stereo_rcnn_tpu.inference import make_full_pipeline
    from stereo_rcnn_tpu.models import init_params
    from stereo_rcnn_tpu.utils.host_preproc import resize_subtract_pad

    cfg = Config()
    sd, extras = load_state_dict(args.pth)
    converted, report = import_detector(sd, depth=cfg.backbone.depth,
                                        pool=cfg.rcnn.pooling_size,
                                        fpn_dim=cfg.backbone.fpn_dim)
    print(f"matched: {report['matched']}")
    if report["unclaimed"]:
        print("UNCLAIMED KEYS (fix NAME_MAP in convert/stereo_import.py):")
        for k in report["unclaimed"]:
            print(f"  {k}")
    if extras:
        print(f"checkpoint extras: {sorted(extras)}")

    params = init_params(cfg, jax.random.PRNGKey(0))
    params = {"params": merge_params(params, converted)["params"]}

    img_l = load_image(args.left)
    img_r = load_image(args.right)
    sh, sw = img_l.shape[:2]
    th, tw = cfg.data.image_h, cfg.data.image_w
    scale = min(th / sh, tw / sw)
    means = cfg.backbone.pixel_means_bgr
    il = resize_subtract_pad(img_l, th, tw, scale, means)[None]
    ir = resize_subtract_pad(img_r, th, tw, scale, means)[None]
    calib = read_kitti_calib(args.calib).scale(scale)

    fn = jax.jit(make_full_pipeline(cfg, calib))
    out = jax.block_until_ready(fn(
        jax.tree.map(jnp.asarray, params), jnp.asarray(il),
        jnp.asarray(ir)))
    det = jax.device_get(out.det)

    # Keypoint-softmax semantics probe (SURVEY.md §3.4 fact 5 is uncertain;
    # config `rcnn.kpt_softmax` is the parity switch): decode the SAME
    # converted weights under both semantics and dump both, so comparing
    # against the reference demo's printed keypoints on this pair tells
    # which flag value is parity — a config flip, not retraining.
    kpt_ab = {}
    for mode in ("joint", "per_channel"):
        mcfg = cfg.replace(
            rcnn=dataclasses.replace(cfg.rcnn, kpt_softmax=mode))
        mout = jax.device_get(jax.jit(make_full_pipeline(mcfg, calib))(
            jax.tree.map(jnp.asarray, params), jnp.asarray(il),
            jnp.asarray(ir)).det)
        kpt_ab[mode] = (np.asarray(mout.kpt_u), np.asarray(mout.kpt_type),
                        np.asarray(mout.kpt_prob))
    jd = np.abs(kpt_ab["joint"][0] - kpt_ab["per_channel"][0])
    td = (kpt_ab["joint"][1] != kpt_ab["per_channel"][1])
    print(f"kpt semantics A/B: max |kpt_u joint - per_channel| = "
          f"{float(jd.max()):.3f} px, corner-type disagreements = "
          f"{int(td.sum())}/{td.size} — match the reference's kpts to pick "
          f"rcnn.kpt_softmax")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(
        args.out,
        scale=scale,
        box_left=np.asarray(det.box_left[0]),
        box_right=np.asarray(det.box_right[0]),
        score=np.asarray(det.score[0]),
        dims=np.asarray(det.dims[0]),
        alpha=np.asarray(det.alpha[0]),
        kpt_u=np.asarray(det.kpt_u[0]),
        border_u=np.asarray(det.border_u[0]),
        kpt_u_joint=np.asarray(kpt_ab["joint"][0][0]),
        kpt_prob_joint=np.asarray(kpt_ab["joint"][2][0]),
        kpt_u_per_channel=np.asarray(kpt_ab["per_channel"][0][0]),
        kpt_prob_per_channel=np.asarray(kpt_ab["per_channel"][2][0]),
        valid=np.asarray(det.valid[0]),
        position=np.asarray(out.position[0]),
        ry=np.asarray(out.ry[0]),
        z_refined=np.asarray(out.z_refined[0]),
    )
    n = int(np.asarray(det.valid[0]).sum())
    print(f"golden written to {args.out} ({n} detections)")


if __name__ == "__main__":
    main()
