#!/usr/bin/env python
"""Fold a GroupNorm-trained checkpoint into the frozen-BN inference program.

Reads ``<ckpt-dir>/params_export`` (+ its ``config.yaml``), captures each
GroupNorm site's expected statistics over freshly rendered calibration
scenes (seeds disjoint from both the training pool and the held-out eval
seeds), folds them into per-channel affines
(``convert/norm_calibrate.py``), then VALIDATES the calibrated program
against the exact GroupNorm program on held-out scenes before writing

    <ckpt-dir>/calibrated/params_export   (frozen-BN-shaped tree)
    <ckpt-dir>/calibrated/config.yaml     (same config, norm: frozen)

bench.py and other inference consumers prefer the calibrated export when
present: same detections (validated here), strictly cheaper program (the
affine folds into convolutions; GroupNorm's per-sample statistics cannot).

Validation gate: on held-out scenes the calibrated program must (a) keep
the detection count within --max-count-drift, and (b) for greedily matched
detection pairs, keep median |dz|/z below --max-z-drift and median box IoU
above --min-iou.  On failure nothing is written (exit 1).

Usage: python tools/calibrate_norm.py --ckpt-dir runs/bench_ckpt
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _match_stats(out_a, out_b, batch):
    """Greedy IoU matching of detections between two program outputs."""
    from tools.diag_3d import _iou_matrix
    ious, dzs = [], []
    n_a = n_b = 0
    for b in range(batch):
        sa = np.nonzero(np.asarray(out_a.det.valid[b]))[0]
        sb = np.nonzero(np.asarray(out_b.det.valid[b]))[0]
        n_a += len(sa)
        n_b += len(sb)
        if not len(sa) or not len(sb):
            continue
        iou = _iou_matrix(np.asarray(out_a.det.box_left[b])[sa],
                          np.asarray(out_b.det.box_left[b])[sb])
        for i in range(len(sa)):
            j = int(np.argmax(iou[i]))
            if iou[i, j] <= 0:
                continue
            ious.append(iou[i, j])
            za = float(np.asarray(out_a.position[b][sa[i]])[2])
            zb = float(np.asarray(out_b.position[b][sb[j]])[2])
            dzs.append(abs(za - zb) / max(abs(za), 1e-6))
            iou[:, j] = -1
    return n_a, n_b, np.asarray(ious), np.asarray(dzs)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt-dir", default="runs/bench_ckpt")
    ap.add_argument("--calib-batches", type=int, default=4)
    ap.add_argument("--eval-batches", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--min-iou", type=float, default=0.9)
    ap.add_argument("--max-z-drift", type=float, default=0.02)
    ap.add_argument("--max-count-drift", type=float, default=0.1)
    ap.add_argument("--platform", default="auto", choices=["auto", "cpu"])
    args = ap.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from stereo_rcnn_tpu.utils.cache import enable_compile_cache
    enable_compile_cache("eval", fingerprint=(args.platform == "cpu"))

    import yaml

    from stereo_rcnn_tpu.config import load_config
    from stereo_rcnn_tpu.convert.norm_calibrate import calibrate
    from stereo_rcnn_tpu.data.synthetic import synthetic_batch
    from stereo_rcnn_tpu.inference import make_full_pipeline
    from stereo_rcnn_tpu.models import build_model, init_params
    from stereo_rcnn_tpu.train.checkpoint import export_params, restore_params

    cfg = load_config(os.path.join(args.ckpt_dir, "config.yaml"),
                      overrides={"backbone": {"remat": False}})
    if cfg.backbone.norm != "group":
        print(f"checkpoint norm is '{cfg.backbone.norm}', nothing to "
              "calibrate")
        return 0

    params = init_params(cfg, jax.random.PRNGKey(0))
    params = restore_params(os.path.join(args.ckpt_dir, "params_export"),
                            params)

    # Calibration scenes: seeds 5000+ — disjoint from the training pool
    # (0..steps_per_epoch-1) and the held-out eval seeds (1000+).
    calib_sets = [synthetic_batch(cfg, batch=args.batch, seed=5000 + i)
                  for i in range(args.calib_batches)]
    print(f"calibrating over {2 * args.calib_batches * args.batch} views...",
          flush=True)
    cfg_aff, params_aff = calibrate(
        cfg, params, [(il, ir) for il, ir, _, _ in calib_sets])

    # Validate end to end on held-out scenes against the exact GN program.
    _, _, _, calib0 = calib_sets[0]
    pipe_gn = jax.jit(make_full_pipeline(cfg, calib0))
    pipe_aff = jax.jit(make_full_pipeline(cfg_aff, calib0))
    ious, dzs = [], []
    n_gn = n_aff = 0
    for i in range(args.eval_batches):
        il, ir, _, _ = synthetic_batch(cfg, batch=args.batch, seed=1000 + i)
        il, ir = jnp.asarray(il), jnp.asarray(ir)
        a, b2, iou_m, dz_m = _match_stats(
            jax.device_get(pipe_gn(params, il, ir)),
            jax.device_get(pipe_aff(params_aff, il, ir)), args.batch)
        n_gn += a
        n_aff += b2
        ious.append(iou_m)
        dzs.append(dz_m)
    ious = np.concatenate(ious) if ious else np.zeros((0,))
    dzs = np.concatenate(dzs) if dzs else np.zeros((0,))
    med_iou = float(np.median(ious)) if ious.size else 0.0
    med_dz = float(np.median(dzs)) if dzs.size else 1.0
    drift = abs(n_aff - n_gn) / max(n_gn, 1)
    print(f"held-out: {n_gn} GN dets vs {n_aff} calibrated "
          f"(count drift {100 * drift:.1f}%), matched {ious.size}, "
          f"median IoU {med_iou:.4f}, median |dz|/z {100 * med_dz:.3f}%")

    ok = (ious.size > 0 and med_iou >= args.min_iou
          and med_dz <= args.max_z_drift
          and drift <= args.max_count_drift)
    if not ok:
        print("validation FAILED — not writing calibrated export")
        return 1

    out_dir = os.path.join(args.ckpt_dir, "calibrated")
    os.makedirs(out_dir, exist_ok=True)
    # Drop any stale VALID marker FIRST so a crash mid-export can never
    # leave a marker pointing at a half-written tree; consumers
    # (bench.py::resolve_bench_params) key their preference on the marker,
    # not on directory existence.
    marker = os.path.join(out_dir, "VALID")
    if os.path.exists(marker):
        os.remove(marker)
    export_params(os.path.join(out_dir, "params_export"), params_aff)
    with open(os.path.join(out_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg_aff), f)
    with open(marker, "w") as f:
        f.write(f"median IoU {med_iou:.4f}, median |dz|/z "
                f"{100 * med_dz:.3f}%, count drift {100 * drift:.1f}%\n")
    print(f"wrote {out_dir} (norm: {cfg_aff.backbone.norm})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
