#!/usr/bin/env python
"""Score a trained checkpoint on HELD-OUT synthetic scenes at the working
resolution, with the vendored devkit-semantics evaluator.

Companion to ``tools/train.py --synthetic``: training consumes scene seeds
``0..steps_per_epoch-1`` (see train.py's pool), so this tool evaluates on
seeds >= 1000 which no training run ever rendered.  Reference equivalence:
``test_net.py``'s AP flow (SURVEY.md §3.3), synthetic edition.

Usage:
  python tools/eval_synth.py --ckpt-dir runs/bench_ckpt \
      [--config configs/synthetic_fullres.yml] [--batches 4] [--batch 8]
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
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--config", default=None,
                    help="YAML overlay; defaults to <ckpt-dir>/config.yaml "
                         "(the training run's effective config)")
    ap.add_argument("--batches", type=int, default=4,
                    help="held-out batches (AP quantisation shrinks with "
                         "more gts)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n-objects", type=int, default=4)
    ap.add_argument("--platform", default="auto", choices=["auto", "cpu"])
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step to restore (default: latest)")
    ap.add_argument("--domain", default="none",
                    help="held-out appearance domain(s), comma-separated "
                         "or 'all' (none/untinted/shaded/tinted/illum/"
                         "noise): same scenes, perturbed appearance — "
                         "bounds renderer circularity in the AP claim")
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="dotted config override, e.g. "
                         "rcnn.roi_align_hat=kron_bf16 (repeatable); "
                         "applied AFTER the checkpoint's config.yaml — for "
                         "A/B-ing inference-only knobs against the same "
                         "weights")
    args = ap.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from stereo_rcnn_tpu.utils.cache import enable_compile_cache
    enable_compile_cache("eval", fingerprint=(args.platform == "cpu"))

    from stereo_rcnn_tpu.config import load_config
    from stereo_rcnn_tpu.data.synthetic import synthetic_batch
    from stereo_rcnn_tpu.evalkit import evaluate, frame_objects_from_outputs
    from stereo_rcnn_tpu.inference import make_full_pipeline
    from stereo_rcnn_tpu.models import init_params
    from stereo_rcnn_tpu.train import init_train_state
    from stereo_rcnn_tpu.train.checkpoint import (latest_step,
                                                  restore_checkpoint)

    from stereo_rcnn_tpu.config import parse_set_overrides
    cfg_path = args.config or os.path.join(args.ckpt_dir, "config.yaml")
    cfg = load_config(cfg_path if os.path.exists(cfg_path) else None,
                      overrides=parse_set_overrides(args.set) or None)
    print(f"config: {cfg_path}, resolution "
          f"{cfg.data.image_h}x{cfg.data.image_w}"
          + (f", overrides {args.set}" if args.set else ""))

    state = init_train_state(cfg, jax.random.PRNGKey(0))
    state = restore_checkpoint(args.ckpt_dir, state, step=args.step)
    print(f"restored step {int(state.step)} "
          f"(latest: {latest_step(args.ckpt_dir)})")
    params = {"params": state.params["model"]}

    from stereo_rcnn_tpu.data.synthetic import EVAL_DOMAINS
    domains = (list(EVAL_DOMAINS) if args.domain == "all"
               else args.domain.split(","))

    # Per evaluated class (KITTI AP is per-class); the single-class
    # default is one unprefixed pass, identical to the historical output.
    fg = [(i + 1, name) for i, name in enumerate(cfg.data.classes[1:])]
    pipeline = None
    for domain in domains:
        per_cls = {c: ([], []) for c, _ in fg}
        t0 = time.time()
        n_det = n_gt = 0
        for i in range(args.batches):
            il, ir, gt, calib = synthetic_batch(cfg, batch=args.batch,
                                                seed=1000 + i,
                                                n_objects=args.n_objects,
                                                domain=domain)
            if pipeline is None:
                pipeline = jax.jit(make_full_pipeline(cfg, calib))
            out = pipeline(params, jnp.asarray(il), jnp.asarray(ir))
            for c, _ in fg:
                g, d = frame_objects_from_outputs(
                    out, gt, args.batch, cls_id=c if len(fg) > 1 else None)
                per_cls[c][0].extend(g)
                per_cls[c][1].extend(d)
                n_det += sum(len(x.score) for x in d)
                n_gt += sum(len(x.score) for x in g)
                if len(fg) == 1:
                    break
        dtag = f"[domain={domain}] " if len(domains) > 1 else ""
        print(f"{dtag}{args.batches * args.batch} held-out frames in "
              f"{time.time() - t0:.0f}s — {n_det} detections / {n_gt} gts")

        for c, cname in fg:
            prefix = dtag + (f"[{cname}] " if len(fg) > 1 else "")
            gts, dets = per_cls[c]
            for metric, thresh in (("2d", 0.7), ("2d", 0.5), ("bev", 0.7),
                                   ("bev", 0.5), ("3d", 0.7), ("3d", 0.5)):
                r = evaluate(gts, dets, metric=metric, iou_thresh=thresh)
                print(f"{prefix}AP_{metric}@{thresh} (R40): " + " / ".join(
                    f"{d}={r[d]:.2f}" for d in ("easy", "moderate", "hard")))


if __name__ == "__main__":
    main()
