#!/usr/bin/env python
"""Training CLI.

Behavioral reference: ``trainval_net.py`` (SURVEY.md §3.2) — KITTI roidb,
SGD + momentum with stepped LR decay, learned uncertainty weighting,
per-epoch checkpoints, resume.  TPU-native: data-parallel over all local
chips via a Mesh; the whole step (target assignment included) is one jit.

Usage:
  python tools/train.py --kitti-root data/kitti/object --epochs 12 \
      --batch-per-device 1 --ckpt-dir runs/exp0 [--resume] [--synthetic N]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

# Exit code for "preempted after a successful checkpoint" (EX_TEMPFAIL).
# Distinct from 0 so the supervisor (tools/supervise_train.py) relaunches
# with --resume instead of declaring the run complete; distinct from a
# crash so it skips the exponential backoff.
PREEMPTED_RC = 75


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kitti-root", default=None)
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic scenes instead of KITTI")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-per-device", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--ckpt-dir", default="runs/default")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--config", default=None, help="YAML config overlay")
    p.add_argument("--tiny", action="store_true",
                   help="tiny config (CI/smoke)")
    p.add_argument("--disp-interval", type=int, default=20)
    p.add_argument("--ckpt-every", type=int, default=1,
                   help="save a checkpoint every N epochs (the final epoch "
                        "always saves); on a tunneled backend each save is "
                        "a multi-minute full-state readback")
    p.add_argument("--image-ext", default=".png",
                   help="image file extension in the KITTI tree (.npy for "
                        "fabricated test trees)")
    p.add_argument("--platform", default="auto", choices=["auto", "cpu"],
                   help="cpu: force local CPU devices (debug / CI; the "
                        "sitecustomize ignores JAX_PLATFORMS, only an "
                        "in-process config update works)")
    p.add_argument("--tfboard", action="store_true",
                   help="also write TensorBoard event files to "
                        "<ckpt-dir>/tb (reference --use_tfboard)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from stereo_rcnn_tpu.utils.cache import enable_compile_cache
    enable_compile_cache("train", fingerprint=(args.platform == "cpu"))
    from stereo_rcnn_tpu.config import load_config, tiny_test_config
    from stereo_rcnn_tpu.data import KittiDataset, KittiPipeline
    from stereo_rcnn_tpu.data.synthetic import synthetic_batch
    from stereo_rcnn_tpu.parallel import (jit_train_step, make_mesh,
                                          replicate, shard_batch)
    from stereo_rcnn_tpu.train import Batch, init_train_state, make_train_step
    from stereo_rcnn_tpu.train.checkpoint import (export_params, latest_step,
                                                  restore_checkpoint,
                                                  save_checkpoint)
    from stereo_rcnn_tpu.utils.metrics import MetricsLogger, StepTimer

    # --tiny and --config compose: the YAML overlays the tiny base (so
    # tests can run small deltas, e.g. a 3-class tiny config).
    cfg = load_config(args.config,
                      base=tiny_test_config() if args.tiny else None)
    overrides = {}
    if args.epochs is not None:
        overrides["epochs"] = args.epochs
    if args.batch_per_device is not None:
        overrides["batch_per_device"] = args.batch_per_device
    if args.lr is not None:
        overrides["learning_rate"] = args.lr
    if overrides:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, **overrides))
    if args.kitti_root:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data,
                                          kitti_root=args.kitti_root))

    # Graceful preemption: TPU reservations get preempted and supervised
    # runs get stopped on purpose (tools/supervise_train.py); a run that
    # only checkpoints every --ckpt-every epochs would lose up to that
    # much work.  On SIGTERM, finish the in-flight step, save a full
    # checkpoint + params export at the CURRENT step, and exit
    # PREEMPTED_RC (75) — "incomplete but resumable", so the supervisor
    # relaunches with --resume rather than reporting a false completion.
    # The reference has no counterpart (trainval_net.py dies where it
    # stands).
    import signal
    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True
        print("SIGTERM: will checkpoint at the current step and exit",
              flush=True)

    signal.signal(signal.SIGTERM, _on_sigterm)

    mesh = make_mesh()
    n_dev = mesh.devices.size
    global_batch = cfg.train.batch_per_device * n_dev
    print(f"devices: {n_dev}, global batch: {global_batch}")

    if args.synthetic:
        steps_per_epoch = max(args.synthetic // global_batch, 1)
        # Pre-render once and reuse across epochs: host rendering would
        # otherwise serialize with (and starve) the device step queue.
        # Rendered batches are cached on disk (~35 s/batch to render at
        # 1280x384 on a 1-core host vs ~1 s to reload) so an interrupted
        # run restarts without re-paying the render.
        import numpy as np
        from stereo_rcnn_tpu.train.targets import GroundTruth
        cache_dir = os.path.join("runs", "synth_pool")
        os.makedirs(cache_dir, exist_ok=True)
        print(f"rendering {steps_per_epoch} x {global_batch} synthetic "
              f"scenes...", flush=True)

        def render(s):
            # The key must capture every content-affecting input — image
            # size, batch, gt padding, renderer defaults AND a renderer
            # version (bump when data/synthetic.py's output changes) — or
            # a config/code change silently trains on stale scenes.
            # Class set is content-affecting too (multi-class scenes);
            # the Car-only default keeps the historical key so existing
            # cached pools stay valid.
            cls_tag = ("" if tuple(cfg.data.classes[1:]) == ("Car",)
                       else "_" + "-".join(cfg.data.classes[1:]))
            # Appearance is content-affecting; the tints default keeps
            # the historical key so existing cached pools stay valid.
            app_tag = ("" if cfg.data.synthetic_appearance == "tints"
                       else f"_{cfg.data.synthetic_appearance}")
            key = (f"v3{cls_tag}{app_tag}"
                   f"_{cfg.data.image_h}x{cfg.data.image_w}"
                   f"_b{global_batch}_g{cfg.train.max_gt_boxes}"
                   f"_s{s}.npz")
            path = os.path.join(cache_dir, key)
            if os.path.exists(path):
                z = np.load(path)
                gt = GroundTruth(**{k: z[k] for k in GroundTruth._fields})
                return z["il"], z["ir"], gt
            il, ir, gt, _ = synthetic_batch(cfg, global_batch, seed=s)
            np.savez(path, il=il, ir=ir, **gt._asdict())
            return il, ir, gt

        pool = [render(s) for s in range(steps_per_epoch)]

        def batches():
            yield from pool
    else:
        ds = KittiDataset(cfg.data)
        if len(ds) == 0:
            sys.exit(f"no KITTI data under {cfg.data.kitti_root}; "
                     f"use --synthetic N for smoke training")
        pipe = KittiPipeline(cfg, ds, global_batch,
                             image_ext=args.image_ext)
        steps_per_epoch = pipe.steps_per_epoch()

        def batches():
            for pb in pipe:
                yield pb.images_left, pb.images_right, pb.gt

    # Persist the EFFECTIVE config next to the checkpoints so consumers
    # (bench, test_net, demo) can rebuild the exact same parameter tree
    # (e.g. GroupNorm vs frozen-BN changes the tree structure).
    os.makedirs(args.ckpt_dir, exist_ok=True)
    import yaml
    with open(os.path.join(args.ckpt_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f)

    state = init_train_state(cfg, jax.random.PRNGKey(cfg.train.seed),
                             steps_per_epoch)
    if args.resume and latest_step(args.ckpt_dir) is not None:
        state = restore_checkpoint(args.ckpt_dir, state)
        print(f"resumed from step {int(state.step)}")

    step_fn = jit_train_step(make_train_step(cfg, steps_per_epoch), mesh)
    logger = MetricsLogger(os.path.join(args.ckpt_dir, "metrics.csv"),
                           print_every=args.disp_interval,
                           tb_dir=(os.path.join(args.ckpt_dir, "tb")
                                   if args.tfboard else None))
    timer = StepTimer()
    rng = jax.random.PRNGKey(cfg.train.seed + 1)

    with mesh:
        state = replicate(mesh, state)

        def to_device(il, ir, gt):
            return shard_batch(mesh, Batch(
                images_left=jnp.asarray(il), images_right=jnp.asarray(ir),
                gt=jax.tree.map(jnp.asarray, gt)))

        # Synthetic pools are staged on DEVICE up to a byte cap:
        # re-uploading each ~190 MB batch every step through a tunneled
        # backend costs far more than the step itself (observed 12 s/step
        # vs ~0.5 s), but staging an UNBOUNDED pool OOMs HBM on long runs
        # (a 2000-scene pool at batch 16 is >20 GB of inputs on a 16 GB
        # chip).  Batches past the cap stream per step — device_put is
        # async, so the upload overlaps the previous step's compute.
        staged, n_stage = [], 0
        if args.synthetic:
            import numpy as np
            il0, ir0, gt0 = pool[0]
            batch_nbytes = (il0.nbytes + ir0.nbytes +
                            sum(np.asarray(x).nbytes
                                for x in jax.tree.leaves(gt0)))
            cap = float(os.environ.get("STAGE_GB", "6")) * 1e9
            n_stage = min(len(pool), max(1, int(cap // max(batch_nbytes, 1))))
            staged = [to_device(*pool[i]) for i in range(n_stage)]
            if n_stage < len(pool):
                print(f"staged {n_stage}/{len(pool)} batches "
                      f"({batch_nbytes * n_stage / 1e9:.1f} GB) on device; "
                      f"remainder streams per step", flush=True)

        def device_batches():
            if args.synthetic:
                yield from staged
                for i in range(n_stage, len(pool)):
                    yield to_device(*pool[i])
                return
            for il, ir, gt in batches():
                yield to_device(il, ir, gt)

        def save(tag):
            host_state = jax.device_get(state)
            save_checkpoint(args.ckpt_dir, host_state)
            # Params-only export for inference consumers (bench.py,
            # demo): with "frozen"/"affine" norms this tree is
            # IDENTICAL to the default inference tree, so restoring it
            # is pure IO — no recompile (see train/checkpoint.py).
            export_params(os.path.join(args.ckpt_dir, "params_export"),
                          {"params": host_state.params["model"]})
            print(f"{tag}, checkpoint saved to {args.ckpt_dir}", flush=True)

        start_epoch = int(state.step) // steps_per_epoch
        # A mid-epoch preemption checkpoint lands at step % steps_per_epoch
        # != 0; skip the batches that epoch already consumed so resumed
        # runs neither re-train seen batches nor overshoot
        # epochs*steps_per_epoch.
        resume_skip = int(state.step) % steps_per_epoch
        if resume_skip:
            print(f"mid-epoch resume: skipping the first {resume_skip} "
                  f"batches of epoch {start_epoch + 1}", flush=True)
        for epoch in range(start_epoch, cfg.train.epochs):
            for i, batch in enumerate(device_batches()):
                if epoch == start_epoch and i < resume_skip:
                    continue
                rng, sub = jax.random.split(rng)
                state, metrics = step_fn(state, batch, sub)
                timer.tick()
                step = int(state.step)
                # Metrics are fetched (ONE device_get, not one per metric)
                # only on logging steps — every fetch is a full pipeline
                # sync, and per-step syncs serialize the device queue.
                if step % args.disp_interval == 0 or \
                        step % steps_per_epoch == 0:
                    mvals = jax.device_get(metrics)
                    logger.log(step, {**{k: float(v)
                                         for k, v in mvals.items()},
                                      "pairs_per_sec":
                                          timer.throughput(global_batch)})
                if preempted["flag"]:
                    save(f"preempted at step {step} "
                         f"(epoch {epoch + 1}/{cfg.train.epochs})")
                    logger.close()
                    sys.exit(PREEMPTED_RC)
            if ((epoch + 1) % args.ckpt_every == 0
                    or epoch + 1 == cfg.train.epochs):
                save(f"epoch {epoch + 1}/{cfg.train.epochs} done")
                # A SIGTERM that lands DURING the save above is already
                # covered by this checkpoint — exit now rather than
                # running one more step and paying a second multi-minute
                # full-state save.
                if preempted["flag"] and epoch + 1 < cfg.train.epochs:
                    print(f"preempted at epoch boundary "
                          f"{epoch + 1}/{cfg.train.epochs}; checkpoint "
                          f"already saved", flush=True)
                    logger.close()
                    sys.exit(PREEMPTED_RC)
            else:
                print(f"epoch {epoch + 1}/{cfg.train.epochs} done")
                if preempted["flag"]:
                    save(f"preempted at epoch boundary "
                         f"{epoch + 1}/{cfg.train.epochs}")
                    logger.close()
                    sys.exit(PREEMPTED_RC)
    logger.close()


if __name__ == "__main__":
    main()
