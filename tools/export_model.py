#!/usr/bin/env python
"""Export the full inference pipeline to a portable StableHLO artifact.

Deployment path the reference never had (its ``demo.py``/``test_net.py``
rebuild the module graph + reload the ``.pth`` per process): one
self-describing file that any jax process can ``load_pipeline`` and call —
no model code, no config, no checkpoint logic on the serving side.

Usage:
  python tools/export_model.py --out model.shlo [--ckpt-dir runs/bench_ckpt]
      [--batch 4] [--platforms tpu,cpu] [--config configs/res101.yml]

Verify round-trip (loads the artifact and runs a synthetic pair):
  python tools/export_model.py --verify model.shlo
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="model.shlo")
    p.add_argument("--config", default=None, help="YAML overlay")
    p.add_argument("--ckpt-dir", default=None,
                   help="bake nothing; only used to validate the tree "
                        "matches a real checkpoint's params_export")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--platforms", default="tpu",
                   help="comma-separated lowering platforms (tpu,cpu); "
                        "cpu requires roi_align_impl != pallas")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--verify", default=None, metavar="ARTIFACT",
                   help="load an artifact and run one synthetic batch "
                        "through it instead of exporting")
    p.add_argument("--platform", default="auto", choices=["auto", "cpu"],
                   help="cpu: trace/run on local CPU devices (export "
                        "lowering platforms are --platforms regardless)")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from stereo_rcnn_tpu.utils.cache import enable_compile_cache
    enable_compile_cache("serve", fingerprint=(args.platform == "cpu"))

    from stereo_rcnn_tpu.serving import export_pipeline, load_pipeline

    if args.verify:
        import jax.numpy as jnp
        from stereo_rcnn_tpu.config import Config, tiny_test_config
        from stereo_rcnn_tpu.data.synthetic import synthetic_batch
        from stereo_rcnn_tpu.inference import broadcast_calib
        from stereo_rcnn_tpu.models import init_params
        with open(args.verify, "rb") as f:
            pipe = load_pipeline(f.read())
        m = pipe.manifest
        print(f"artifact: batch={m['batch']} image_hw={m['image_hw']} "
              f"platforms={m['platforms']} params={m['num_params']:,}")
        from stereo_rcnn_tpu.config import load_config
        cfg = (load_config(args.config) if args.config
               else tiny_test_config() if args.tiny else Config())
        if [cfg.data.image_h, cfg.data.image_w] != m["image_hw"]:
            sys.exit(f"config resolution {[cfg.data.image_h, cfg.data.image_w]}"
                     f" != artifact {m['image_hw']} — pass the config the "
                     "artifact was exported with (--config/--tiny)")
        b = m["batch"]
        il, ir, _, calib = synthetic_batch(cfg, batch=b, seed=3)
        params = init_params(cfg, jax.random.PRNGKey(0))
        out = pipe(params, jnp.asarray(il), jnp.asarray(ir),
                   broadcast_calib(calib, b))
        n = int(jax.device_get(out.det.valid).sum())
        print(f"verify OK: ran batch {b}, {n} detections")
        return 0

    from stereo_rcnn_tpu.config import Config, load_config, tiny_test_config
    from stereo_rcnn_tpu.models import init_params

    cfg = (load_config(args.config) if args.config
           else tiny_test_config() if args.tiny else Config())
    params = init_params(cfg, jax.random.PRNGKey(0))
    if args.ckpt_dir:
        from stereo_rcnn_tpu.train.checkpoint import restore_params
        path = os.path.join(args.ckpt_dir, "params_export")
        params = restore_params(path, params)   # raises on tree mismatch
        print(f"parameter tree validated against {path}")

    platforms = tuple(args.platforms.split(","))
    blob = export_pipeline(cfg, params, args.batch, platforms)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob) / 1e6:.1f} MB -> {args.out} "
          f"(batch={args.batch}, platforms={platforms})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
