"""bench.py must build its ONE compiled program family from the trained
checkpoint's saved config when `runs/bench_ckpt/params_export` exists
(e.g. the GroupNorm tree of configs/synthetic_fullres.yml), and fall back
to the default frozen-BN production config otherwise — the driver's
trained-weights bench line depends on this selection being right."""

import os
import sys

import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_bench_config_prefers_checkpoint_config(tmp_path):
    import bench
    from stereo_rcnn_tpu.config import Config

    ckpt = tmp_path / "bench_ckpt"
    export = ckpt / "params_export"
    export.mkdir(parents=True)
    cfg = Config()
    import dataclasses
    with open(ckpt / "config.yaml", "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg) | {
            "backbone": dataclasses.asdict(cfg.backbone) | {
                "norm": "group", "remat": True},
        }, f)

    picked = bench.bench_config(str(export))
    assert picked.backbone.norm == "group"       # the ckpt's norm mode
    assert picked.backbone.remat is False        # forward-only override
    assert picked.rcnn.roi_align_impl == "pallas"


def test_resolve_prefers_calibrated_export(tmp_path):
    import bench

    ckpt = tmp_path / "bench_ckpt"
    plain = ckpt / "params_export"
    plain.mkdir(parents=True)
    assert bench.resolve_bench_params(str(ckpt)) == str(plain)
    cal = ckpt / "calibrated" / "params_export"
    cal.mkdir(parents=True)
    # A calibrated dir WITHOUT the VALID marker (tool crashed mid-export)
    # must not be preferred — calibrate_norm.py writes the marker last.
    assert bench.resolve_bench_params(str(ckpt)) == str(plain)
    (ckpt / "calibrated" / "VALID").write_text("median IoU 1.0\n")
    assert bench.resolve_bench_params(str(ckpt)) == str(cal)


def test_bench_config_default_without_checkpoint(tmp_path):
    import bench

    picked = bench.bench_config(str(tmp_path / "missing" / "params_export"))
    assert picked.backbone.norm == "frozen"
    assert picked.rcnn.roi_align_impl == "pallas"
