"""CLI-level integration test over a fabricated on-disk KITTI tree.

Exercises the REAL command-line entry points end to end — the reference
flow ``trainval_net.py`` then ``test_net.py`` (SURVEY.md §3.2/§3.3) —
through every layer the unit tests stub around: KittiDataset directory
scan, KittiPipeline prefetch thread + ragged-tail wrap padding,
per-frame calibration through the jit, checkpoint write/restore across
two processes, KITTI result-file IO, and the vendored evaluator.

Subprocesses force ``--platform cpu`` (the sitecustomize ignores
JAX_PLATFORMS, so only the CLI's in-process config update keeps the test
off the real TPU).  Uses 10 frames with batch 4: two full batches plus a
ragged tail of 2, so the wrap-around pad path actually runs.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from stereo_rcnn_tpu.data import random_scene, render_pair, write_kitti_frame
from stereo_rcnn_tpu.geometry import default_kitti_calib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_FRAMES = 10


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_cli"))
    calib = default_kitti_calib()
    rng = np.random.RandomState(7)
    h, w = 375, 1242
    for i in range(N_FRAMES):
        objs = random_scene(rng, 3, calib, h, w)
        left, right = render_pair(objs, calib, h, w, rng)
        write_kitti_frame(root, f"{i:06d}", objs, calib, left, right)
    return root


def _run(cmd, timeout):
    proc = subprocess.run(
        [sys.executable] + cmd, cwd=REPO, timeout=timeout,
        capture_output=True, text=True)
    assert proc.returncode == 0, (
        f"{' '.join(cmd)} failed rc={proc.returncode}\n"
        f"--- stdout ---\n{proc.stdout[-4000:]}\n"
        f"--- stderr ---\n{proc.stderr[-4000:]}")
    return proc.stdout


def test_train_then_eval_cli(kitti_root, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "results")

    stdout = _run(
        ["tools/train.py", "--tiny", "--kitti-root", kitti_root,
         "--epochs", "1", "--batch-per-device", "4",
         "--ckpt-dir", ckpt, "--image-ext", ".npy", "--platform", "cpu",
         "--disp-interval", "1"], timeout=2400)
    assert "checkpoint saved" in stdout
    # 10 frames / batch 4 -> 3 steps (ragged tail wrap-padded to a full
    # batch); the loop must have actually stepped.
    assert "[step 3]" in stdout
    assert os.path.exists(os.path.join(ckpt, "config.yaml"))
    assert os.path.exists(os.path.join(ckpt, "metrics.csv"))

    stdout = _run(
        ["tools/test_net.py", "--tiny", "--kitti-root", kitti_root,
         "--ckpt-dir", ckpt, "--out", out, "--batch", "4",
         "--image-ext", ".npy", "--platform", "cpu"], timeout=2400)
    assert f"{N_FRAMES} frames" in stdout
    assert "loaded checkpoint" in stdout
    assert "AP_3d@0.7 (R40)" in stdout and "AP_bev@0.5 (R11)" in stdout

    # One KITTI-format result file per REAL frame (pad replicas must not
    # be scored or written), each line devkit-parseable: 16 fields,
    # score last, finite.
    files = sorted(os.listdir(out))
    assert files == [f"{i:06d}.txt" for i in range(N_FRAMES)]
    n_lines = 0
    for fn in files:
        with open(os.path.join(out, fn)) as f:
            for line in f:
                parts = line.split()
                assert len(parts) == 16, line
                assert parts[0] == "Car"
                vals = np.asarray(parts[1:], dtype=np.float64)
                assert np.isfinite(vals).all(), line
                n_lines += 1
    # Random-init tiny weights still emit SOME detections above the
    # score floor across 10 frames; zero everywhere would mean the
    # result-file path never saw a real detection.
    assert n_lines > 0
