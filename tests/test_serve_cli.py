"""CLI-level serving test: export a tiny artifact, then serve a fabricated
on-disk KITTI tree through ``tools/serve.py`` (load_pipeline + preproc +
KITTI result IO — no model-building on the serving side beyond the
parameter-tree template)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from stereo_rcnn_tpu.data import random_scene, render_pair, write_kitti_frame
from stereo_rcnn_tpu.geometry import default_kitti_calib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_FRAMES = 3  # batch 2 -> one full batch + padded tail


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_serve"))
    calib = default_kitti_calib()
    rng = np.random.RandomState(11)
    h, w = 375, 1242
    for i in range(N_FRAMES):
        objs = random_scene(rng, 2, calib, h, w)
        left, right = render_pair(objs, calib, h, w, rng)
        write_kitti_frame(root, f"{i:06d}", objs, calib, left, right)
    return os.path.join(root, "training")


def _run(cmd, timeout):
    proc = subprocess.run(
        [sys.executable] + cmd, cwd=REPO, timeout=timeout,
        capture_output=True, text=True)
    assert proc.returncode == 0, (
        f"{' '.join(cmd)} failed rc={proc.returncode}\n"
        f"--- stdout ---\n{proc.stdout[-4000:]}\n"
        f"--- stderr ---\n{proc.stderr[-4000:]}")
    return proc.stdout


def test_export_then_serve_cli(kitti_tree, tmp_path):
    artifact = str(tmp_path / "model.shlo")
    out = str(tmp_path / "results")

    stdout = _run(
        ["tools/export_model.py", "--tiny", "--platform", "cpu",
         "--platforms", "cpu", "--batch", "2", "--out", artifact],
        timeout=1200)
    assert "exported" in stdout

    stdout = _run(
        ["tools/serve.py", "--artifact", artifact, "--tiny",
         "--left-dir", os.path.join(kitti_tree, "image_2"),
         "--right-dir", os.path.join(kitti_tree, "image_3"),
         "--calib-dir", os.path.join(kitti_tree, "calib"),
         "--out", out, "--image-ext", ".npy", "--platform", "cpu"],
        timeout=1200)
    assert f"served {N_FRAMES} frames" in stdout

    files = sorted(os.listdir(out))
    assert files == [f"{i:06d}.txt" for i in range(N_FRAMES)]
    for fn in files:
        for line in open(os.path.join(out, fn)):
            parts = line.split()
            assert len(parts) == 16 and parts[0] == "Car"
            assert np.isfinite([float(x) for x in parts[1:]]).all()
