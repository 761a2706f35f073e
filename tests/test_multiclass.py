"""Multi-class (K>2) end-to-end coverage.

The reference's released model is Car-only, but its ``test_net.py`` loops
``imdb.classes`` per class (SURVEY.md §3.1 "post" step) — the framework
must support K>2 everywhere: the synthetic renderer (distinct per-class
sizes AND texture statistics), target assignment (per-class mean-dim
offsets), the class-indexed head columns, the per-class vmap decode +
merged top-k in postprocess, per-class AP in the evaluator, and the
train/test CLIs over a fabricated 2-foreground-class KITTI tree.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from stereo_rcnn_tpu.config import RCNNConfig, load_config, tiny_test_config
from stereo_rcnn_tpu.data import random_scene, render_pair, write_kitti_frame
from stereo_rcnn_tpu.data.synthetic import _CLASS_SPECS, synthetic_batch
from stereo_rcnn_tpu.geometry import default_kitti_calib
from stereo_rcnn_tpu.train import GroundTruth, proposal_targets

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MULTICLASS_OVERLAY = {
    "data": {"classes": ["__background__", "Car", "Van"],
             "ignore_types": ["Truck", "DontCare"]},
    "rcnn": {"num_classes": 3,
             "mean_dims_hwl": [[1.53, 1.63, 3.88], [2.15, 1.85, 5.05]]},
}


def tiny3() -> "Config":
    return load_config(overrides=MULTICLASS_OVERLAY,
                       base=tiny_test_config())


def test_renderer_draws_both_classes_with_class_consistent_dims():
    cfg = tiny3()
    il, ir, gt, _ = synthetic_batch(cfg, batch=6, seed=3, n_objects=4)
    cls = np.asarray(gt.cls)[np.asarray(gt.valid)]
    dims = np.asarray(gt.dims)[np.asarray(gt.valid)]
    assert {1, 2} <= set(cls.tolist())          # both classes present
    car, van = _CLASS_SPECS["Car"], _CLASS_SPECS["Van"]
    for d in dims[cls == 1]:
        assert car["h"][0] <= d[0] <= car["h"][1] and \
               car["l"][0] <= d[2] <= car["l"][1]
    for d in dims[cls == 2]:
        assert van["h"][0] <= d[0] <= van["h"][1] and \
               van["l"][0] <= d[2] <= van["l"][1]
    # The size ranges are disjoint in length — the classes are separable.
    assert car["l"][1] < van["l"][0]
    assert np.isfinite(il).all() and np.isfinite(ir).all()


def test_car_only_rendering_unchanged_by_multiclass_support():
    """The single-class path must consume the SAME rng stream as before
    the multi-class extension (cached scene pools stay valid)."""
    calib = default_kitti_calib()
    rng1 = np.random.RandomState(11)
    objs1 = random_scene(rng1, 3, calib, 375, 1242)
    rng2 = np.random.RandomState(11)
    objs2 = random_scene(rng2, 3, calib, 375, 1242, class_names=("Car",))
    assert len(objs1) == len(objs2)
    for a, b in zip(objs1, objs2):
        assert a.type == b.type == "Car"
        np.testing.assert_array_equal(a.box, b.box)
        np.testing.assert_array_equal(a.dims, b.dims)
    # And the rng streams ended in the same state.
    assert rng1.randint(1 << 30) == rng2.randint(1 << 30)


def _gt_two_classes(max_g=8):
    g = max_g
    boxes_l = jnp.array([[20.0, 20.0, 60.0, 52.0],
                         [140.0, 30.0, 200.0, 80.0]], jnp.float32)
    boxes_r = boxes_l - jnp.array([6.0, 0.0, 6.0, 0.0])
    dims = jnp.array([[1.5, 1.6, 3.9], [2.2, 1.9, 5.2]], jnp.float32)
    z4 = jnp.zeros((g,), jnp.float32)
    return GroundTruth(
        left=jnp.zeros((g, 4)).at[:2].set(boxes_l),
        right=jnp.zeros((g, 4)).at[:2].set(boxes_r),
        cls=jnp.zeros((g,), jnp.int32).at[:2].set(jnp.array([1, 2])),
        dims=jnp.zeros((g, 3)).at[:2].set(dims),
        alpha=z4.at[:2].set(0.3),
        kpt_u=z4.at[:2].set(jnp.array([40.0, 170.0])),
        kpt_type=jnp.zeros((g,), jnp.int32),
        kpt_visible=jnp.zeros((g,), bool).at[:2].set(True),
        border_u=jnp.zeros((g, 2)).at[:2].set(
            jnp.array([[21.0, 59.0], [141.0, 199.0]])),
        valid=jnp.zeros((g,), bool).at[:2].set(True),
        location=jnp.zeros((g, 3)),
        ry=z4,
        ignore=jnp.zeros((g,), bool),
    )


def test_proposal_targets_use_per_class_mean_dims():
    gt = _gt_two_classes()
    pl = jnp.concatenate([gt.left[:2], jnp.zeros((14, 4))], 0)
    pr = jnp.concatenate([gt.right[:2], jnp.zeros((14, 4))], 0)
    pv = jnp.array([True, True] + [False] * 14)
    mean = np.array(MULTICLASS_OVERLAY["rcnn"]["mean_dims_hwl"], np.float32)
    cfg = RCNNConfig(rois_per_image=16, num_classes=3,
                     mean_dims_hwl=tuple(map(tuple, mean)))
    tgt = proposal_targets(pl, pr, pv, gt, cfg, jax.random.PRNGKey(0))
    cls = np.asarray(tgt.cls)
    dimt = np.asarray(tgt.dim_targets)
    gdims = np.asarray(gt.dims)
    assert {1, 2} <= set(cls.tolist())
    for row in np.nonzero(cls > 0)[0]:
        c = cls[row]
        expect = gdims[c - 1] - mean[c - 1]   # gt index == cls-1 here
        np.testing.assert_allclose(dimt[row], expect, atol=1e-5)


def test_flat_mean_dims_still_broadcast():
    """The historical flat [3] mean must behave exactly as before."""
    gt = _gt_two_classes()
    pl = jnp.concatenate([gt.left[:2], jnp.zeros((14, 4))], 0)
    pv = jnp.array([True, True] + [False] * 14)
    cfg = RCNNConfig(rois_per_image=16)       # default flat mean, K=2
    tgt = proposal_targets(pl, pl, pv, gt, cfg, jax.random.PRNGKey(0))
    cls = np.asarray(tgt.cls)
    dimt = np.asarray(tgt.dim_targets)
    mean = np.asarray(cfg.mean_dims_hwl, np.float32)
    gdims = np.asarray(gt.dims)
    for row in np.nonzero(cls > 0)[0]:
        np.testing.assert_allclose(
            dimt[row], gdims[cls[row] - 1] - mean, atol=1e-5)


# ---------------------------------------------------------------------------
# CLI-level e2e over a fabricated 2-foreground-class KITTI tree.
# ---------------------------------------------------------------------------

N_FRAMES = 8


@pytest.fixture(scope="module")
def multiclass_kitti_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_mc"))
    calib = default_kitti_calib()
    rng = np.random.RandomState(5)
    h, w = 375, 1242
    n_van = 0
    for i in range(N_FRAMES):
        objs = random_scene(rng, 3, calib, h, w,
                            class_names=("Car", "Van"))
        n_van += sum(o.type == "Van" for o in objs)
        left, right = render_pair(objs, calib, h, w, rng)
        write_kitti_frame(root, f"{i:06d}", objs, calib, left, right)
    assert n_van > 0            # the tree really is multi-class
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


def test_multiclass_train_then_eval_cli(multiclass_kitti_root, tmp_path):
    overlay = str(tmp_path / "tiny3.yml")
    with open(overlay, "w") as f:
        yaml.safe_dump(MULTICLASS_OVERLAY, f)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "results")

    stdout = _run(
        ["tools/train.py", "--tiny", "--config", overlay,
         "--kitti-root", multiclass_kitti_root,
         "--epochs", "1", "--batch-per-device", "4",
         "--ckpt-dir", ckpt, "--image-ext", ".npy", "--platform", "cpu",
         "--disp-interval", "1"], timeout=2400)
    assert "checkpoint saved" in stdout

    stdout = _run(
        ["tools/test_net.py", "--tiny", "--config", overlay,
         "--kitti-root", multiclass_kitti_root,
         "--ckpt-dir", ckpt, "--out", out, "--batch", "4",
         "--image-ext", ".npy", "--platform", "cpu"], timeout=2400)
    # Per-class AP lines for BOTH foreground classes.
    assert "[Car] AP_3d@0.5 (R40)" in stdout
    assert "[Van] AP_3d@0.5 (R40)" in stdout

    # Result files carry both class names, and each class's detections
    # decode against ITS OWN mean dims: after one tiny epoch the dim head
    # outputs are still near their small init, so decoded lengths sit
    # near the per-class mean — Car ~3.9 m, Van ~5.05 m.
    seen = {"Car": [], "Van": []}
    for fn in sorted(os.listdir(out)):
        with open(os.path.join(out, fn)) as f:
            for line in f:
                p = line.split()
                assert len(p) == 16, line
                assert p[0] in seen, line
                seen[p[0]].append(float(p[10]))     # length (l)
    assert seen["Car"] and seen["Van"]
    assert np.median(seen["Car"]) < 4.4
    assert np.median(seen["Van"]) > 4.4
