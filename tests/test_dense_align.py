"""Synthetic photometric alignment: render a textured fronto-parallel-ish
object at known depth into both views; alignment must recover the depth."""

import jax
import jax.numpy as jnp
import numpy as np

from stereo_rcnn_tpu.config import SolverConfig
from stereo_rcnn_tpu.geometry import box2d_from_3d, default_kitti_calib
from stereo_rcnn_tpu.solve import align_batch


def test_align_recovers_depth():
    calib = default_kitti_calib()
    h, w = 200, 800
    rng = np.random.RandomState(3)

    z_true = 15.0
    center = jnp.array([0.0, 1.6, z_true])
    dims = jnp.array([1.5, 1.6, 3.9])
    ry = jnp.array(jnp.pi / 2)       # box faces the camera -> flat rear face

    box_l = box2d_from_3d(center, dims, ry, calib)
    # Paint smooth random texture in the left image region of the box, and
    # build the right image by shifting it with the true disparity.
    left = rng.rand(h, w).astype(np.float32)
    # Smooth the texture so bilinear warping is well-behaved.
    k = np.ones((5, 5)) / 25.0
    from numpy.lib.stride_tricks import sliding_window_view
    pad = np.pad(left, 2, mode="edge")
    left = (sliding_window_view(pad, (5, 5)) * k).sum(axis=(2, 3)).astype(
        np.float32)

    # With ry=pi/2 the VISIBLE (near) face of the box sits at z - l/2; the
    # rendered disparity must model that surface, not the box center.
    z_visible = z_true - float(dims[2]) / 2
    disp = float(calib.f * calib.baseline / z_visible)
    us = np.arange(w, dtype=np.float32)
    right = np.zeros_like(left)
    # right(u) = left(u + disp): object pixels shift LEFT by disp.
    src = np.clip(us + disp, 0, w - 1)
    lo = np.floor(src).astype(int)
    frac = src - lo
    hi = np.minimum(lo + 1, w - 1)
    right = left[:, lo] * (1 - frac) + left[:, hi] * frac

    cfg = SolverConfig(align_coarse_range=3.0, align_coarse_candidates=31,
                       align_fine_range=0.3, align_fine_candidates=25,
                       align_grid_h=16, align_grid_w=32)

    z_init = z_true + 1.3            # start off by 1.3 m
    res = align_batch(
        jnp.asarray(left), jnp.asarray(right),
        box_l[None], jnp.array([[float(box_l[0]), float(box_l[2])]]),
        jnp.array([[0.0, 1.6, z_init]]), ry[None], dims[None],
        calib, cfg, jnp.array([True]))
    assert abs(float(res.z[0]) - z_true) < 0.1, float(res.z[0])


def test_align_invalid_passthrough():
    calib = default_kitti_calib()
    cfg = SolverConfig(align_grid_h=4, align_grid_w=8,
                       align_coarse_candidates=5, align_fine_candidates=3)
    img = jnp.zeros((50, 100))
    res = align_batch(img, img, jnp.array([[10.0, 10.0, 40.0, 40.0]]),
                      jnp.array([[12.0, 38.0]]),
                      jnp.array([[0.0, 1.0, 9.0]]), jnp.array([0.1]),
                      jnp.array([[1.5, 1.6, 3.9]]), calib, cfg,
                      jnp.array([False]))
    np.testing.assert_allclose(float(res.z[0]), 9.0)
