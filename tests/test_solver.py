"""Synthetic roundtrip tests: project a known 3D box -> observations ->
solver must recover the pose (SURVEY.md §4 'Solver tests')."""

import jax
import jax.numpy as jnp
import numpy as np

from stereo_rcnn_tpu.geometry import (box2d_from_3d, default_kitti_calib,
                                      perspective_keypoints, viewpoint_alpha,
                                      visible_keypoint_index)
from stereo_rcnn_tpu.solve import (observations_from_detection, solve_batch,
                                   solve_pose)


def make_obs(center, dims, ry, calib):
    c = jnp.asarray(center)
    d = jnp.asarray(dims)
    r = jnp.asarray(ry)
    box_l = box2d_from_3d(c, d, r, calib)
    box_r = box2d_from_3d(c, d, r, calib, right=True)
    kpts = perspective_keypoints(c, d, r, calib)
    kidx = visible_keypoint_index(c, r)
    obs = observations_from_detection(box_l, box_r, kpts[kidx])
    alpha = viewpoint_alpha(c, r)
    return obs, d, alpha, kidx


def test_solve_recovers_pose():
    calib = default_kitti_calib()
    center = [2.0, 1.65, 18.0]
    dims = [1.5, 1.6, 3.9]
    ry = 0.4
    obs, d, alpha, kidx = make_obs(center, dims, ry, calib)
    res = solve_pose(obs, d, alpha, kidx, calib, iters=50)
    np.testing.assert_allclose(np.asarray(res.position), center, atol=0.05)
    np.testing.assert_allclose(float(res.theta), ry, atol=0.02)
    assert float(res.residual) < 0.5


def test_solve_batch_various_poses():
    calib = default_kitti_calib()
    cases = [
        ([-3.0, 1.6, 12.0], [1.45, 1.6, 3.6], -0.8),
        ([0.5, 1.7, 30.0], [1.6, 1.7, 4.2], 1.2),
        ([5.0, 1.5, 25.0], [1.5, 1.6, 3.9], 3.0),
        ([-1.0, 1.6, 8.0], [1.5, 1.6, 3.9], -2.5),
    ]
    obs, dims, alphas, kidx = [], [], [], []
    for c, d, r in cases:
        o, dd, a, k = make_obs(c, d, r, calib)
        obs.append(o); dims.append(dd); alphas.append(a); kidx.append(k)
    res = solve_batch(jnp.stack(obs), jnp.stack(dims), jnp.stack(alphas),
                      jnp.stack(kidx), calib, iters=60)
    for i, (c, d, r) in enumerate(cases):
        np.testing.assert_allclose(np.asarray(res.position[i]), c, atol=0.15)
        # Yaw recovered modulo 2pi.
        dr = (float(res.theta[i]) - r + np.pi) % (2 * np.pi) - np.pi
        assert abs(dr) < 0.05, (i, float(res.theta[i]), r)


def test_solve_fixed_z():
    calib = default_kitti_calib()
    center = [1.0, 1.6, 20.0]
    dims = [1.5, 1.6, 3.9]
    ry = 0.3
    obs, d, alpha, kidx = make_obs(center, dims, ry, calib)
    res = solve_pose(obs, d, alpha, kidx, calib, iters=50,
                     fixed_z=jnp.asarray(center[2] + 0.0))
    np.testing.assert_allclose(float(res.position[2]), center[2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.position[:2]), center[:2],
                               atol=0.05)


def test_solver_jits():
    calib = default_kitti_calib()
    obs, d, alpha, kidx = make_obs([0.0, 1.6, 15.0], [1.5, 1.6, 3.9], 0.2,
                                   calib)
    fn = jax.jit(lambda o: solve_pose(o, d, alpha, kidx, calib, iters=30))
    res = fn(obs)
    assert np.isfinite(np.asarray(res.position)).all()
