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


def test_solve_truncated_edge_constraints_dropped():
    """A car clipped by the left image border: the detector's box edge sits
    AT the border, not at the 3D corner's projection.  Zeroing the left-edge
    constraints (obs 0 = ul left image, obs 4 = ul right image; what
    ``inference.solve_and_align`` does for border-touching edges) must
    recover the pose from the remaining observations, while feeding the
    clipped edges as-is skews the solution.  Reference:
    ``box_estimator.py::solve_x_y_z_theta_from_kpt`` truncation handling."""
    calib = default_kitti_calib()
    dims, ry = [1.5, 1.6, 3.9], 0.3
    # Two truncation severities: keypoint still visible / keypoint also
    # clipped out (only 4 active constraints — exercises the LM damping +
    # trust-region step bound; an unbounded GN diverged to ~1e15 m here).
    for center in ([-7.5, 1.65, 9.0], [-9.0, 1.65, 9.0]):
        obs, d, alpha, kidx = make_obs(center, dims, ry, calib)
        assert float(obs[0]) < 0.0       # truly truncated on the left
        # What a detector bound to the image would output: clipped to 0.
        obs_clip = jnp.maximum(obs, 0.0)
        kpt_ok = float(obs[6]) > 1.5     # keypoint inside the image?
        w_trunc = jnp.ones((1, 7)).at[0, 0].set(0.0).at[0, 4].set(0.0)
        w_trunc = w_trunc.at[0, 6].set(1.0 if kpt_ok else 0.0)

        res_w = solve_batch(obs_clip[None], jnp.asarray(d)[None],
                            jnp.asarray(alpha)[None],
                            jnp.asarray(kidx)[None],
                            calib, obs_weights=w_trunc, iters=60)
        res_raw = solve_batch(obs_clip[None], jnp.asarray(d)[None],
                              jnp.asarray(alpha)[None],
                              jnp.asarray(kidx)[None], calib, iters=60)
        err_w = float(jnp.linalg.norm(res_w.position[0] -
                                      jnp.asarray(center)))
        err_raw = float(jnp.linalg.norm(res_raw.position[0] -
                                        jnp.asarray(center)))
        assert err_w < 0.25, (center, err_w)
        assert err_raw > 2 * err_w, (center, err_raw, err_w)


def test_truncation_weights_content_extent_and_per_image_gating():
    """The solver's constraint gating (inference.truncation_weights) must
    (a) detect right/bottom truncation at the letterboxed CONTENT edge,
    not the padded canvas edge — KITTI 1242x375 in a 1280x384 canvas
    leaves ~8 px of dead right padding where no box edge can ever land —
    and (b) gate each image's observation columns on that image's OWN
    box: disparity shifts the right-image box left, so a car can be
    border-truncated in only one of the two views."""
    from stereo_rcnn_tpu.inference import truncation_weights

    content_w, content_h = 1272.0, 384.0          # canvas is 1280 wide
    ones = jnp.ones((1,))
    k_u, k_p = jnp.full((1,), 600.0), ones        # confident interior kpt

    # Box clipped at the CONTENT right edge (never reaches canvas 1280).
    bl = jnp.asarray([[900.0, 50.0, 1271.0, 300.0]])
    br = bl - jnp.asarray([40.0, 0.0, 40.0, 0.0])  # disparity 40: interior
    w = truncation_weights(bl, br, k_u, k_p, content_w, content_h)
    assert float(w[0, 2]) == 0.0    # ur (left image) dropped
    assert float(w[0, 5]) == 1.0    # ur (right image) interior -> kept
    assert float(w[0, 0]) == 1.0 and float(w[0, 4]) == 1.0

    # Against the CANVAS width the same box looks interior — the content
    # extent is what makes the gate fire at all.
    w_canvas = truncation_weights(bl, br, k_u, k_p, 1280.0, content_h)
    assert float(w_canvas[0, 2]) == 1.0

    # Left-truncated only in the RIGHT image (disparity pushes it out).
    bl2 = jnp.asarray([[30.0, 50.0, 420.0, 300.0]])
    br2 = bl2 - jnp.asarray([29.5, 0.0, 29.5, 0.0])
    w2 = truncation_weights(bl2, br2, jnp.full((1,), 200.0), k_p,
                            content_w, content_h)
    assert float(w2[0, 0]) == 1.0   # ul (left image) interior -> kept
    assert float(w2[0, 4]) == 0.0   # ul (right image) clipped -> dropped

    # Keypoint beyond the content edge is dropped even with high prob.
    w3 = truncation_weights(bl2, br2, jnp.full((1,), 1271.5), k_p,
                            content_w, content_h)
    assert float(w3[0, 6]) == 0.0
