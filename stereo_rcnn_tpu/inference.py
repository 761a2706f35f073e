"""The complete demo.py-equivalent hot path as ONE jit-compiled function.

Behavioral reference: ``demo.py`` / ``test_net.py`` main loops (SURVEY.md
§3.1/§3.3): network forward -> decode/NMS -> per-detection 3D solve ->
dense alignment -> z-fixed re-solve.  The reference does the last three in
a host Python loop per detection; here they are vmapped and fused into the
same XLA program as the network, so a batch of stereo pairs in means a
batch of 3D boxes out with no host round-trips.

Calibration is a RUNTIME argument batched per image (real KITTI calib
varies per frame — the reference reads it per frame in test_net.py), not a
compile-time constant.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from stereo_rcnn_tpu.config import Config
from stereo_rcnn_tpu.geometry.calib import StereoCalib
from stereo_rcnn_tpu.models.detector import Detections, make_inference_fn
from stereo_rcnn_tpu.solve.box_estimator import (observations_from_detection,
                                                 solve_batch)
from stereo_rcnn_tpu.solve.dense_align import align_batch


class Detections3D(NamedTuple):
    """2D detections + solved 3D boxes, padded [B, D, ...]."""

    det: Detections
    position: jnp.ndarray   # [B, D, 3] (x, y, z) bottom-center
    ry: jnp.ndarray         # [B, D] yaw
    z_refined: jnp.ndarray  # [B, D] dense-alignment depth
    residual: jnp.ndarray   # [B, D] solver residual (px)


def broadcast_calib(calib: StereoCalib, batch: int) -> StereoCalib:
    """Tile a single working-resolution calib to a [B]-leaved batch."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (batch,) + jnp.shape(x)),
        calib)


def truncation_weights(box_left: jnp.ndarray, box_right: jnp.ndarray,
                       kpt_u: jnp.ndarray, kpt_prob: jnp.ndarray,
                       content_w, content_h, eps: float = 1.5):
    """Per-observation solver weights with truncation gating.

    Truncation-aware constraint weighting (reference
    ``box_estimator.py::solve_x_y_z_theta_from_kpt`` drops the
    observations for image-border-truncated box edges): a box edge
    clipped by the image border is NOT the projection of the 3D box
    corner, so feeding it to GN skews (x, z).  Each edge kills its own
    constraint only — the solver is damped, so the remaining
    observations still determine the pose.  Each IMAGE's columns are
    gated on that image's OWN box (a car truncated only in the right
    image — disparity pushes it past the border — must not feed its
    clipped u_r at full weight), and edges are compared against the
    letterboxed CONTENT extent, not the padded canvas.

    Returns [N, 7] weights for observation columns
    (ul, v_top, ur, v_bottom, ul_r, ur_r, u_kpt).
    """
    bl, br = box_left, box_right
    w = jnp.ones((bl.shape[0], 7))
    at_l = bl[:, 0] <= eps                       # left edge truncated
    at_t = bl[:, 1] <= eps
    at_r = bl[:, 2] >= content_w - 1.0 - eps
    at_b = bl[:, 3] >= content_h - 1.0 - eps
    at_l_r = br[:, 0] <= eps                     # right-image edges
    at_r_r = br[:, 2] >= content_w - 1.0 - eps
    drop = lambda c, m: w.at[:, c].set(jnp.where(m, 0.0, w[:, c]))
    w = drop(0, at_l)            # ul (left image)
    w = drop(4, at_l_r)          # ul (right image)
    w = drop(2, at_r)            # ur (left image)
    w = drop(5, at_r_r)          # ur (right image)
    w = drop(1, at_t)            # v_top
    w = drop(3, at_b)            # v_bottom
    # Down-weight the keypoint constraint when its confidence is low
    # (reference drops the constraint for invisible keypoints), or when
    # the keypoint itself sits on a truncated border.
    kpt_ok = ((kpt_prob > 0.2) & (kpt_u > eps)
              & (kpt_u < content_w - 1.0 - eps))
    return w.at[:, 6].set(jnp.where(kpt_ok, 1.0, 0.0))


def solve_and_align(det: Detections, images_left: jnp.ndarray,
                    images_right: jnp.ndarray, calib_batch: StereoCalib,
                    cfg: Config,
                    content_wh: jnp.ndarray | None = None) -> Detections3D:
    """Batched 3D solve + dense alignment + z-fixed re-solve.

    ``calib_batch`` leaves have leading dim [B] (per-image calibration).
    vmapped over the batch so each image uses its own calib.

    ``content_wh`` ([B, 2], working-res px) is the letterboxed CONTENT
    extent — where the real image ends inside the padded canvas.  A
    KITTI 1242x375 frame scaled into a 1280x384 canvas leaves ~8 px of
    right padding; truncation must be detected at the content edge, not
    the canvas edge, or right/bottom truncation never fires.  ``None``
    means content fills the canvas (synthetic scenes, demo/bench).
    """
    sc = cfg.solver
    gray_l = images_left.mean(-1)
    gray_r = images_right.mean(-1)
    im_h = float(images_left.shape[1])
    im_w = float(images_left.shape[2])
    if content_wh is None:
        b = images_left.shape[0]
        content_wh = jnp.broadcast_to(jnp.asarray([im_w, im_h]), (b, 2))
    eps = 1.5  # px: a box edge this close to the border is truncation

    def one_image(det_i: Detections, gl, gr, calib_i: StereoCalib, cwh):
        obs = observations_from_detection(det_i.box_left, det_i.box_right,
                                          det_i.kpt_u)
        w = truncation_weights(det_i.box_left, det_i.box_right,
                               det_i.kpt_u, det_i.kpt_prob,
                               cwh[0], cwh[1], eps)
        res = solve_batch(obs, det_i.dims, det_i.alpha, det_i.kpt_type,
                          calib_i, obs_weights=w, iters=sc.gn_iters,
                          damping=sc.gn_damping)
        ar = align_batch(gl, gr, det_i.box_left, det_i.border_u,
                         res.position, res.theta, det_i.dims, calib_i, sc,
                         det_i.valid)
        res2 = solve_batch(obs, det_i.dims, det_i.alpha, det_i.kpt_type,
                           calib_i, obs_weights=w, iters=sc.gn_iters,
                           damping=sc.gn_damping, fixed_z=ar.z)
        return res2.position, res2.theta, ar.z, res2.residual

    pos, ry, z_ref, resid = jax.vmap(one_image)(det, gray_l, gray_r,
                                                calib_batch, content_wh)
    return Detections3D(det=det, position=pos, ry=ry, z_refined=z_ref,
                        residual=resid)


def make_full_pipeline(cfg: Config, calib: StereoCalib | None = None,
                       im_h: int | None = None, im_w: int | None = None):
    """Returns the jittable end-to-end pipeline.

    With ``calib`` given (a single working-resolution calibration):
    ``fn(params, left, right) -> Detections3D`` — every image uses that
    calib (demo/bench path).  Without it: ``fn(params, left, right,
    calib_batch) -> Detections3D`` with a [B]-leaved per-image calib
    pytree (eval path; build with ``jax.tree.map(jnp.stack, calibs)`` or
    :func:`broadcast_calib`).
    """
    infer = make_inference_fn(cfg, im_h, im_w)

    def fn_calib(params, images_left, images_right,
                 calib_batch: StereoCalib,
                 content_wh: jnp.ndarray | None = None) -> Detections3D:
        det = infer(params, images_left, images_right)
        return solve_and_align(det, images_left, images_right, calib_batch,
                               cfg, content_wh)

    if calib is None:
        return fn_calib

    def fn(params, images_left, images_right) -> Detections3D:
        cb = broadcast_calib(calib, images_left.shape[0])
        return fn_calib(params, images_left, images_right, cb)

    return fn
