"""The complete demo.py-equivalent hot path as ONE jit-compiled function.

Behavioral reference: ``demo.py`` / ``test_net.py`` main loops (SURVEY.md
§3.1/§3.3): network forward -> decode/NMS -> per-detection 3D solve ->
dense alignment -> z-fixed re-solve.  The reference does the last three in
a host Python loop per detection; here they are vmapped and fused into the
same XLA program as the network, so a batch of stereo pairs in means a
batch of 3D boxes out with no host round-trips.
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


def make_full_pipeline(cfg: Config, calib: StereoCalib,
                       im_h: int | None = None, im_w: int | None = None):
    """Returns jittable ``fn(params, left, right) -> Detections3D``.

    ``calib`` is the working-resolution calibration (already scaled to the
    padded image size).
    """
    infer = make_inference_fn(cfg, im_h, im_w)
    sc = cfg.solver

    def fn(params, images_left, images_right) -> Detections3D:
        det = infer(params, images_left, images_right)
        gray_l = images_left.mean(-1)
        gray_r = images_right.mean(-1)

        # The GN solver is natively batched over a flat [B*D] axis; the
        # dense alignment is natively batched over [B, D].
        b, d = det.valid.shape
        flat = jax.tree.map(lambda x: x.reshape(b * d, *x.shape[2:]), det)

        obs = observations_from_detection(flat.box_left, flat.box_right,
                                          flat.kpt_u)
        # Down-weight the keypoint constraint when its confidence is low
        # (reference drops the constraint for invisible keypoints).
        w = jnp.ones(obs.shape)
        w = w.at[:, 6].set(jnp.where(flat.kpt_prob > 0.2, 1.0, 0.0))
        res = solve_batch(obs, flat.dims, flat.alpha, flat.kpt_type, calib,
                          obs_weights=w, iters=sc.gn_iters,
                          damping=sc.gn_damping)
        ar = align_batch(gray_l, gray_r, det.box_left, det.border_u,
                         res.position.reshape(b, d, 3),
                         res.theta.reshape(b, d), det.dims, calib, sc,
                         det.valid)
        res2 = solve_batch(obs, flat.dims, flat.alpha, flat.kpt_type, calib,
                           obs_weights=w, iters=sc.gn_iters,
                           damping=sc.gn_damping,
                           fixed_z=ar.z.reshape(b * d))
        return Detections3D(
            det=det,
            position=res2.position.reshape(b, d, 3),
            ry=res2.theta.reshape(b, d),
            z_refined=ar.z.reshape(b, d),
            residual=res2.residual.reshape(b, d))

    return fn
