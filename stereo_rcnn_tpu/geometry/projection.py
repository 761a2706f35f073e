"""3D box geometry: corners, stereo projection, perspective keypoints.

Behavioral reference: ``lib/model/utils/kitti_utils.py`` — 3D-box corner
projection helpers and the truncation-aware boundary-keypoint logic
(``infer_boundary``); plus the target derivation in ``lib/datasets/kitti.py``
(right box from the 3D pose projected through P3).

KITTI camera-frame convention: x right, y DOWN, z forward.  An object label
gives the BOTTOM-CENTER location (x, y, z), dimensions (h, w, l) and yaw
``ry`` about the camera y-axis (0 = facing +x).  Rotation matrix:

    R_y = [[ cos r, 0, sin r],
           [     0, 1,     0],
           [-sin r, 0, cos r]]

Corner order used throughout this package (object frame, before rotation):
index k in 0..3 are BOTTOM corners, k+4 the matching TOP corners.

    k : (x_o, z_o) = 0:(+l/2,+w/2) 1:(+l/2,-w/2) 2:(-l/2,-w/2) 3:(-l/2,+w/2)

The four "perspective keypoints" of the paper are the projections of the four
vertical edges (one per k); at most three are visible, and exactly one (the
nearest visible vertical edge) falls strictly inside the 2D box — that one
constrains the 3D solve.
"""

from __future__ import annotations

import jax.numpy as jnp

from stereo_rcnn_tpu.geometry.calib import StereoCalib

# Object-frame corner template, unit dims; scaled by (l, h, w) at use.
# Columns: x_o (length axis), y_o (0 bottom / -1 top), z_o (width axis).
_CORNERS_X = jnp.asarray([0.5, 0.5, -0.5, -0.5] * 2)
_CORNERS_Z = jnp.asarray([0.5, -0.5, -0.5, 0.5] * 2)
_CORNERS_Y = jnp.asarray([0.0] * 4 + [-1.0] * 4)


def box3d_corners(center: jnp.ndarray, dims_hwl: jnp.ndarray,
                  ry: jnp.ndarray) -> jnp.ndarray:
    """3D corners in camera frame.

    center: [..., 3] bottom-center (x, y, z); dims_hwl: [..., 3] (h, w, l);
    ry: [...] yaw.  Returns [..., 8, 3].
    """
    h, w, l = dims_hwl[..., 0], dims_hwl[..., 1], dims_hwl[..., 2]
    xo = _CORNERS_X * l[..., None]
    yo = _CORNERS_Y * h[..., None]
    zo = _CORNERS_Z * w[..., None]
    c, s = jnp.cos(ry)[..., None], jnp.sin(ry)[..., None]
    x = center[..., 0:1] + c * xo + s * zo
    y = center[..., 1:2] + yo
    z = center[..., 2:3] - s * xo + c * zo
    return jnp.stack([x, y, z], axis=-1)


def project(points: jnp.ndarray, calib: StereoCalib,
            right: bool = False) -> jnp.ndarray:
    """Project camera-frame points [..., 3] to pixel (u, v) [..., 2].

    KITTI P2/P3 factor as K [I | t]: for the left camera
    u = cu + f*(x + tx2)/z, and the right camera sits one baseline further
    along -x: u' = cu + f*(x + tx2 - b)/z.  Points are in the KITTI
    reference-camera frame (the frame object labels live in).
    """
    offset = calib.tx2 - (calib.baseline if right else 0.0)
    z = jnp.maximum(points[..., 2], 1e-3)
    u = calib.cu + calib.f * (points[..., 0] + offset) / z
    v = calib.cv + calib.f * points[..., 1] / z
    return jnp.stack([u, v], axis=-1)


def project_box3d(center: jnp.ndarray, dims_hwl: jnp.ndarray,
                  ry: jnp.ndarray, calib: StereoCalib,
                  right: bool = False) -> jnp.ndarray:
    """Projected 2D corners [..., 8, 2] of a 3D box."""
    return project(box3d_corners(center, dims_hwl, ry), calib, right=right)


def box2d_from_3d(center, dims_hwl, ry, calib, right=False) -> jnp.ndarray:
    """Tight 2D xyxy bounding box of the projected 3D box.  This is how the
    reference derives the RIGHT gt box (kitti.py projects pose through P3)."""
    uv = project_box3d(center, dims_hwl, ry, calib, right=right)
    return jnp.concatenate([uv.min(axis=-2), uv.max(axis=-2)], axis=-1)


def perspective_keypoints(center, dims_hwl, ry, calib) -> jnp.ndarray:
    """u-coordinates [..., 4] of the four vertical-edge keypoints in the
    LEFT image, indexed by corner k (see module docstring)."""
    uv = project_box3d(center, dims_hwl, ry, calib)          # [..., 8, 2]
    return uv[..., :4, 0]                                    # bottom corners' u


def visible_keypoint_index(center: jnp.ndarray, ry: jnp.ndarray) -> jnp.ndarray:
    """Index k of the vertical edge that is the *nearest visible* one — the
    perspective keypoint the solver uses.  The nearest corner in depth of the
    bottom face (after rotation) is that edge."""
    corners = box3d_corners(center, jnp.ones_like(center), ry)  # unit dims ok
    z = corners[..., :4, 2]
    return jnp.argmin(z, axis=-1)


def viewpoint_alpha(center: jnp.ndarray, ry: jnp.ndarray) -> jnp.ndarray:
    """Observation angle alpha = ry - atan2(x, z) (KITTI definition).  The
    head regresses (sin a, cos a); reference: proposal_target_layer viewpoint
    targets."""
    return ry - jnp.arctan2(center[..., 0], center[..., 2])


def ry_from_alpha(alpha: jnp.ndarray, x: jnp.ndarray,
                  z: jnp.ndarray) -> jnp.ndarray:
    return alpha + jnp.arctan2(x, z)
