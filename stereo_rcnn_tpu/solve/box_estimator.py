"""Batched 3D box estimation by Gauss-Newton least squares — jit/vmap native.

Behavioral reference: ``lib/model/utils/box_estimator.py`` —
``solve_x_y_z_theta_from_kpt`` (full 4-DoF solve from the 2D box pair +
perspective keypoint) and ``solve_x_y_theta_from_kpt`` (3-DoF re-solve with
z fixed by dense alignment).  The reference runs a per-object numpy loop on
host; here the solver is a fixed-iteration ``lax.fori_loop`` over a damped
Gauss-Newton step, vmapped over all detections of a batch, so the whole
solve is one TPU launch (SURVEY.md §3.1 "the part BASELINE.json says to
batch").

Measurement model (paper arXiv 1902.09738 §4.1): given object dims
(h, w, l) and calibration, the 7 observations

    z = [ul, vt, ur, vb, ul', ur', up]

(left box edges, right box horizontal edges, perspective-keypoint u) are
generated from the state s = (x, y, z, theta) by projecting the 3D box and
taking extremes.  We use exact min/max over the 8 projected corners (the
reference enumerates viewpoint cases instead); jacfwd of min/max picks the
active corner's derivative, which is exactly the per-case Jacobian.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from stereo_rcnn_tpu.geometry.calib import StereoCalib
from stereo_rcnn_tpu.geometry.projection import box3d_corners, project


class SolveResult(NamedTuple):
    position: jnp.ndarray   # [..., 3] (x, y, z) bottom-center
    theta: jnp.ndarray      # [...] yaw ry
    residual: jnp.ndarray   # [...] final RMS residual (pixels)


def _observe(state: jnp.ndarray, dims_hwl: jnp.ndarray, kpt_idx: jnp.ndarray,
             calib: StereoCalib) -> jnp.ndarray:
    """Predicted observation vector [7] from state (x, y, z, theta)."""
    center = state[:3]
    theta = state[3]
    corners = box3d_corners(center, dims_hwl, theta)       # [8, 3]
    uv_l = project(corners, calib)                         # [8, 2]
    uv_r = project(corners, calib, right=True)
    up = project(corners[kpt_idx], calib)[0]
    return jnp.stack([
        uv_l[:, 0].min(), uv_l[:, 1].min(),
        uv_l[:, 0].max(), uv_l[:, 1].max(),
        uv_r[:, 0].min(), uv_r[:, 0].max(),
        up,
    ])


def _init_state(obs: jnp.ndarray, dims_hwl: jnp.ndarray, alpha: jnp.ndarray,
                calib: StereoCalib) -> jnp.ndarray:
    """Closed-form initialisation from box-center disparity."""
    ul, vt, ur, vb, ul_r, ur_r, _ = (obs[i] for i in range(7))
    uc_l = 0.5 * (ul + ur)
    uc_r = 0.5 * (ul_r + ur_r)
    disp = jnp.clip(uc_l - uc_r, 1.0, None)
    z0 = calib.f * calib.baseline / disp
    x0 = (uc_l - calib.cu) * z0 / calib.f - calib.tx2
    # Bottom edge vb maps to the box bottom (y of bottom-center).
    y0 = (vb - calib.cv) * z0 / calib.f
    theta0 = alpha + jnp.arctan2(x0, z0)
    return jnp.stack([x0, y0, z0, theta0])


def _gauss_newton(residual_fn, state0: jnp.ndarray, iters: int,
                  damping: float, free_mask: jnp.ndarray) -> jnp.ndarray:
    """Damped GN with a mask freezing some state dims (e.g. z fixed)."""

    def step(_, state):
        r = residual_fn(state)                       # [7]
        j = jax.jacfwd(residual_fn)(state)           # [7, 4]
        j = j * free_mask[None, :]
        jtj = j.T @ j + damping * jnp.eye(4)
        jtr = j.T @ r
        delta = jnp.linalg.solve(jtj, jtr)
        return state - delta * free_mask

    return jax.lax.fori_loop(0, iters, step, state0)


def solve_pose(obs: jnp.ndarray, dims_hwl: jnp.ndarray, alpha: jnp.ndarray,
               kpt_idx: jnp.ndarray, calib: StereoCalib,
               obs_weights: jnp.ndarray | None = None,
               iters: int = 30, damping: float = 1e-3,
               fixed_z: jnp.ndarray | None = None) -> SolveResult:
    """Solve one detection's pose; vmap for batches.

    Args:
      obs: [7] = [ul, vt, ur, vb, ul_r, ur_r, up] pixels.
      dims_hwl: [3] regressed dimensions (metres).
      alpha: viewpoint angle (used for theta init and to disambiguate yaw).
      kpt_idx: int corner index 0..3 of the perspective keypoint channel.
      obs_weights: [7] residual weights (down-weight truncated edges or a
        low-confidence keypoint; reference drops the kpt constraint when
        invisible).
      fixed_z: if given, z is frozen at this value and only (x, y, theta)
        are optimised — the ``solve_x_y_theta_from_kpt`` path.
    """
    if obs_weights is None:
        obs_weights = jnp.ones((7,))

    state0 = _init_state(obs, dims_hwl, alpha, calib)
    free = jnp.ones((4,))
    if fixed_z is not None:
        state0 = state0.at[2].set(fixed_z)
        free = free.at[2].set(0.0)

    def residual_fn(state):
        return (_observe(state, dims_hwl, kpt_idx, calib) - obs) * obs_weights

    state = _gauss_newton(residual_fn, state0, iters, damping, free)
    r = residual_fn(state)
    return SolveResult(position=state[:3], theta=state[3],
                       residual=jnp.sqrt(jnp.mean(r ** 2)))


def solve_batch(obs: jnp.ndarray, dims_hwl: jnp.ndarray, alpha: jnp.ndarray,
                kpt_idx: jnp.ndarray, calib: StereoCalib,
                obs_weights: jnp.ndarray | None = None, iters: int = 30,
                damping: float = 1e-3,
                fixed_z: jnp.ndarray | None = None) -> SolveResult:
    """Vmapped solve over [D] detections (calib shared)."""
    fn = functools.partial(solve_pose, calib=calib, iters=iters,
                           damping=damping)
    in_axes = [0, 0, 0, 0]
    args = [obs, dims_hwl, alpha, kpt_idx]
    kw = {}
    if obs_weights is not None:
        kw["obs_weights"] = obs_weights
    if fixed_z is not None:
        kw["fixed_z"] = fixed_z
    return jax.vmap(lambda *a, **k: fn(*a, **k),
                    in_axes=tuple(in_axes + [0] * len(kw)))(*args, *kw.values())


def observations_from_detection(box_left: jnp.ndarray, box_right: jnp.ndarray,
                                kpt_u: jnp.ndarray) -> jnp.ndarray:
    """Pack network outputs into the solver's [.., 7] observation vector."""
    return jnp.stack([
        box_left[..., 0], box_left[..., 1], box_left[..., 2],
        box_left[..., 3], box_right[..., 0], box_right[..., 2], kpt_u,
    ], axis=-1)
