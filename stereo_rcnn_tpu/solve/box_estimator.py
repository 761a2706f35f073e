"""Batched 3D box estimation by Gauss-Newton least squares — jit/vmap native.

Behavioral reference: ``lib/model/utils/box_estimator.py`` —
``solve_x_y_z_theta_from_kpt`` (full 4-DoF solve from the 2D box pair +
perspective keypoint) and ``solve_x_y_theta_from_kpt`` (3-DoF re-solve with
z fixed by dense alignment).  The reference runs a per-object numpy loop on
host; here the solver processes ALL detections of a batch as one
array-shaped program (SURVEY.md §3.1 "the part BASELINE.json says to
batch").

Measurement model (paper arXiv 1902.09738 §4.1): given object dims
(h, w, l) and calibration, the 7 observations

    z = [ul, vt, ur, vb, ul', ur', up]

(left box edges, right box horizontal edges, perspective-keypoint u) are
generated from the state s = (x, y, z, theta) by projecting the 3D box and
taking extremes over the 8 corners (the reference enumerates viewpoint
cases instead; min/max subgradients select the active corner, which IS the
per-case Jacobian).

TPU design notes: everything is written natively batched over the leading
detection axis N — NO nested vmap, no per-sample linalg.  The 4x4 damped
normal equations are solved by a fully unrolled scalar Cholesky whose
"scalars" are [N]-vectors (pure VPU arithmetic); the Jacobian comes from 4
batched JVPs (one per state dimension).  This keeps the XLA graph shallow
and wide, which both compiles and runs orders of magnitude faster on TPU
than the scalar formulation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from stereo_rcnn_tpu.geometry.calib import StereoCalib
from stereo_rcnn_tpu.geometry.projection import box3d_corners, project


class SolveResult(NamedTuple):
    position: jnp.ndarray   # [N, 3] (x, y, z) bottom-center
    theta: jnp.ndarray      # [N] yaw ry
    residual: jnp.ndarray   # [N] final RMS residual (pixels)


def _observe(state: jnp.ndarray, dims_hwl: jnp.ndarray, kpt_idx: jnp.ndarray,
             calib: StereoCalib) -> jnp.ndarray:
    """Predicted observations [N, 7] from state [N, 4]."""
    center = state[:, :3]
    theta = state[:, 3]
    corners = box3d_corners(center, dims_hwl, theta)       # [N, 8, 3]
    uv_l = project(corners, calib)                         # [N, 8, 2]
    uv_r = project(corners, calib, right=True)
    kpt_corner = jnp.take_along_axis(
        corners, kpt_idx[:, None, None].astype(jnp.int32)
        .repeat(3, -1), axis=1)[:, 0]                      # [N, 3]
    up = project(kpt_corner, calib)[:, 0]                  # [N]
    return jnp.stack([
        uv_l[:, :, 0].min(1), uv_l[:, :, 1].min(1),
        uv_l[:, :, 0].max(1), uv_l[:, :, 1].max(1),
        uv_r[:, :, 0].min(1), uv_r[:, :, 0].max(1),
        up,
    ], axis=-1)


def _init_state(obs: jnp.ndarray, alpha: jnp.ndarray,
                calib: StereoCalib) -> jnp.ndarray:
    """Closed-form init [N, 4] from box-center disparity."""
    ul, vt, ur, vb, ul_r, ur_r = (obs[:, i] for i in range(6))
    uc_l = 0.5 * (ul + ur)
    uc_r = 0.5 * (ul_r + ur_r)
    disp = jnp.clip(uc_l - uc_r, 1.0, None)
    z0 = calib.f * calib.baseline / disp
    x0 = (uc_l - calib.cu) * z0 / calib.f - calib.tx2
    y0 = (vb - calib.cv) * z0 / calib.f
    theta0 = alpha + jnp.arctan2(x0, z0)
    return jnp.stack([x0, y0, z0, theta0], axis=-1)


def _solve_spd4(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 4x4 SPD solve by unrolled Cholesky: a [N, 4, 4], b [N, 4].

    ``jnp.linalg.solve``'s pivoted LU compiles pathologically on TPU inside
    loops; unrolled Cholesky is ~50 wide VPU ops.
    """
    n = 4
    l = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = a[:, i, j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            if i == j:
                l[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                l[i][j] = s / l[j][j]
    y = [None] * n
    for i in range(n):
        s = b[:, i]
        for k in range(i):
            s = s - l[i][k] * y[k]
        y[i] = s / l[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - l[k][i] * x[k]
        x[i] = s / l[i][i]
    return jnp.stack(x, axis=-1)


def solve_batch(obs: jnp.ndarray, dims_hwl: jnp.ndarray, alpha: jnp.ndarray,
                kpt_idx: jnp.ndarray, calib: StereoCalib,
                obs_weights: jnp.ndarray | None = None, iters: int = 30,
                damping: float = 1e-3,
                fixed_z: jnp.ndarray | None = None) -> SolveResult:
    """Solve [N] detections' poses in one batched GN program.

    Args:
      obs: [N, 7] = [ul, vt, ur, vb, ul_r, ur_r, up] pixels.
      dims_hwl: [N, 3] regressed dimensions (metres).
      alpha: [N] viewpoint angle (theta init + yaw disambiguation).
      kpt_idx: [N] int corner index 0..3 of the perspective keypoint.
      obs_weights: [N, 7] residual weights (down-weight truncated edges or a
        low-confidence keypoint; reference drops the kpt constraint when
        invisible).
      fixed_z: [N] — if given, z is frozen (the ``solve_x_y_theta_from_kpt``
        path after dense alignment).
    """
    nd = obs.shape[0]
    if obs_weights is None:
        obs_weights = jnp.ones((nd, 7))

    state0 = _init_state(obs, alpha, calib)
    free = jnp.ones((nd, 4))
    if fixed_z is not None:
        state0 = state0.at[:, 2].set(fixed_z)
        free = free.at[:, 2].set(0.0)

    def residual(state):
        return (_observe(state, dims_hwl, kpt_idx, calib) - obs) \
            * obs_weights                                   # [N, 7]

    eye4 = jnp.eye(4)
    # Trust region: per-iteration update bound (m, m, m, rad).  When
    # truncation weighting zeroes several observations the normal matrix
    # can go near-singular along the unobserved directions; an unbounded
    # GN step then catapults the state (observed: 1e15 m positions).
    # Over ``iters`` iterations the bound still allows tens of metres of
    # total travel, so well-posed solves are unaffected.
    max_step = jnp.array([3.0, 1.5, 5.0, 0.5])

    def step(_, state):
        r = residual(state)                                 # [N, 7]
        # Jacobian via 4 batched JVPs: column k = d r / d state_k.
        cols = []
        for k in range(4):
            tangent = jnp.broadcast_to(eye4[k], state.shape)
            _, jc = jax.jvp(residual, (state,), (tangent,))
            cols.append(jc)                                 # [N, 7]
        j = jnp.stack(cols, axis=-1)                        # [N, 7, 4]
        j = j * free[:, None, :]
        # Levenberg–Marquardt normal equations: damping scaled by
        # diag(JtJ) makes the step size scale-invariant and shrinks it
        # along poorly-observed directions; the absolute ``damping * I``
        # floor keeps the system SPD when a diagonal entry is ~0.  Frozen
        # dims get a unit diagonal.
        jtj = jnp.einsum("nik,nil->nkl", j, j)
        diag = jnp.einsum("nii->ni", jtj)                   # [N, 4]
        jtj = jtj + (damping * (1.0 + diag))[:, :, None] * eye4 \
            + eye4 * (1.0 - free)[:, None, :]
        jtr = jnp.einsum("nik,ni->nk", j, r)
        delta = _solve_spd4(jtj, jtr)
        delta = jnp.clip(delta, -max_step, max_step)
        new = state - delta * free
        # Keep depth physical: z <= ~0 breaks the projection (divide by z)
        # and poisons every subsequent iteration with non-finite values.
        return new.at[:, 2].set(jnp.maximum(new[:, 2], 0.5))

    state = jax.lax.fori_loop(0, iters, step, state0)
    r = residual(state)
    return SolveResult(position=state[:, :3], theta=state[:, 3],
                       residual=jnp.sqrt(jnp.mean(r ** 2, axis=-1)))


def solve_pose(obs: jnp.ndarray, dims_hwl: jnp.ndarray, alpha: jnp.ndarray,
               kpt_idx: jnp.ndarray, calib: StereoCalib,
               obs_weights: jnp.ndarray | None = None,
               iters: int = 30, damping: float = 1e-3,
               fixed_z: jnp.ndarray | None = None) -> SolveResult:
    """Single-detection convenience wrapper over :func:`solve_batch`."""
    res = solve_batch(
        obs[None], dims_hwl[None], jnp.asarray(alpha)[None],
        jnp.asarray(kpt_idx)[None], calib,
        obs_weights=None if obs_weights is None else obs_weights[None],
        iters=iters, damping=damping,
        fixed_z=None if fixed_z is None else jnp.asarray(fixed_z)[None])
    return SolveResult(position=res.position[0], theta=res.theta[0],
                       residual=res.residual[0])


def observations_from_detection(box_left: jnp.ndarray, box_right: jnp.ndarray,
                                kpt_u: jnp.ndarray) -> jnp.ndarray:
    """Pack network outputs into the solver's [.., 7] observation vector."""
    return jnp.stack([
        box_left[..., 0], box_left[..., 1], box_left[..., 2],
        box_left[..., 3], box_right[..., 0], box_right[..., 2], kpt_u,
    ], axis=-1)
