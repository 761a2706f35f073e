"""Dense left-right photometric alignment for sub-pixel depth refinement.

Behavioral reference: ``lib/model/dense_align/dense_align.py`` —
``align_parallel``: for each detection, enumerate candidate object depths
around the solver's z, warp the central region of the left box into the
right image via per-pixel disparity, and pick the depth minimising the
summed absolute photometric error (coarse 0.5 m then fine sweep).  The
reference batches over candidates but loops over objects in Python; here
the WHOLE sweep is one jit region vectorised over
(objects x candidates x pixels) with masked valid regions (SURVEY.md §3.5).

Geometry: box faces are vertical planes, so inverse depth (and therefore
disparity) is LINEAR in u along each face and constant in v.  We evaluate
the depth of the three visible vertical edges (left boundary, perspective
keypoint, right boundary) from the solved pose and interpolate z(u)
piecewise-linearly between them; a candidate depth shifts the whole profile.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from stereo_rcnn_tpu.config import SolverConfig
from stereo_rcnn_tpu.geometry.calib import StereoCalib


class AlignResult(NamedTuple):
    z: jnp.ndarray        # [...] refined depth
    error: jnp.ndarray    # [...] photometric error at the optimum


def _bilinear_intensity(img: jnp.ndarray, u: jnp.ndarray,
                        v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of a single-channel image [H, W] at (u, v)."""
    h, w = img.shape
    u = jnp.clip(u, 0.0, w - 1.001)
    v = jnp.clip(v, 0.0, h - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = u - u0
    dv = v - v0
    i00 = img[v0, u0]
    i01 = img[v0, u0 + 1]
    i10 = img[v0 + 1, u0]
    i11 = img[v0 + 1, u0 + 1]
    return (i00 * (1 - du) * (1 - dv) + i01 * du * (1 - dv) +
            i10 * (1 - du) * dv + i11 * du * dv)


def _visible_depth_profile(us: jnp.ndarray, position: jnp.ndarray,
                           dims_hwl: jnp.ndarray, theta: jnp.ndarray,
                           calib: StereoCalib) -> jnp.ndarray:
    """Depth z(u) of the VISIBLE box surface per image column, by exact
    ray-rectangle intersection in bird's-eye view.

    Box faces are vertical, so each column's viewing ray hits the box at a
    single depth (the near intersection with the BEV rectangle).  This is
    what the left image actually shows — the reference approximates the same
    profile from the keypoint/boundary edges; ray casting is exact and just
    as vectorisable.  Columns whose ray misses the rectangle fall back to
    the center depth.
    """
    x, z = position[0], position[2]
    h, w, l = dims_hwl[0], dims_hwl[1], dims_hwl[2]
    # Viewing ray for column u (left camera): X(t) = s*t - tx2, Z(t) = t,
    # with s = (u - cu)/f  (since u = cu + f*(X + tx2)/Z).
    s = (us - calib.cu) / calib.f
    c, si = jnp.cos(theta), jnp.sin(theta)
    # Box-frame BEV coords of a camera point (X, Z):
    #   xo = c*(X - x) - si*(Z - z)   (length axis, half-extent l/2)
    #   zo = si*(X - x) + c*(Z - z)   (width axis, half-extent w/2)
    o_x, o_z = -calib.tx2 - x, -z                  # ray origin minus center
    a1 = c * s - si
    b1 = c * o_x - si * o_z
    a2 = si * s + c
    b2 = si * o_x + c * o_z

    def slab(a, b, half):
        """t-interval where |a*t + b| <= half."""
        big = 1e9
        safe_a = jnp.where(jnp.abs(a) < 1e-9, 1.0, a)
        t1 = (-half - b) / safe_a
        t2 = (half - b) / safe_a
        lo = jnp.minimum(t1, t2)
        hi = jnp.maximum(t1, t2)
        inside = jnp.abs(b) <= half
        lo = jnp.where(jnp.abs(a) < 1e-9, jnp.where(inside, -big, big), lo)
        hi = jnp.where(jnp.abs(a) < 1e-9, jnp.where(inside, big, -big), hi)
        return lo, hi

    lo1, hi1 = slab(a1, b1, l / 2)
    lo2, hi2 = slab(a2, b2, w / 2)
    t_enter = jnp.maximum(lo1, lo2)
    t_exit = jnp.minimum(hi1, hi2)
    hit = (t_enter <= t_exit) & (t_enter > 0.1)
    return jnp.where(hit, t_enter, z)


def align_depth(left_gray: jnp.ndarray, right_gray: jnp.ndarray,
                box_left: jnp.ndarray, border_u: jnp.ndarray,
                position: jnp.ndarray, theta: jnp.ndarray,
                dims_hwl: jnp.ndarray, calib: StereoCalib,
                cfg: SolverConfig, valid: jnp.ndarray) -> AlignResult:
    """Refine one detection's depth; vmap over detections.

    Args:
      left_gray/right_gray: [H, W] intensity images (same scale as boxes).
      box_left: [4] detection's left box.
      border_u: [2] visible-boundary keypoints (horizontal extent of the
        region actually on the object — excludes truncated/occluded parts).
      position/theta/dims_hwl: initial solved pose.
      valid: scalar bool — invalid detections return z unchanged.
    """
    z0 = position[2]

    # Sample grid over the visible span x lower half of the box (the
    # reference uses the region between boundary kpts, lower part of the
    # box, where the car body — not windows/background — dominates).
    u_lo = jnp.maximum(box_left[0], jnp.minimum(border_u[0], border_u[1]))
    u_hi = jnp.minimum(box_left[2], jnp.maximum(border_u[0], border_u[1]))
    u_lo, u_hi = jnp.minimum(u_lo, u_hi), jnp.maximum(u_lo, u_hi)
    v_lo = 0.5 * (box_left[1] + box_left[3])
    v_hi = box_left[3]

    gu = (jnp.arange(cfg.align_grid_w) + 0.5) / cfg.align_grid_w
    gv = (jnp.arange(cfg.align_grid_h) + 0.5) / cfg.align_grid_h
    us = u_lo + gu * (u_hi - u_lo)                        # [W]
    vs = v_lo + gv * (v_hi - v_lo)                        # [H]
    uu = jnp.broadcast_to(us[None, :], (cfg.align_grid_h, cfg.align_grid_w))
    vv = jnp.broadcast_to(vs[:, None], (cfg.align_grid_h, cfg.align_grid_w))
    degenerate = (u_hi - u_lo) < 2.0

    ref = _bilinear_intensity(left_gray, uu, vv)          # [H, W]

    dz = _visible_depth_profile(us, position, dims_hwl, theta,
                                calib) - z0               # [W] per-column

    def sweep(z_center: jnp.ndarray, candidates: jnp.ndarray):
        """candidates: [C] absolute depths.  Returns (best_z, best_err)."""
        z_cols = candidates[:, None] + dz[None, :]        # [C, W]
        disp = calib.f * calib.baseline / jnp.maximum(z_cols, 0.5)
        u_r = uu[None, :, :] - disp[:, None, :]           # [C, H, W]
        warped = _bilinear_intensity(
            right_gray, u_r, jnp.broadcast_to(vv, u_r.shape))
        err = jnp.abs(warped - ref[None]).mean(axis=(1, 2))  # [C]
        best = jnp.argmin(err)
        return candidates[best], err[best]

    coarse = z0 + jnp.linspace(-cfg.align_coarse_range, cfg.align_coarse_range,
                               cfg.align_coarse_candidates)
    z1, _ = sweep(z0, coarse)
    fine = z1 + jnp.linspace(-cfg.align_fine_range, cfg.align_fine_range,
                             cfg.align_fine_candidates)
    z2, err2 = sweep(z1, fine)

    ok = valid & ~degenerate & (z0 > 0.5)
    return AlignResult(z=jnp.where(ok, z2, z0),
                       error=jnp.where(ok, err2, jnp.inf))


def align_batch(left_gray, right_gray, box_left, border_u, position, theta,
                dims_hwl, calib: StereoCalib, cfg: SolverConfig,
                valid) -> AlignResult:
    """Vmap over [D] detections of one image pair."""
    fn = functools.partial(align_depth, calib=calib, cfg=cfg)
    return jax.vmap(
        lambda bl, bu, p, t, d, v: fn(left_gray, right_gray, bl, bu, p, t,
                                      d, valid=v)
    )(box_left, border_u, position, theta, dims_hwl, valid)
