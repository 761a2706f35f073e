"""Dense left-right photometric alignment for sub-pixel depth refinement.

Behavioral reference: ``lib/model/dense_align/dense_align.py`` —
``align_parallel``: for each detection, enumerate candidate object depths
around the solver's z, warp the central region of the left box into the
right image via per-pixel disparity, and pick the depth minimising the mean
absolute photometric error (coarse then fine sweep).  The reference batches
over candidates but loops over objects in Python; here the WHOLE sweep —
all images x detections x candidates x pixels — is ONE jit region
(SURVEY.md §3.5).

TPU design — gather-free sampling on the MXU:
  Random-access bilinear gathers are the worst op class on TPU (the first
  implementation spent ~1 s/batch in 73M gathers).  All image sampling here
  is expressed as matrix products with LINEAR-INTERPOLATION "HAT" weight
  matrices instead:

    sample(img, pos) = W_v @ img @ W_u^T,   W[k, i] = max(0, 1 - |i - pos_k|)

  which XLA maps straight onto the MXU.  Three stages:
    1. left reference patch  L[v, j]  = Rv @ left  @ Cu_left^T
    2. right STRIP           T[v, k]  = Rv @ right @ Cu_strip^T  (a dense
       1-px-ish horizontal resampling covering every candidate disparity)
    3. candidate warps       S[c,v,j] = T @ Hat(strip-index(c, j))^T
  so each full-image pixel is touched once (stage 1-2) and the per-candidate
  work (stage 3) reads only the tiny strip.

Geometry: box faces are vertical planes, so the visible-surface depth is
constant in v and piecewise-smooth in u; each sampled column is ray-cast
against the solved box in bird's-eye view (exact near-intersection) to get
the per-column depth offset; a candidate depth rigidly shifts that profile.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from stereo_rcnn_tpu.config import SolverConfig
from stereo_rcnn_tpu.geometry.calib import StereoCalib

# Strip width: horizontal resampling resolution for stage 2.  Must keep the
# strip spacing around ~1 px for the biggest (box span + disparity range);
# 256 covers KITTI-sized boxes at working resolution.
STRIP_SIZE = 256


class AlignResult(NamedTuple):
    z: jnp.ndarray        # [..] refined depth
    error: jnp.ndarray    # [..] photometric error at the optimum


def _hat(positions: jnp.ndarray, size: int) -> jnp.ndarray:
    """Linear-interpolation weight rows: [..., size] with
    ``w[i] = max(0, 1 - |i - pos|)`` (clamped to the valid range, so edge
    samples clamp like the gather version's clip)."""
    pos = jnp.clip(positions, 0.0, size - 1.0)
    iota = jnp.arange(size, dtype=positions.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(iota - pos[..., None]))


def _visible_depth_profile(us: jnp.ndarray, position: jnp.ndarray,
                           dims_hwl: jnp.ndarray, theta: jnp.ndarray,
                           calib: StereoCalib) -> jnp.ndarray:
    """Depth z(u) [B, D, W] of the VISIBLE box surface per sampled column,
    by exact ray-rectangle intersection in bird's-eye view.  Columns whose
    ray misses the rectangle fall back to the center depth."""
    x = position[..., 0:1]
    z = position[..., 2:3]
    w_half = dims_hwl[..., 1:2] / 2
    l_half = dims_hwl[..., 2:3] / 2
    # Viewing ray for column u (left camera): X(t) = s*t - tx2, Z(t) = t.
    s = (us - calib.cu) / calib.f
    c = jnp.cos(theta)[..., None]
    si = jnp.sin(theta)[..., None]
    o_x = -calib.tx2 - x
    o_z = -z
    a1 = c * s - si
    b1 = c * o_x - si * o_z
    a2 = si * s + c
    b2 = si * o_x + c * o_z

    def slab(a, b, half):
        big = 1e9
        tiny = jnp.abs(a) < 1e-9
        safe_a = jnp.where(tiny, 1.0, a)
        t1 = (-half - b) / safe_a
        t2 = (half - b) / safe_a
        lo = jnp.minimum(t1, t2)
        hi = jnp.maximum(t1, t2)
        inside = jnp.abs(b) <= half
        lo = jnp.where(tiny, jnp.where(inside, -big, big), lo)
        hi = jnp.where(tiny, jnp.where(inside, big, -big), hi)
        return lo, hi

    lo1, hi1 = slab(a1, b1, l_half)
    lo2, hi2 = slab(a2, b2, w_half)
    t_enter = jnp.maximum(lo1, lo2)
    t_exit = jnp.minimum(hi1, hi2)
    hit = (t_enter <= t_exit) & (t_enter > 0.1)
    return jnp.where(hit, t_enter, z)


def align_batch(left_gray: jnp.ndarray, right_gray: jnp.ndarray,
                box_left: jnp.ndarray, border_u: jnp.ndarray,
                position: jnp.ndarray, theta: jnp.ndarray,
                dims_hwl: jnp.ndarray, calib: StereoCalib,
                cfg: SolverConfig, valid: jnp.ndarray) -> AlignResult:
    """Refine depths for [B, D] detections (or [D] with 2-D images).

    Args:
      left_gray/right_gray: [B, H, W] intensity images ([H, W] accepted,
        treated as B=1).
      box_left: [B, D, 4]; border_u: [B, D, 2] visible-boundary keypoints;
      position [B, D, 3] / theta [B, D] / dims_hwl [B, D, 3]: solved pose;
      valid: [B, D] bool — invalid detections return z unchanged.
    """
    squeeze = left_gray.ndim == 2
    if squeeze:
        left_gray = left_gray[None]
        right_gray = right_gray[None]
        box_left, border_u, position, theta, dims_hwl, valid = (
            a[None] for a in (box_left, border_u, position, theta, dims_hwl,
                              valid))
    b, im_h, im_w = left_gray.shape
    d = box_left.shape[1]
    gh, gw = cfg.align_grid_h, cfg.align_grid_w

    z0 = position[..., 2]                                    # [B, D]

    # Sample grid: visible span (between boundary keypoints, intersected
    # with the box) x lower half of the box (car body, not glass/background
    # — the reference's region choice).
    b_lo = jnp.minimum(border_u[..., 0], border_u[..., 1])
    b_hi = jnp.maximum(border_u[..., 0], border_u[..., 1])
    u_lo = jnp.maximum(box_left[..., 0], b_lo)
    u_hi = jnp.minimum(box_left[..., 2], b_hi)
    u_lo, u_hi = jnp.minimum(u_lo, u_hi), jnp.maximum(u_lo, u_hi)
    v_lo = 0.5 * (box_left[..., 1] + box_left[..., 3])
    v_hi = box_left[..., 3]
    degenerate = (u_hi - u_lo) < 2.0

    gu = (jnp.arange(gw) + 0.5) / gw
    gv = (jnp.arange(gh) + 0.5) / gh
    us = u_lo[..., None] + gu * (u_hi - u_lo)[..., None]     # [B, D, gw]
    vs = v_lo[..., None] + gv * (v_hi - v_lo)[..., None]     # [B, D, gh]

    dz = _visible_depth_profile(us, position, dims_hwl, theta,
                                calib) - z0[..., None]       # [B, D, gw]
    fb = calib.f * calib.baseline

    # ---- stage 1+2: one-touch image resampling on the MXU ----
    rv = _hat(vs, im_h)                                      # [B, D, gh, H]
    # Left reference patch: Rv @ left @ CuL^T.
    rows_l = jnp.einsum("bdvh,bhw->bdvw", rv, left_gray,
                        preferred_element_type=jnp.float32)  # [B, D, gh, W]
    cu_l = _hat(us, im_w)                                    # [B, D, gw, W]
    ref = jnp.einsum("bdvw,bdjw->bdvj", rows_l, cu_l,
                     preferred_element_type=jnp.float32)     # [B, D, gh, gw]

    # Right strip covering every candidate disparity.
    span = cfg.align_coarse_range + cfg.align_fine_range
    z_min = jnp.maximum(z0 - span + dz.min(-1), 0.5)
    z_max = jnp.maximum(z0 + span + dz.max(-1), 0.6)
    d_hi = fb / z_min                                        # [B, D]
    d_lo = fb / z_max
    strip_lo = u_lo - d_hi
    strip_hi = u_hi - d_lo + 1.0
    strip_step = (strip_hi - strip_lo) / STRIP_SIZE          # [B, D]
    u_strip = strip_lo[..., None] + (jnp.arange(STRIP_SIZE) + 0.5) \
        * strip_step[..., None]                              # [B, D, S]
    rows_r = jnp.einsum("bdvh,bhw->bdvw", rv, right_gray,
                        preferred_element_type=jnp.float32)
    cu_s = _hat(u_strip, im_w)                               # [B, D, S, W]
    strip = jnp.einsum("bdvw,bdkw->bdvk", rows_r, cu_s,
                       preferred_element_type=jnp.float32)   # [B, D, gh, S]

    # ---- stage 3: candidate sweeps read only the strip ----
    def sweep(centers: jnp.ndarray, offsets: jnp.ndarray):
        cand = centers[..., None] + offsets                  # [B, D, C]
        z_cols = cand[..., None] + dz[..., None, :]          # [B, D, C, gw]
        disp = fb / jnp.maximum(z_cols, 0.5)
        u_r = us[..., None, :] - disp                        # [B, D, C, gw]
        idx = (u_r - strip_lo[..., None, None]) \
            / strip_step[..., None, None] - 0.5              # strip coords
        wc = _hat(idx, STRIP_SIZE)                           # [B,D,C,gw,S]
        warped = jnp.einsum("bdvk,bdcjk->bdcvj", strip, wc,
                            preferred_element_type=jnp.float32)
        err = jnp.abs(warped - ref[:, :, None]).mean((-1, -2))  # [B, D, C]
        best = jnp.argmin(err, axis=-1)
        return (jnp.take_along_axis(cand, best[..., None], -1)[..., 0],
                jnp.take_along_axis(err, best[..., None], -1)[..., 0])

    coarse = jnp.linspace(-cfg.align_coarse_range, cfg.align_coarse_range,
                          cfg.align_coarse_candidates)
    z1, _ = sweep(z0, coarse)
    fine = jnp.linspace(-cfg.align_fine_range, cfg.align_fine_range,
                        cfg.align_fine_candidates)
    z2, err2 = sweep(z1, fine)

    ok = valid & ~degenerate & (z0 > 0.5)
    z_out = jnp.where(ok, z2, z0)
    err_out = jnp.where(ok, err2, jnp.inf)
    if squeeze:
        return AlignResult(z=z_out[0], error=err_out[0])
    return AlignResult(z=z_out, error=err_out)


def align_depth(left_gray, right_gray, box_left, border_u, position, theta,
                dims_hwl, calib: StereoCalib, cfg: SolverConfig,
                valid) -> AlignResult:
    """Single-detection convenience wrapper over :func:`align_batch`."""
    res = align_batch(left_gray, right_gray, box_left[None], border_u[None],
                      position[None], jnp.asarray(theta)[None],
                      dims_hwl[None], calib, cfg,
                      jnp.asarray(valid)[None])
    return AlignResult(z=res.z[0], error=res.error[0])
