"""RoIAlign for FPN feature pyramids — pure-XLA gather formulation.

Behavioral reference: ``lib/model/csrc/cuda/ROIAlign_cuda.cu`` (+ CPU twin,
wrapped by ``lib/model/roi_layers/roi_align.py``) from the
maskrcnn-benchmark lineage: bilinear sampling on a ``sampling_ratio`` x
``sampling_ratio`` sub-grid per output bin, averaged.  Semantics matched:

  * continuous coordinates, NO half-pixel "aligned" shift (the reference
    kernel uses ``aligned=False``: roi coords scaled by spatial_scale, bin
    grid sampled at ``start + (i + 0.5) * bin / ratio``),
  * empty rois clamp to >= 1px bins,
  * out-of-bounds samples contribute zeros.

TPU design notes: instead of a scalar CUDA thread per output element, we
compute all sample coordinates as dense [R, P, P, S, S] index tensors and use
vectorized gathers from the NHWC feature map; the 4-tap bilinear blend is
plain VPU arithmetic and XLA fuses it with the final mean.  Gradients come
for free via autodiff of the gather (scatter-add in the backward pass).
FPN level routing is done by computing the align on every level and
mask-selecting (no data-dependent control flow) — see
:func:`multilevel_roi_align`.  A Pallas kernel variant lives in
``roi_align_pallas.py``; both are A/B-tested for parity.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _bilinear_gather(feat: jnp.ndarray, y: jnp.ndarray,
                     x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of NHWC-less feature map ``feat`` [H, W, C] at float
    coords y, x of any shape [...].  Returns [..., C].  Out-of-range samples
    (beyond 1px outside, matching the CUDA kernel) return zeros."""
    h, w = feat.shape[0], feat.shape[1]
    oob = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (y - y0.astype(y.dtype))[..., None]
    lx = (x - x0.astype(x.dtype))[..., None]
    hy, hx = 1.0 - ly, 1.0 - lx

    def tap(yy, xx):
        return feat[yy, xx]                     # advanced-index gather

    val = (tap(y0, x0) * hy * hx + tap(y0, x1) * hy * lx +
           tap(y1, x0) * ly * hx + tap(y1, x1) * ly * lx)
    return jnp.where(oob[..., None], 0.0, val)


def roi_align(feat: jnp.ndarray, rois: jnp.ndarray, output_size: int,
              spatial_scale: float, sampling_ratio: int = 2) -> jnp.ndarray:
    """RoIAlign on a single feature map.

    Args:
      feat: [H, W, C] feature map (single image, NHWC without batch).
      rois: [R, 4] boxes in IMAGE coordinates (xyxy).
      output_size: P — output is P x P bins.
      spatial_scale: 1 / stride of this level.
      sampling_ratio: S — samples per bin side.

    Returns: [R, P, P, C].
    """
    p, s = output_size, sampling_ratio
    scaled = rois * spatial_scale
    x1, y1, x2, y2 = (scaled[:, i] for i in range(4))
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / p                                        # [R]
    bin_h = roi_h / p

    # Sample offsets within a roi: grid of (P*S) points per axis.
    # Position of sample j (0..P*S-1): (j + 0.5) / S * bin  (bin-major).
    grid = (jnp.arange(p * s, dtype=feat.dtype) + 0.5) / s   # [P*S] in bins
    ys = y1[:, None] + grid[None, :] * bin_h[:, None]        # [R, P*S]
    xs = x1[:, None] + grid[None, :] * bin_w[:, None]        # [R, P*S]

    yy = ys[:, :, None] * jnp.ones((1, 1, p * s), feat.dtype)
    xx = xs[:, None, :] * jnp.ones((1, p * s, 1), feat.dtype)
    samples = _bilinear_gather(feat, yy, xx)                 # [R, PS, PS, C]

    r = rois.shape[0]
    c = feat.shape[-1]
    samples = samples.reshape(r, p, s, p, s, c)
    return samples.mean(axis=(2, 4))                         # [R, P, P, C]


def fpn_level_assignment(rois: jnp.ndarray, num_levels: int,
                         canonical_scale: float = 224.0,
                         canonical_level: int = 2) -> jnp.ndarray:
    """Per-roi FPN level k = floor(k0 + log2(sqrt(wh) / 224)), clamped to
    [0, num_levels-1] as an offset from P2.  Reference:
    ``stereo_rcnn.py`` level routing (SURVEY.md §2.2 Stereo R-CNN head)."""
    w = jnp.maximum(rois[:, 2] - rois[:, 0], 1e-6)
    h = jnp.maximum(rois[:, 3] - rois[:, 1], 1e-6)
    k = jnp.floor(canonical_level +
                  jnp.log2(jnp.sqrt(w * h) / canonical_scale))
    return jnp.clip(k - canonical_level, 0, num_levels - 1).astype(jnp.int32)


def multilevel_roi_align(feats: Sequence[jnp.ndarray], rois: jnp.ndarray,
                         strides: Sequence[int], output_size: int,
                         sampling_ratio: int = 2) -> jnp.ndarray:
    """RoIAlign over an FPN pyramid with mask-based level routing.

    Each roi is aligned against EVERY level and the right level is selected
    with a `where` — data-independent control flow that XLA can schedule as
    dense batched gathers (the per-level compute is small: R * P^2 * S^2
    taps).  feats: list of [H_l, W_l, C]; rois in image coords.

    Returns: [R, P, P, C].
    """
    levels = fpn_level_assignment(rois, len(feats))
    out = None
    for lvl, (feat, stride) in enumerate(zip(feats, strides)):
        aligned = roi_align(feat, rois, output_size, 1.0 / stride,
                            sampling_ratio)
        sel = (levels == lvl)[:, None, None, None]
        out = jnp.where(sel, aligned, 0.0) if out is None else \
            out + jnp.where(sel, aligned, 0.0)
    return out
