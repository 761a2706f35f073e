"""RoIPool (max-pool RoI pooling) — provided for reference parity.

Behavioral reference: ``lib/model/csrc/cuda/ROIPool_cuda.cu`` +
``lib/model/roi_layers/roi_pool.py``.  NOTE: the stereo pipeline never uses
RoIPool (SURVEY.md §2.1: "built but unused"); RoIAlign is the production
pooling.  It exists here so faster-rcnn-lineage configs port 1:1.

Implementation: same sampled-grid machinery as RoIAlign (dense bilinear
taps are replaced by nearest-cell taps and the bin mean by a bin max),
reusing the atlas trick would be overkill for an unused op — a single-level
gather formulation is fine.
"""

from __future__ import annotations

import jax.numpy as jnp


def roi_pool(feat: jnp.ndarray, rois: jnp.ndarray, output_size: int,
             spatial_scale: float, samples_per_bin: int = 4) -> jnp.ndarray:
    """Max-pool RoI pooling on one feature map.

    Args:
      feat: [H, W, C].
      rois: [R, 4] xyxy in image coordinates.
      output_size: P — output [R, P, P, C].
      samples_per_bin: S — each bin takes the max over an S x S grid of
        nearest-cell taps (S>=bin size in cells recovers exact max-pool).
    """
    h, w = feat.shape[:2]
    p, s = output_size, samples_per_bin
    scaled = rois * spatial_scale
    x1, y1 = scaled[:, 0], scaled[:, 1]
    roi_w = jnp.maximum(scaled[:, 2] - x1, 1.0)
    roi_h = jnp.maximum(scaled[:, 3] - y1, 1.0)

    grid = (jnp.arange(p * s, dtype=jnp.float32) + 0.5) / s
    ys = y1[:, None] + grid * (roi_h / p)[:, None]          # [R, PS]
    xs = x1[:, None] + grid * (roi_w / p)[:, None]
    yi = jnp.clip(jnp.round(ys - 0.5), 0, h - 1).astype(jnp.int32)
    xi = jnp.clip(jnp.round(xs - 0.5), 0, w - 1).astype(jnp.int32)

    taps = feat[yi[:, :, None], xi[:, None, :]]             # [R, PS, PS, C]
    r = rois.shape[0]
    c = feat.shape[-1]
    taps = taps.reshape(r, p, s, p, s, c)
    return taps.max(axis=(2, 4))
