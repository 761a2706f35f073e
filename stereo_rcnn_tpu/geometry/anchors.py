"""FPN anchor generation with static shapes.

Behavioral reference: ``lib/model/rpn/generate_anchors.py`` —
``generate_anchors`` (base anchors per level, three aspect ratios, one scale
per FPN level).  Generated once per image size at trace time (numpy), then
constant-folded by XLA.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from stereo_rcnn_tpu.config import AnchorConfig


def base_anchors(scale: float, ratios: Sequence[float],
                 off: float = 0.0) -> np.ndarray:
    """Anchors centered at (0, 0) with area scale^2 and given aspect ratios
    (ratio = h / w).

    ``off`` is the box-width convention (``Config.box_off``): under the
    legacy inclusive convention (off=1, reference ``generate_anchors.py``)
    a box spanning pixels [x1, x2] has width x2-x1+1, so the half-span is
    (w-off)/2 — this keeps the width the coder measures equal to the
    nominal anchor size under either convention (the coder measuring a
    continuous-convention anchor with off=1 would otherwise see every
    anchor one pixel wider and half a pixel off-center than the
    reference's, shifting all RPN decodes sub-pixel)."""
    out = []
    for r in ratios:
        w = scale / np.sqrt(r)
        h = scale * np.sqrt(r)
        out.append([-(w - off) / 2.0, -(h - off) / 2.0,
                    (w - off) / 2.0, (h - off) / 2.0])
    return np.asarray(out, dtype=np.float32)


def level_shapes(image_h: int, image_w: int,
                 strides: Sequence[int]) -> List[Tuple[int, int]]:
    """(H, W) of each pyramid level for a given padded image size."""
    return [(-(-image_h // s), -(-image_w // s)) for s in strides]


def generate_anchors(cfg: AnchorConfig, image_h: int, image_w: int,
                     off: float = 0.0) -> jnp.ndarray:
    """All anchors over all levels, flattened to ``[A_total, 4]`` xyxy in
    image coordinates, ordered level-major then row-major then ratio —
    matching the flattening order of the RPN head outputs.

    ``off`` (``Config.box_off``): under the legacy inclusive convention
    the cell center sits on the pixel grid — a stride-s cell covers
    pixels [i*s, i*s + s - 1] with center i*s + (s-1)/2 — so the grid
    shifts by off/2 relative to the continuous half-pixel convention."""
    per_level = []
    for stride, scale in zip(cfg.strides, cfg.scales):
        fh, fw = -(-image_h // stride), -(-image_w // stride)
        base = base_anchors(scale, cfg.ratios, off)                # [A, 4]
        sx = np.arange(fw, dtype=np.float32) * stride + (stride - off) / 2.0
        sy = np.arange(fh, dtype=np.float32) * stride + (stride - off) / 2.0
        cx, cy = np.meshgrid(sx, sy)                               # [fh, fw]
        shifts = np.stack([cx, cy, cx, cy], axis=-1)               # [fh, fw, 4]
        anchors = shifts[:, :, None, :] + base[None, None, :, :]
        per_level.append(anchors.reshape(-1, 4))
    return jnp.asarray(np.concatenate(per_level, axis=0))


def anchors_per_level(cfg: AnchorConfig, image_h: int,
                      image_w: int) -> List[int]:
    counts = []
    for stride in cfg.strides:
        fh, fw = -(-image_h // stride), -(-image_w // stride)
        counts.append(fh * fw * cfg.num_anchors_per_cell)
    return counts
