"""Ahead-of-time model export for deployment (StableHLO via ``jax.export``).

The reference has no serving story at all — ``demo.py`` / ``test_net.py``
rebuild the torch module graph and reload the ``.pth`` in every process
(SURVEY.md §3.1/§3.3).  TPU-native replacement: serialize the ENTIRE
jit-compiled pipeline (network + NMS + batched 3D solver + dense
alignment) as one portable StableHLO artifact.  A serving process then
needs jax + this file's ``load_pipeline`` — none of the model-building
code, no config, no checkpoint restore logic — and the artifact is
guarded by jax.export's calling-convention versioning.

Weights stay a CALL argument (not baked into the graph): one artifact
serves every checkpoint with the same parameter tree, and the server can
hot-swap weights without re-exporting.  Calibration is also a runtime
argument, batched per image, matching ``make_full_pipeline``'s eval path.
"""

from __future__ import annotations

import json
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from stereo_rcnn_tpu.config import Config
from stereo_rcnn_tpu.geometry.calib import StereoCalib
from stereo_rcnn_tpu.inference import (Detections3D, broadcast_calib,
                                       make_full_pipeline)
from stereo_rcnn_tpu.models.detector import Detections

_MANIFEST_KEY = "stereo_rcnn_tpu.manifest"

# jax.export serializes the in/out PyTreeDefs; our NamedTuple pytrees must
# be registered by a STABLE name (the class path) so an artifact written by
# one build loads in another.  Registration is process-global — tolerate
# re-import.
for _nt in (StereoCalib, Detections, Detections3D):
    try:
        jax_export.register_namedtuple_serialization(
            _nt, serialized_name=f"{_nt.__module__}.{_nt.__name__}")
    except ValueError:
        pass


class ExportedPipeline(NamedTuple):
    """A deserialized artifact ready to call."""

    exported: "jax_export.Exported"
    manifest: dict

    def __call__(self, params, images_left, images_right, calib_batch,
                 content_wh=None):
        if content_wh is None:
            b = images_left.shape[0]
            h, w = self.manifest["image_hw"]
            content_wh = jnp.broadcast_to(
                jnp.asarray([w, h], jnp.float32), (b, 2))
        return self.exported.call(params, images_left, images_right,
                                  calib_batch, content_wh)


def _abstract(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        tree)


def export_pipeline(cfg: Config, params, batch: int,
                    platforms: Sequence[str] = ("tpu",)) -> bytes:
    """Serialize the full inference pipeline to a portable blob.

    ``params`` supplies the parameter-tree STRUCTURE (shapes/dtypes only;
    values are never traced into the artifact).  The exported function is
    ``(params, left [B,H,W,3], right [B,H,W,3], calib_batch,
    content_wh [B,2]) -> Detections3D`` with static batch ``B`` (fixed
    shapes are the TPU contract everywhere in this framework).
    ``content_wh`` is the letterboxed content extent per image (in working
    -resolution pixels) used for truncation gating in the 3D solver — pass
    ``[[W, H]] * B`` when images fill the canvas.
    """
    h, w = cfg.data.image_h, cfg.data.image_w
    pipe = make_full_pipeline(cfg)

    def fn(params, images_left, images_right, calib_batch, content_wh):
        return pipe(params, images_left, images_right, calib_batch,
                    content_wh)

    imgs = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
    cwh = jax.ShapeDtypeStruct((batch, 2), jnp.float32)
    calib = _abstract(broadcast_calib(_dummy_calib(), batch))
    exported = jax_export.export(jax.jit(fn), platforms=tuple(platforms))(
        _abstract(params), imgs, imgs, calib, cwh)
    manifest = json.dumps({
        "format": _MANIFEST_KEY,
        "batch": batch,
        "image_hw": [h, w],
        "platforms": list(platforms),
        "num_params": sum(int(np.prod(s.shape))
                          for s in jax.tree.leaves(_abstract(params))),
    }).encode()
    blob = bytes(exported.serialize())
    # Self-describing container: [manifest_len u32 LE][manifest][stablehlo]
    return len(manifest).to_bytes(4, "little") + manifest + blob


def load_pipeline(blob: bytes) -> ExportedPipeline:
    """Deserialize a blob from :func:`export_pipeline`."""
    n = int.from_bytes(blob[:4], "little")
    manifest = json.loads(blob[4:4 + n].decode())
    if manifest.get("format") != _MANIFEST_KEY:
        raise ValueError("not a stereo_rcnn_tpu export artifact")
    return ExportedPipeline(jax_export.deserialize(bytearray(blob[4 + n:])),
                            manifest)


def _dummy_calib() -> StereoCalib:
    """Shape/dtype donor for the calib argument (values irrelevant)."""
    return StereoCalib(
        f=np.float32(720.0), cu=np.float32(600.0), cv=np.float32(180.0),
        baseline=np.float32(0.54), tx2=np.float32(0.0),
        p2=np.zeros((3, 4), np.float32), p3=np.zeros((3, 4), np.float32))
