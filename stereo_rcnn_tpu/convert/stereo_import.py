"""Full released-checkpoint converter: reference Stereo R-CNN ``.pth``
state_dict -> our flax parameter tree (EVERY head, not just the backbone).

Behavioral reference: ``lib/model/stereo_rcnn/stereo_rcnn.py`` (head module
names), ``lib/model/stereo_rcnn/resnet.py`` (backbone/FPN module names),
``lib/model/rpn/stereo_rpn.py`` (RPN head names), ``trainval_net.py``
(checkpoint dict layout: ``{'model': state_dict, 'uncert', ...}``).

NOTE ON NAMES: the reference mount was EMPTY when this was written (see
SURVEY.md provenance), so the torch-side names below are the upstream
repo's conventions reconstructed from its faster-rcnn.pytorch/fpn lineage.
Every entry lives in the ``NAME_MAP`` tables; if a real checkpoint uses a
different spelling, ONLY those tables need fixing.  ``import_detector``
accepts unknown keys gracefully and reports exactly what it matched and
what it skipped, so running it against the real ``.pth`` immediately shows
any naming drift.

Layout conversions handled (the substance, independent of naming):
  * Conv2d      OIHW [out, in, kh, kw]   -> HWIO [kh, kw, in, out]
  * Linear      [out, in]                -> [in, out]
  * ConvTranspose2d [in, out, kh, kw]    -> [kh, kw, out, in]
      (our KeypointHead uses flax ConvTranspose(transpose_kernel=True),
       which is numerically identical to torch's k=4/s=2/p=1 deconv)
  * BatchNorm                            -> FrozenBatchNorm (scale, bias)
  * fc6 input permutation: torch flattens pooled features NCHW-style
      (c, h, w) with channels = [left C | right C]; we flatten NHWC-style
      (h, w, 2C).  The fc6 weight columns are permuted accordingly.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

from stereo_rcnn_tpu.convert.resnet_import import _conv, _fold_bn


# ---------------------------------------------------------------------------
# Reference-name tables.  torch prefix -> (flax module path, kind)
# kind: conv | conv_bias | linear | deconv | fc6
# ---------------------------------------------------------------------------

# Backbone stem/stages: the detector checkpoint wraps the resnet stages as
# RCNN_layer0 (conv1+bn1+relu+maxpool) .. RCNN_layer4 (jwyang fpn lineage).
# import_detector also accepts bare torchvision names (conv1, layer1., ...).
BACKBONE_PREFIX_MAP = {
    "RCNN_layer0.0": "conv1",
    "RCNN_layer0.1": "bn1",
    **{f"RCNN_layer{i}": f"layer{i}" for i in (1, 2, 3, 4)},
}

# FPN lateral/smooth convs.  Reference smooth1 operates on P4, smooth3 on
# P2 (top-down order); our names are level-indexed.
FPN_MAP = {
    "RCNN_toplayer": ("backbone_net/fpn_top", "conv_bias"),
    "RCNN_latlayer1": ("backbone_net/fpn_lat4", "conv_bias"),
    "RCNN_latlayer2": ("backbone_net/fpn_lat3", "conv_bias"),
    "RCNN_latlayer3": ("backbone_net/fpn_lat2", "conv_bias"),
    "RCNN_smooth1": ("backbone_net/fpn_smooth4", "conv_bias"),
    "RCNN_smooth2": ("backbone_net/fpn_smooth3", "conv_bias"),
    "RCNN_smooth3": ("backbone_net/fpn_smooth2", "conv_bias"),
}

RPN_MAP = {
    "RCNN_rpn.RPN_Conv": ("rpn_head/rpn_conv", "conv_bias"),
    "RCNN_rpn.RPN_cls_score": ("rpn_head/rpn_cls", "conv_bias"),
    # The stereo 6-tuple box head; upstream sometimes spells it with the
    # left_right suffix — both accepted.
    "RCNN_rpn.RPN_bbox_pred": ("rpn_head/rpn_box", "conv_bias"),
    "RCNN_rpn.RPN_bbox_pred_left_right": ("rpn_head/rpn_box", "conv_bias"),
}

HEAD_MAP = {
    "RCNN_fc6": ("rcnn_head/fc6", "fc6"),
    "RCNN_fc7": ("rcnn_head/fc7", "linear"),
    "RCNN_cls_score": ("rcnn_head/cls_score", "linear"),
    "RCNN_bbox_pred": ("rcnn_head/bbox_pred", "linear"),
    "RCNN_dim_orien_pred": ("rcnn_head/dim_orien_pred", "linear"),
    # Keypoint branch (names uncertain — single place to fix).
    "RCNN_kpts_conv1": ("kpt_head/kpt_conv1", "conv_bias"),
    "RCNN_kpts_conv2": ("kpt_head/kpt_conv2", "conv_bias"),
    "RCNN_kpts_deconv": ("kpt_head/kpt_deconv", "deconv"),
    "RCNN_kpts_score": ("kpt_head/kpt_score", "conv_bias"),
}


def _linear(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    out = {"kernel": np.asarray(sd[f"{prefix}.weight"], np.float32).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return out


def _conv_bias(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    out = _conv(sd, f"{prefix}.weight")
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return out


def _deconv(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    # torch ConvTranspose2d [in, out, kh, kw] -> flax transpose_kernel=True
    # layout [kh, kw, out, in] (verified exact in tests/test_convert.py).
    w = np.asarray(sd[f"{prefix}.weight"], np.float32).transpose(2, 3, 1, 0)
    out = {"kernel": w}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return out


def _fc6(sd: Mapping[str, np.ndarray], prefix: str, pool: int,
         channels: int) -> Dict:
    """fc6 with the NCHW->NHWC flatten-order permutation.

    torch input layout:  [2C, P, P] flattened c-major (c, h, w);
    ours:                [P, P, 2C] flattened h-major (h, w, c).
    """
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)       # [out, 2C*P*P]
    d_out = w.shape[0]
    w = w.reshape(d_out, channels, pool, pool)
    w = w.transpose(0, 2, 3, 1).reshape(d_out, -1)           # (h, w, c)
    out = {"kernel": w.T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return out


def _set_path(tree: Dict, path: str, value: Dict) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def split_backbone_names(sd: Mapping[str, np.ndarray]
                         ) -> Dict[str, np.ndarray]:
    """Rewrite RCNN_layerN-prefixed backbone keys to torchvision-style names
    that :func:`import_resnet_backbone` understands; bare names pass
    through."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        for pref, repl in BACKBONE_PREFIX_MAP.items():
            if k.startswith(pref + "."):
                out[repl + k[len(pref):]] = v
                break
        else:
            if k.startswith(("conv1.", "bn1.", "layer")):
                out[k] = v
    return out


def import_detector(sd: Mapping[str, np.ndarray], depth: int = 101,
                    pool: int = 7, fpn_dim: int = 256
                    ) -> Tuple[Dict, Dict[str, list]]:
    """Convert a FULL reference detector state_dict (numpy values) into a
    partial flax param tree (paths relative to the StereoRCNN module).

    Returns (params, report) where report lists matched torch prefixes and
    state_dict keys that no rule claimed (for auditing name drift against
    the real checkpoint)."""
    from stereo_rcnn_tpu.convert.resnet_import import import_resnet_backbone

    params: Dict = {}
    matched: list = []
    claimed: set = set()

    # Backbone stages.
    bb_sd = split_backbone_names(sd)
    if "conv1.weight" in bb_sd:
        backbone = import_resnet_backbone(bb_sd, depth=depth)
        params["backbone_net"] = backbone
        matched.append("<backbone stages>")
        for k in sd:
            for pref in list(BACKBONE_PREFIX_MAP) + ["conv1", "bn1",
                                                     "layer"]:
                if k.startswith(pref):
                    claimed.add(k)
                    break

    kinds = {
        "conv_bias": _conv_bias,
        "linear": _linear,
        "deconv": _deconv,
    }
    for torch_prefix, (flax_path, kind) in {**FPN_MAP, **RPN_MAP,
                                            **HEAD_MAP}.items():
        if f"{torch_prefix}.weight" not in sd:
            continue
        if kind == "fc6":
            value = _fc6(sd, torch_prefix, pool, 2 * fpn_dim)
        else:
            value = kinds[kind](sd, torch_prefix)
        _set_path(params, flax_path, value)
        matched.append(torch_prefix)
        claimed.add(f"{torch_prefix}.weight")
        claimed.add(f"{torch_prefix}.bias")

    unclaimed = [k for k in sd if k not in claimed]
    return params, {"matched": matched, "unclaimed": unclaimed}


def merge_params(model_params: Dict, converted: Dict) -> Dict:
    """Overlay converted params onto a freshly initialised tree (leaves
    keep their init where the checkpoint had nothing — e.g. a partial
    conversion)."""
    from stereo_rcnn_tpu.convert.resnet_import import _merge, jax_to_py
    import copy
    out = copy.deepcopy(jax_to_py(model_params))
    tgt = out["params"] if "params" in out else out
    for k, v in converted.items():
        tgt[k] = _merge(tgt.get(k, {}), v)
    return out
