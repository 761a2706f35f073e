"""PyTorch ResNet state_dict -> flax backbone params converter.

Behavioral reference: the reference loads ``data/pretrained_model/
resnet101_caffe.pth`` and the released detector checkpoint via
``load_state_dict`` (SURVEY.md §2.2 Backbone row, §5 Checkpoint row: "a
one-shot converter from the released .pth (state-dict name mapping,
NCHW->NHWC / OIHW->HWIO transposes) — required for parity testing").

Handles the torchvision/caffe ResNet naming scheme:
    conv1.weight, bn1.{weight,bias,running_mean,running_var},
    layerL.B.convK.weight, layerL.B.bnK.*, layerL.B.downsample.{0,1}.*
BatchNorm is folded into FrozenBatchNorm constants:
    scale = gamma / sqrt(var + eps),  bias = beta - mean * scale.

Input is a plain ``{name: np.ndarray}`` dict, so no torch import is needed
here (callers do ``{k: v.numpy() for k, v in torch.load(p).items()}``).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

BN_EPS = 1e-5


def _fold_bn(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    gamma = np.asarray(sd[f"{prefix}.weight"], np.float32)
    beta = np.asarray(sd[f"{prefix}.bias"], np.float32)
    mean = np.asarray(sd[f"{prefix}.running_mean"], np.float32)
    var = np.asarray(sd[f"{prefix}.running_var"], np.float32)
    scale = gamma / np.sqrt(var + BN_EPS)
    return {"scale": scale, "bias": beta - mean * scale}


def _conv(sd: Mapping[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    # torch OIHW -> flax HWIO.
    w = np.asarray(sd[name], np.float32).transpose(2, 3, 1, 0)
    return {"kernel": w}


def import_resnet_backbone(state_dict: Mapping[str, np.ndarray],
                           depth: int = 101) -> Dict:
    """Convert a torch ResNet state_dict (numpy values) to the param tree of
    :class:`stereo_rcnn_tpu.models.resnet_fpn.ResNetFPN` (backbone stages
    only — FPN layers are left to their fresh initialisation unless the
    state_dict also carries them)."""
    from stereo_rcnn_tpu.models.resnet_fpn import STAGE_BLOCKS
    blocks = STAGE_BLOCKS[depth]
    params: Dict = {
        "conv1": _conv(state_dict, "conv1.weight"),
        "bn1": _fold_bn(state_dict, "bn1"),
    }
    for stage, n_blocks in enumerate(blocks, start=1):
        for b in range(n_blocks):
            t = f"layer{stage}.{b}"
            ours: Dict = {}
            for k in (1, 2, 3):
                ours[f"conv{k}"] = _conv(state_dict, f"{t}.conv{k}.weight")
                ours[f"bn{k}"] = _fold_bn(state_dict, f"{t}.bn{k}")
            if f"{t}.downsample.0.weight" in state_dict:
                ours["downsample_conv"] = _conv(state_dict,
                                                f"{t}.downsample.0.weight")
                ours["downsample_bn"] = _fold_bn(state_dict,
                                                 f"{t}.downsample.1")
            params[f"layer{stage}_{b}"] = ours
    return params


def merge_backbone_params(model_params: Dict, backbone: Dict) -> Dict:
    """Return a copy of a full model param tree with the backbone-stage
    params replaced by converted ones (FPN/head params untouched)."""
    import copy
    out = copy.deepcopy(jax_to_py(model_params))
    tgt = out["params"]["backbone_net"] if "params" in out else \
        out["backbone_net"]
    for k, v in backbone.items():
        tgt[k] = _merge(tgt.get(k, {}), v)
    return out


def _merge(dst, src):
    if isinstance(src, dict):
        dst = dict(dst) if isinstance(dst, dict) else {}
        for k, v in src.items():
            dst[k] = _merge(dst.get(k), v)
        return dst
    return np.asarray(src)


def jax_to_py(tree):
    """Deep-copyable plain-python view of a (possibly frozen) param tree."""
    if isinstance(tree, Mapping):
        return {k: jax_to_py(v) for k, v in tree.items()}
    return tree
