"""GroupNorm -> calibrated frozen-affine conversion
(convert/norm_calibrate.py).

With a SINGLE calibration image the captured expectations are that
image's own per-sample statistics (law of total variance degenerates:
Var[mu] = 0), so the calibrated affine program must reproduce the exact
GroupNorm program on that image to numerical precision.  This pins the
folding formula; tools/calibrate_norm.py separately gates the
expectation-vs-per-sample approximation on held-out detections.
"""

import dataclasses

import jax
import numpy as np
import pytest

from stereo_rcnn_tpu.convert.norm_calibrate import (calibrate,
                                                    fold_group_norms)
from stereo_rcnn_tpu.models import build_model
from stereo_rcnn_tpu.models.detector import StereoRCNN


@pytest.fixture(scope="module")
def calibrated(tiny_cfg_f32, tiny_params):
    h, w = tiny_cfg_f32.data.image_h, tiny_cfg_f32.data.image_w
    img = np.random.RandomState(3).rand(1, h, w, 3).astype(np.float32) * 255
    cfg_aff, params_aff = calibrate(tiny_cfg_f32, tiny_params, [(img, img)])
    return img, cfg_aff, params_aff


def test_single_image_calibration_is_exact(tiny_cfg_f32, tiny_params,
                                           calibrated):
    img, cfg_aff, params_aff = calibrated
    assert cfg_aff.backbone.norm == "frozen"
    feats_gn = build_model(tiny_cfg_f32).apply(
        tiny_params, img, method=StereoRCNN.backbone)
    feats_aff = build_model(cfg_aff).apply(
        params_aff, img, method=StereoRCNN.backbone)
    for lvl, (a, b) in enumerate(zip(feats_gn, feats_aff)):
        err = float(np.max(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32))))
        scale = float(np.max(np.abs(np.asarray(a, np.float32)))) + 1e-6
        assert err / scale < 5e-5, (lvl, err, scale)


def test_calibrated_tree_matches_frozen_init(tiny_cfg_f32, calibrated):
    # The export must restore into the frozen-mode init template
    # (bench.py's restore path) — identical structure, shapes, dtypes.
    from stereo_rcnn_tpu.models import init_params
    _, cfg_aff, params_aff = calibrated
    tmpl = init_params(cfg_aff, jax.random.PRNGKey(1))
    ta = jax.tree_util.tree_structure(params_aff)
    tb = jax.tree_util.tree_structure(tmpl)
    assert ta == tb
    for pa, pb in zip(jax.tree_util.tree_leaves(params_aff),
                      jax.tree_util.tree_leaves(tmpl)):
        assert pa.shape == pb.shape and pa.dtype == pb.dtype


def test_fold_requires_stats_for_every_site(tiny_cfg_f32, tiny_params):
    from stereo_rcnn_tpu.models import init_params
    cfg_aff = dataclasses.replace(
        tiny_cfg_f32,
        backbone=dataclasses.replace(tiny_cfg_f32.backbone, norm="frozen"))
    tmpl = init_params(cfg_aff, jax.random.PRNGKey(0))
    with pytest.raises(KeyError):
        fold_group_norms(tiny_params["params"], {}, tmpl["params"])
