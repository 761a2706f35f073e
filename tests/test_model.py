import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_rcnn_tpu.config import tiny_test_config
from stereo_rcnn_tpu.models import init_params, make_inference_fn
from stereo_rcnn_tpu.models.resnet_fpn import ResNetFPN


def test_backbone_shapes():
    model = ResNetFPN(depth=50, dtype=jnp.float32)   # 50 for test speed
    x = jnp.zeros((1, 128, 256, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    strides = (4, 8, 16, 32, 64)
    for f, s in zip(feats, strides):
        assert f.shape == (1, 128 // s, 256 // s, 256), (f.shape, s)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = tiny_test_config().replace(compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_full_inference_shapes(tiny_setup):
    cfg, params = tiny_setup
    fn = jax.jit(make_inference_fn(cfg))
    h, w = cfg.data.image_h, cfg.data.image_w
    key = jax.random.PRNGKey(1)
    left = jax.random.normal(key, (1, h, w, 3)) * 10
    right = jax.random.normal(key, (1, h, w, 3)) * 10
    det = fn(params, left, right)
    d = cfg.rcnn.max_detections
    assert det.box_left.shape == (1, d, 4)
    assert det.box_right.shape == (1, d, 4)
    assert det.dims.shape == (1, d, 3)
    assert det.kpt_u.shape == (1, d)
    assert det.kpt_type.shape == (1, d)
    assert det.valid.shape == (1, d)
    assert np.isfinite(np.asarray(det.score)).all()
    # Right boxes share vertical extent with left boxes (stereo invariant).
    bl, br = np.asarray(det.box_left), np.asarray(det.box_right)
    np.testing.assert_allclose(bl[..., 1], br[..., 1], atol=1e-4)
    np.testing.assert_allclose(bl[..., 3], br[..., 3], atol=1e-4)


def test_inference_batch2(tiny_setup):
    cfg, params = tiny_setup
    fn = jax.jit(make_inference_fn(cfg))
    h, w = cfg.data.image_h, cfg.data.image_w
    imgs = jax.random.normal(jax.random.PRNGKey(2), (2, h, w, 3)) * 10
    det = fn(params, imgs, imgs)
    assert det.box_left.shape[0] == 2


def test_multiclass_config_is_refused_loudly():
    """The postprocess decode is Car-only (class 1 everywhere, matching the
    released reference's scope); a 3-class config must fail LOUDLY at
    trace/build time, never silently score only class 1
    (models/detector.py::postprocess_boxes guard)."""
    import dataclasses

    from stereo_rcnn_tpu.models.detector import postprocess_boxes

    cfg = tiny_test_config()
    cfg3 = cfg.replace(rcnn=dataclasses.replace(cfg.rcnn, num_classes=3))
    with pytest.raises(ValueError, match="Car-only"):
        postprocess_boxes({}, cfg3, cfg.data.image_h, cfg.data.image_w)
