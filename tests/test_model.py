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


def _fake_raw(cfg, boxes, cls_logits):
    """Hand-built proposals + head outputs for postprocess tests.

    ``boxes``: [N, 4]; deltas are zero so each decoded box equals its
    proposal; dims/orien encode the class index so the merge can be
    checked per field.
    """
    import numpy as np

    from stereo_rcnn_tpu.models.heads import RCNNOutputs
    from stereo_rcnn_tpu.models.stereo_rpn import Proposals

    n = boxes.shape[0]
    k = cls_logits.shape[1]
    props = Proposals(
        left=jnp.asarray(boxes)[None],
        right=jnp.asarray(boxes)[None],
        scores=jnp.ones((1, n)),
        valid=jnp.ones((1, n), bool),
    )
    rcnn = RCNNOutputs(
        cls_logits=jnp.asarray(cls_logits)[None],
        box_deltas=jnp.zeros((1, n, k, 6)),
        dims=jnp.broadcast_to(
            np.arange(k, dtype=np.float32)[None, None, :, None],
            (1, n, k, 3)).astype(jnp.float32),
        orien=jnp.zeros((1, n, k, 2)),
    )
    return {"proposals": props, "rcnn": rcnn}


def test_multiclass_postprocess_scores_every_class():
    """A 3-class head must score BOTH foreground classes: per-class decode
    + NMS, merged by global top-k (reference ``test_net.py`` loops classes
    the same way; the released Car-only model is the K=2 special case)."""
    import dataclasses

    import numpy as np

    from stereo_rcnn_tpu.models.detector import postprocess_boxes

    cfg = tiny_test_config()
    cfg3 = cfg.replace(rcnn=dataclasses.replace(cfg.rcnn, num_classes=3))
    # Two well-separated proposals: one clearly class 1, one clearly
    # class 2.
    boxes = np.array([[10, 10, 50, 50], [100, 10, 140, 50]], np.float32)
    logits = np.array([[0.0, 5.0, -5.0], [0.0, -5.0, 5.0]], np.float32)
    det, idx, rois = postprocess_boxes(
        _fake_raw(cfg3, boxes, logits), cfg3, cfg.data.image_h,
        cfg.data.image_w)
    v = np.asarray(det.valid[0])
    assert v.sum() == 2
    got = {(int(c), int(i)) for c, i in
           zip(np.asarray(det.cls[0])[v], np.asarray(idx[0])[v])}
    assert got == {(1, 0), (2, 1)}
    # dims encode the class index (mean subtracted): class c row adds c.
    mean = np.asarray(cfg3.rcnn.mean_dims_hwl)
    for slot in np.nonzero(v)[0]:
        c = int(np.asarray(det.cls[0])[slot])
        assert np.allclose(np.asarray(det.dims[0][slot]), mean + c)
    # rois are the proposal boxes the detections decoded from.
    for slot in np.nonzero(v)[0]:
        i = int(np.asarray(idx[0])[slot])
        assert np.allclose(np.asarray(rois[0][slot]), boxes[i])


def test_single_class_postprocess_keeps_reference_layout():
    """K=2 must stay the reference decode: class-1 scores, [D] padding,
    score-descending order."""
    import numpy as np

    from stereo_rcnn_tpu.models.detector import postprocess_boxes

    cfg = tiny_test_config()
    boxes = np.array([[10, 10, 50, 50], [100, 10, 140, 50],
                      [200, 10, 240, 50]], np.float32)
    logits = np.array([[0.0, 3.0], [0.0, 1.0], [0.0, 2.0]], np.float32)
    det, idx, _ = postprocess_boxes(
        _fake_raw(cfg, boxes, logits), cfg, cfg.data.image_h,
        cfg.data.image_w)
    v = np.asarray(det.valid[0])
    assert v.sum() == 3
    assert np.asarray(det.cls[0])[v].tolist() == [1, 1, 1]
    order = np.asarray(idx[0])[v].tolist()
    assert order == [0, 2, 1]                 # score-descending
    s = np.asarray(det.score[0])[v]
    assert np.all(np.diff(s) <= 0)
