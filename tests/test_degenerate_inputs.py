"""Degenerate-input robustness probes for the hot ops and the detector.

The reference's CUDA kernels were only ever exercised by well-formed
proposals; a fixed-shape TPU pipeline must instead be TOTAL over its input
domain — padding, duplicates, empty scenes and NaNs all reach the ops as
real values.  Probes: identical duplicated boxes (one survivor), NaN
scores, zero-area / fully out-of-image RoIs (finite output), an
all-background image and max-detection saturation through the whole
detector."""

import jax
import jax.numpy as jnp
import numpy as np

from stereo_rcnn_tpu.ops import nms_mask, roi_align


def test_nms_identical_duplicates_keep_exactly_one():
    box = jnp.asarray([10.0, 10.0, 50.0, 50.0])
    boxes = jnp.tile(box, (16, 1))
    scores = jnp.full((16,), 0.7)
    keep = np.asarray(nms_mask(boxes, scores, 0.5))
    assert keep.sum() == 1
    assert keep[0]          # equal scores tie-break by original order


def test_nms_nan_scores_never_win():
    boxes = jnp.asarray([[0.0, 0.0, 10.0, 10.0],
                         [0.0, 0.0, 10.0, 10.0],
                         [20.0, 20.0, 30.0, 30.0]])
    scores = jnp.asarray([jnp.nan, 0.9, jnp.nan])
    keep = np.asarray(nms_mask(boxes, scores, 0.5))
    # The NaN duplicate must not suppress the real box: NaN comparisons are
    # False, so a NaN box never "dominates" anything.
    assert keep[1]


def test_roi_align_zero_area_roi_is_finite():
    feat = jnp.arange(32 * 32 * 4, dtype=jnp.float32).reshape(32, 32, 4)
    rois = jnp.asarray([[12.0, 9.0, 12.0, 9.0]])      # zero width & height
    out = roi_align(feat, rois, output_size=7, spatial_scale=1.0)
    assert out.shape == (1, 7, 7, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_roi_align_out_of_image_roi_is_finite():
    feat = jnp.ones((16, 16, 4))
    rois = jnp.asarray([[100.0, 100.0, 140.0, 140.0],   # fully outside
                        [-50.0, -50.0, -10.0, -10.0]])  # negative side
    out = roi_align(feat, rois, output_size=7, spatial_scale=1.0)
    assert out.shape == (2, 7, 7, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_detector_all_background_image(tiny_cfg_f32, tiny_params):
    """A blank stereo pair must flow through the ENTIRE pipeline (RPN ->
    NMS -> heads -> 3D solve -> dense align) with finite outputs and a
    plausible (possibly zero) detection count — the fixed-shape design
    pads, never branches."""
    from stereo_rcnn_tpu.data.synthetic import synthetic_batch
    from stereo_rcnn_tpu.inference import broadcast_calib, make_full_pipeline

    cfg, params = tiny_cfg_f32, tiny_params
    h, w = cfg.data.image_h, cfg.data.image_w
    _, _, _, calib = synthetic_batch(cfg, batch=1, seed=0, n_objects=1)
    blank = jnp.zeros((1, h, w, 3), jnp.float32)
    out = jax.jit(make_full_pipeline(cfg))(params, blank, blank,
                                           broadcast_calib(calib, 1))
    assert np.isfinite(np.asarray(out.position)).all()
    assert np.isfinite(np.asarray(out.det.score)).all()
    d = cfg.rcnn.max_detections
    assert out.det.valid.shape == (1, d)


def test_detector_saturation_valid_capped(tiny_cfg_f32, tiny_params):
    """A scene with more objects than max_detections must saturate the
    padded output, not overflow it."""
    from stereo_rcnn_tpu.data.synthetic import synthetic_batch
    from stereo_rcnn_tpu.models import make_inference_fn

    cfg, params = tiny_cfg_f32, tiny_params
    il, ir, _, _ = synthetic_batch(cfg, batch=1, seed=9,
                                   n_objects=cfg.rcnn.max_detections + 4)
    det = jax.jit(make_inference_fn(cfg))(params, jnp.asarray(il),
                                          jnp.asarray(ir))
    v = np.asarray(det.valid[0])
    assert v.sum() <= cfg.rcnn.max_detections
    assert np.isfinite(np.asarray(det.box_left)).all()
