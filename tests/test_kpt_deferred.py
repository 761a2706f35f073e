"""The deferred keypoint pass (convs on NMS survivors only) must be
numerically identical to running the keypoint branch on ALL proposals and
then gathering the survivors — same pooled features, same weights, fewer
rows.  Reference equivalence: stereo_rcnn.py runs the branch on every RoI;
we prove the reordering changes nothing (detector.py::run_keypoints)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from stereo_rcnn_tpu.config import tiny_test_config
from stereo_rcnn_tpu.data.synthetic import synthetic_batch
from stereo_rcnn_tpu.models import build_model, init_params
from stereo_rcnn_tpu.models.detector import (decode_keypoints, forward_raw,
                                             postprocess_boxes,
                                             run_keypoints)


def test_deferred_keypoints_match_full_pass():
    cfg = tiny_test_config().replace(compute_dtype="float32")
    model = build_model(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    il, ir, _, _ = synthetic_batch(cfg, batch=2, seed=3, n_objects=3)
    h, w = cfg.data.image_h, cfg.data.image_w

    @jax.jit
    def both(params, l, r):
        raw = model.apply(params, l, r,
                          method=lambda m, a, c: forward_raw(m, a, c,
                                                             train=False))
        det, idx, rois = postprocess_boxes(raw, cfg, h, w)
        deferred = run_keypoints(model, params, raw, det, idx, rois)

        # Old semantics: keypoint convs over ALL N proposals, gather at idx.
        # kpt_feats is [B, N, rows, C] packed rows; first pk*pk = samples.
        b, n = raw["kpt_feats"].shape[:2]
        pkps = cfg.rcnn.kpt_pool_size
        kf_all = raw["kpt_feats"][:, :, :pkps * pkps].reshape(
            b * n, pkps, pkps, raw["kpt_feats"].shape[-1])
        kl_all = model.apply(params, kf_all,
                             method=lambda m, x: m.keypoints(x))
        kl_all = kl_all.reshape(b, n, *kl_all.shape[1:])
        kl_sel = jax.vmap(lambda k, i: k[i])(kl_all, idx)
        ku, kt, pk, bu = jax.vmap(decode_keypoints)(kl_sel, rois)
        return deferred, (ku, kt, pk, bu)

    deferred, (ku, kt, pk, bu) = both(params, jnp.asarray(il),
                                      jnp.asarray(ir))
    np.testing.assert_allclose(np.asarray(deferred.kpt_u), np.asarray(ku),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(deferred.kpt_type),
                                  np.asarray(kt))
    np.testing.assert_allclose(np.asarray(deferred.kpt_prob),
                               np.asarray(pk), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(deferred.border_u),
                               np.asarray(bu), rtol=1e-5, atol=1e-5)
    # And the detections themselves must carry real keypoints (not the
    # postprocess_boxes placeholders) wherever valid.
    assert bool(np.asarray(deferred.valid).any())
