"""The `rcnn.roi_align_hat` inference knob must actually reach the Pallas
kernel and stay detection-equivalent to the exact f32 hats.

Full-scale validation lives in STATUS.md (held-out AP on the TPU, same
checkpoint: no degradation); this locks the CONFIG PLUMBING — a broken
thread-through would silently no-op (same outputs bit-for-bit), and a
broken mode would diverge far beyond the bf16-weight tolerance."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from stereo_rcnn_tpu.config import tiny_test_config
from stereo_rcnn_tpu.data.synthetic import synthetic_batch
from stereo_rcnn_tpu.models import build_model, init_params
from stereo_rcnn_tpu.models.detector import forward_raw


def _raw(cfg, params, il, ir):
    model = build_model(cfg)
    return jax.jit(
        lambda p, a, b: model.apply(
            p, a, b, method=lambda m, x, y: forward_raw(m, x, y,
                                                        train=False))
    )(params, il, ir)


def test_kron_bf16_reaches_kernel_and_tracks_f32():
    cfg = tiny_test_config().replace(compute_dtype="float32")
    cfg = dataclasses.replace(
        cfg, rcnn=dataclasses.replace(cfg.rcnn, roi_align_impl="pallas"))
    params = init_params(cfg, jax.random.PRNGKey(0))
    il, ir, _, _ = synthetic_batch(cfg, batch=1, seed=7, n_objects=2)
    il, ir = jnp.asarray(il), jnp.asarray(ir)

    base = _raw(cfg, params, il, ir)
    fast = _raw(dataclasses.replace(
        cfg, rcnn=dataclasses.replace(cfg.rcnn,
                                      roi_align_hat="kron_bf16")),
        params, il, ir)

    a = np.asarray(base["rcnn"].cls_logits)
    b = np.asarray(fast["rcnn"].cls_logits)
    # Different mode must actually run (not bit-identical)...
    assert not np.array_equal(a, b)
    # ...but stay within bf16-weight tolerance at the logits.
    np.testing.assert_allclose(a, b, atol=0.1, rtol=0.05)
