"""AOT export round-trip: serialize the full pipeline, reload, run.

Reference parity note: the reference has NO deployment path — this is a
beyond-parity TPU-native capability (SURVEY.md §5 lists no serving
subsystem).  The artifact must reproduce the live jitted pipeline's
outputs exactly (same XLA program, CPU lowering here)."""

import jax
import jax.numpy as jnp
import numpy as np

from stereo_rcnn_tpu.data.synthetic import synthetic_batch
from stereo_rcnn_tpu.inference import broadcast_calib, make_full_pipeline
from stereo_rcnn_tpu.serving import export_pipeline, load_pipeline


def test_export_roundtrip_matches_live(tiny_cfg_f32, tiny_params):
    cfg, params = tiny_cfg_f32, tiny_params
    batch = 2
    il, ir, _, calib = synthetic_batch(cfg, batch=batch, seed=5, n_objects=2)
    left, right = jnp.asarray(il), jnp.asarray(ir)
    calib_b = broadcast_calib(calib, batch)

    blob = export_pipeline(cfg, params, batch, platforms=("cpu",))
    assert isinstance(blob, bytes) and len(blob) > 1000

    pipe = load_pipeline(blob)
    assert pipe.manifest["batch"] == batch
    assert pipe.manifest["image_hw"] == [cfg.data.image_h, cfg.data.image_w]
    assert pipe.manifest["platforms"] == ["cpu"]

    live = jax.jit(make_full_pipeline(cfg))(params, left, right, calib_b)
    exported = pipe(params, left, right, calib_b)

    np.testing.assert_array_equal(np.asarray(live.det.valid),
                                  np.asarray(exported.det.valid))
    np.testing.assert_allclose(np.asarray(live.det.box_left),
                               np.asarray(exported.det.box_left), atol=1e-5)
    np.testing.assert_allclose(np.asarray(live.position),
                               np.asarray(exported.position), atol=1e-4)
    np.testing.assert_allclose(np.asarray(live.z_refined),
                               np.asarray(exported.z_refined), atol=1e-4)


def test_export_rejects_garbage():
    import pytest
    with pytest.raises(ValueError):
        load_pipeline(b"\x05\x00\x00\x00hello" + b"x" * 100)
