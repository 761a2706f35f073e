import jax
import jax.numpy as jnp
import numpy as np

from stereo_rcnn_tpu.config import tiny_test_config
from stereo_rcnn_tpu.train import init_train_state
from stereo_rcnn_tpu.train.checkpoint import (latest_step, restore_checkpoint,
                                              save_checkpoint)


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_test_config().replace(compute_dtype="float32")
    state = init_train_state(cfg, jax.random.PRNGKey(0), steps_per_epoch=5)
    # Mutate so restored values are distinguishable from re-init.
    state = state._replace(
        step=jnp.asarray(7, jnp.int32),
        params={**state.params,
                "uncert": jnp.arange(6, dtype=jnp.float32) * 0.1})

    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, jax.device_get(state))
    assert latest_step(ckpt_dir) == 7

    template = init_train_state(cfg, jax.random.PRNGKey(1),
                                steps_per_epoch=5)
    restored = restore_checkpoint(ckpt_dir, template)
    assert int(restored.step) == 7
    np.testing.assert_allclose(np.asarray(restored.params["uncert"]),
                               np.arange(6) * 0.1, atol=1e-6)
    a = state.params["model"]["rcnn_head"]["fc6"]["kernel"]
    b = restored.params["model"]["rcnn_head"]["fc6"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_step_missing_dir(tmp_path):
    assert latest_step(str(tmp_path / "nope")) is None


def test_params_export_roundtrip(tmp_path):
    """Params-only export restores into an identically-structured template
    (pure IO — the bench.py weight-swap path), and REFUSES a mismatched
    template instead of silently running with wrong weights."""
    import pytest
    from stereo_rcnn_tpu.train.checkpoint import export_params, restore_params

    cfg = tiny_test_config().replace(compute_dtype="float32")
    state = init_train_state(cfg, jax.random.PRNGKey(0), steps_per_epoch=5)
    export = {"params": jax.device_get(state.params)["model"]}
    path = str(tmp_path / "params_export")
    export_params(path, export)

    from stereo_rcnn_tpu.models import init_params
    template = jax.device_get(init_params(cfg, jax.random.PRNGKey(9)))
    restored = restore_params(path, template)
    a = export["params"]["rcnn_head"]["fc6"]["kernel"]
    b = restored["params"]["rcnn_head"]["fc6"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    bad = {"params": {"nope": np.zeros((3, 3), np.float32)}}
    with pytest.raises(Exception):
        restore_params(path, bad)
