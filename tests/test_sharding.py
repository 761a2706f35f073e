"""Multi-device (8 virtual CPU) data-parallel tests — SURVEY.md §4."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_rcnn_tpu.config import tiny_test_config
from stereo_rcnn_tpu.data.synthetic import synthetic_batch
from stereo_rcnn_tpu.parallel import (batch_sharding, jit_train_step,
                                      make_mesh, replicate, shard_batch)
from stereo_rcnn_tpu.train import Batch, init_train_state, make_train_step


def test_mesh_has_8_devices():
    assert jax.device_count() == 8, (
        "conftest must fake 8 CPU devices for these tests")
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_train_step_matches_single_device():
    cfg = tiny_test_config().replace(compute_dtype="float32")

    state = init_train_state(cfg, jax.random.PRNGKey(0), steps_per_epoch=10)
    il, ir, gt, _ = synthetic_batch(cfg, batch=8, seed=0, n_objects=2)
    batch = Batch(images_left=jnp.asarray(il), images_right=jnp.asarray(ir),
                  gt=jax.tree.map(jnp.asarray, gt))
    rng = jax.random.PRNGKey(1)
    step = make_train_step(cfg, steps_per_epoch=10)

    # Single-device reference.
    state1, metrics1 = jax.jit(step)(state, batch, rng)

    # 8-way data parallel.
    mesh = make_mesh(8)
    with mesh:
        state_r = replicate(mesh, state)
        batch_s = shard_batch(mesh, batch)
        state8, metrics8 = jit_train_step(step, mesh)(state_r, batch_s, rng)

    np.testing.assert_allclose(float(metrics1["total"]),
                               float(metrics8["total"]), rtol=1e-4)
    # Updated parameters must agree (grad psum == single-device mean).
    p1 = state1.params["model"]["rcnn_head"]["fc6"]["kernel"]
    p8 = state8.params["model"]["rcnn_head"]["fc6"]["kernel"]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=2e-5)


def test_batch_sharding_layout():
    mesh = make_mesh(8)
    x = jnp.zeros((8, 4, 4, 3))
    xs = jax.device_put(x, batch_sharding(mesh))
    # Each device holds exactly one batch element.
    shard_shapes = {tuple(s.data.shape) for s in xs.addressable_shards}
    assert shard_shapes == {(1, 4, 4, 3)}
