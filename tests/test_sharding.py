"""Multi-device (virtual CPU mesh) data-parallel tests — SURVEY.md §4.

Device count adapts to the host (see conftest: 8 on >=8-core machines,
2 on small ones — XLA:CPU aborts collectives whose rendezvous straggles
past 40 s, which 8 device threads on 1 core always do).  The consistency
properties proven here (sharded step == single-device step; sharded
inference == single-device inference) are device-count independent; the
full 8-way layout is exercised by ``__graft_entry__.dryrun_multichip``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from stereo_rcnn_tpu.config import tiny_test_config
from stereo_rcnn_tpu.data.synthetic import synthetic_batch
from stereo_rcnn_tpu.parallel import (batch_sharding, jit_inference,
                                      jit_train_step, make_mesh, replicate,
                                      shard_batch)
from stereo_rcnn_tpu.train import Batch, init_train_state, make_train_step

from tests.conftest import N_DEVICES


def test_mesh_spans_all_devices():
    assert jax.device_count() == N_DEVICES, (
        "conftest must fake a multi-device CPU platform for these tests")
    mesh = make_mesh()
    assert mesh.devices.size == N_DEVICES


def test_sharded_train_step_matches_single_device():
    cfg = tiny_test_config().replace(compute_dtype="float32")
    n = N_DEVICES

    state = init_train_state(cfg, jax.random.PRNGKey(0), steps_per_epoch=10)
    il, ir, gt, _ = synthetic_batch(cfg, batch=n, seed=0, n_objects=2)
    batch = Batch(images_left=jnp.asarray(il), images_right=jnp.asarray(ir),
                  gt=jax.tree.map(jnp.asarray, gt))
    rng = jax.random.PRNGKey(1)
    step = make_train_step(cfg, steps_per_epoch=10)

    # Single-device reference.
    state1, metrics1 = jax.jit(step)(state, batch, rng)

    # n-way data parallel.
    mesh = make_mesh(n)
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


def test_sharded_inference_matches_single_device():
    """VERDICT item 10: multi-chip INFERENCE, not just training — the full
    pipeline (network + NMS + 3D solve + dense align) sharded over the
    mesh must produce the same detections as one device."""
    from stereo_rcnn_tpu.inference import broadcast_calib, make_full_pipeline
    from stereo_rcnn_tpu.models import init_params

    cfg = tiny_test_config().replace(compute_dtype="float32")
    n = N_DEVICES
    params = init_params(cfg, jax.random.PRNGKey(0))
    il, ir, gt, calib = synthetic_batch(cfg, batch=n, seed=2, n_objects=2)
    calib_b = broadcast_calib(calib, n)
    fn = make_full_pipeline(cfg)          # runtime-calib variant

    out1 = jax.jit(fn)(params, jnp.asarray(il), jnp.asarray(ir), calib_b)

    mesh = make_mesh(n)
    with mesh:
        params_r = replicate(mesh, params)
        il_s = shard_batch(mesh, jnp.asarray(il))
        ir_s = shard_batch(mesh, jnp.asarray(ir))
        calib_s = shard_batch(mesh, calib_b)
        out8 = jit_inference(fn, mesh)(params_r, il_s, ir_s, calib_s)

    np.testing.assert_allclose(np.asarray(out1.det.box_left),
                               np.asarray(out8.det.box_left), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out1.det.valid),
                                  np.asarray(out8.det.valid))
    np.testing.assert_allclose(np.asarray(out1.position),
                               np.asarray(out8.position), atol=1e-2)


def test_batch_sharding_layout():
    mesh = make_mesh(N_DEVICES)
    x = jnp.zeros((N_DEVICES, 4, 4, 3))
    xs = jax.device_put(x, batch_sharding(mesh))
    # Each device holds exactly one batch element.
    shard_shapes = {tuple(s.data.shape) for s in xs.addressable_shards}
    assert shard_shapes == {(1, 4, 4, 3)}
