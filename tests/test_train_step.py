import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_rcnn_tpu.config import tiny_test_config
from stereo_rcnn_tpu.data.synthetic import synthetic_batch
from stereo_rcnn_tpu.train import (Batch, init_train_state, make_train_step,
                                   param_label)


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = tiny_test_config().replace(compute_dtype="float32")
    return cfg


@pytest.fixture(scope="module")
def state_and_batch(tiny_cfg):
    state = init_train_state(tiny_cfg, jax.random.PRNGKey(0),
                             steps_per_epoch=10)
    il, ir, gt, _ = synthetic_batch(tiny_cfg, batch=2, seed=0, n_objects=2)
    batch = Batch(images_left=jnp.asarray(il), images_right=jnp.asarray(ir),
                  gt=jax.tree.map(jnp.asarray, gt))
    return state, batch


def test_param_labels(tiny_cfg):
    # Frozen-BN config: the label rules are about the reference's
    # FIXED_BLOCKS / frozen-BN semantics (presumes pretrained weights).
    cfg = dataclasses.replace(
        tiny_cfg, backbone=dataclasses.replace(tiny_cfg.backbone,
                                               norm="frozen"))
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    labels = jax.tree_util.tree_map_with_path(
        lambda p, l: param_label(p, l, freeze_stem=True), state.params)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    as_dict = {"/".join(str(getattr(k, "key", k)) for k in p): v
               for p, v in flat}
    # Spot checks.
    assert as_dict["uncert"] == "uncert"
    bb = "model/backbone_net"
    assert as_dict[f"{bb}/conv1/kernel"] == "frozen"          # stem
    assert as_dict[f"{bb}/bn1/scale"] == "frozen"
    assert as_dict[f"{bb}/layer1_0/conv1/kernel"] == "frozen"
    assert as_dict[f"{bb}/layer2_0/conv1/kernel"] == "decay"  # trains
    assert as_dict[f"{bb}/layer2_0/bn1/scale"] == "frozen"
    assert as_dict["model/rcnn_head/fc6/kernel"] == "decay"
    assert as_dict["model/rcnn_head/fc6/bias"] == "plain"

    # GroupNorm (from-scratch) config: norm affines train AND the stem is
    # NOT frozen (freezing random weights would cap training quality).
    labels_g = jax.tree_util.tree_map_with_path(
        lambda p, l: param_label(p, l, freeze_stem=False),
        init_train_state(tiny_cfg, jax.random.PRNGKey(0)).params)
    flat_g = jax.tree_util.tree_flatten_with_path(labels_g)[0]
    gn = {"/".join(str(getattr(k, "key", k)) for k in p): v
          for p, v in flat_g}
    gn_keys = [k for k in gn if "/gn/" in k]
    assert gn_keys and all(gn[k] == "plain" for k in gn_keys)
    assert gn[f"{bb}/conv1/kernel"] == "decay"                # stem trains
    assert gn[f"{bb}/layer1_0/conv1/kernel"] == "decay"


def test_train_step_runs_and_updates(tiny_cfg, state_and_batch):
    state, batch = state_and_batch
    step_fn = jax.jit(make_train_step(tiny_cfg, steps_per_epoch=10))
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(3))
    assert int(new_state.step) == 1
    for k in ("rpn_cls", "rpn_box", "rcnn_cls", "rcnn_box", "dim_orien",
              "kpt", "total", "grad_norm"):
        assert np.isfinite(float(metrics[k])), k

    p0 = state.params["model"]["rcnn_head"]["fc6"]["kernel"]
    p1 = new_state.params["model"]["rcnn_head"]["fc6"]["kernel"]
    assert float(jnp.abs(p1 - p0).max()) > 0          # trainable moved
    # From-scratch (GroupNorm) config: the stem TRAINS (see param_label).
    f0 = state.params["model"]["backbone_net"]["conv1"]["kernel"]
    f1 = new_state.params["model"]["backbone_net"]["conv1"]["kernel"]
    assert float(jnp.abs(jnp.asarray(f1) - jnp.asarray(f0)).max()) > 0
    u0 = state.params["uncert"]
    u1 = new_state.params["uncert"]
    assert float(jnp.abs(u1 - u0).max()) > 0          # uncertainty learns


def test_train_step_pallas_roi_align(tiny_cfg, state_and_batch):
    """Training THROUGH the Pallas RoIAlign (forward fused kernel +
    custom_vjp backward kernel, interpret mode on CPU): finite losses and
    gradients reaching the backbone — VERDICT item 2's acceptance."""
    state, batch = state_and_batch
    cfg = dataclasses.replace(
        tiny_cfg, rcnn=dataclasses.replace(tiny_cfg.rcnn,
                                           roi_align_impl="pallas"))
    one = jax.tree.map(lambda x: x[:1], batch)
    step_fn = jax.jit(make_train_step(cfg, steps_per_epoch=10))
    new_state, metrics = step_fn(state, one, jax.random.PRNGKey(5))
    for k in ("rcnn_cls", "rcnn_box", "kpt", "total", "grad_norm"):
        assert np.isfinite(float(metrics[k])), k
    # The RoIAlign backward must propagate into the backbone trunk (layer4
    # feeds the heads only through the pooled features).
    l4a = state.params["model"]["backbone_net"]["layer4_0"]["conv2"]["kernel"]
    l4b = new_state.params["model"]["backbone_net"]["layer4_0"]["conv2"][
        "kernel"]
    assert float(jnp.abs(jnp.asarray(l4b) - jnp.asarray(l4a)).max()) > 0


def test_loss_decreases_on_repeated_batch(tiny_cfg, state_and_batch):
    state, batch = state_and_batch
    step_fn = jax.jit(make_train_step(tiny_cfg, steps_per_epoch=100))
    rng = jax.random.PRNGKey(4)
    first = None
    for i in range(8):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, batch, sub)
        if first is None:
            first = float(metrics["total"])
    # Overfitting a fixed tiny batch must reduce the combined loss.
    assert float(metrics["total"]) < first
