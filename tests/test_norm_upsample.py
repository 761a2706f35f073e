"""Backbone variant tests: the "affine" norm mode (trainable, zero-gamma,
frozen-BN-compatible tree) and the FPN top-down upsample options
("bilinear" = reference-exact ``resnet.py::_upsample_add``; "nearest" =
measured deviation).  VERDICT r2 items #4 (parity switch) and the
params-export path both depend on these invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from stereo_rcnn_tpu.models.resnet_fpn import ResNetFPN


def _init(norm, upsample="nearest"):
    net = ResNetFPN(depth=10, fpn_dim=32, dtype=jnp.float32, norm=norm,
                    upsample=upsample)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return net, net.init(jax.random.PRNGKey(0), x)


def test_affine_tree_identical_to_frozen():
    """An affine-mode checkpoint must restore into the frozen-BN inference
    program with no recompile: same tree structure, same shapes/dtypes."""
    _, frozen = _init("frozen")
    _, affine = _init("affine")
    fs = jax.tree_util.tree_structure(frozen)
    as_ = jax.tree_util.tree_structure(affine)
    assert fs == as_
    for pf, pa in zip(jax.tree.leaves(frozen), jax.tree.leaves(affine)):
        assert pf.shape == pa.shape and pf.dtype == pa.dtype


def test_affine_zero_gamma_init():
    """bn3 (residual-branch output) scales init to ZERO in affine mode —
    the zero-gamma trick — while all other norm scales init to one."""
    _, affine = _init("affine")
    p = affine["params"]
    bn3 = p["layer1_0"]["bn3"]["scale"]
    bn1 = p["layer1_0"]["bn1"]["scale"]
    np.testing.assert_array_equal(np.asarray(bn3), 0.0)
    np.testing.assert_array_equal(np.asarray(bn1), 1.0)
    # Frozen mode keeps identity init everywhere (pretrained constants
    # get loaded over it).
    _, frozen = _init("frozen")
    np.testing.assert_array_equal(
        np.asarray(frozen["params"]["layer1_0"]["bn3"]["scale"]), 1.0)


def test_affine_norm_params_train_frozen_do_not():
    """Optimizer partition: bn scale/bias are "plain" (train, no decay) in
    affine mode and "frozen" (zeroed updates) otherwise.  A zeroed update
    on a zero-gamma scale would leave every residual branch dead."""
    import jax.tree_util as jtu
    from stereo_rcnn_tpu.train.step import param_label
    path = tuple(jtu.DictKey(k) for k in
                 ("model", "backbone_net", "layer1_0", "bn3", "scale"))
    assert param_label(path, None, freeze_stem=False, train_bn=True) == \
        "plain"
    assert param_label(path, None, freeze_stem=True, train_bn=False) == \
        "frozen"
    stem = tuple(jtu.DictKey(k) for k in
                 ("model", "backbone_net", "conv1", "kernel"))
    assert param_label(stem, None, freeze_stem=False, train_bn=True) == \
        "decay"
    assert param_label(stem, None, freeze_stem=True) == "frozen"


def test_upsample_bilinear_vs_nearest_differ():
    """The two upsample modes must be numerically distinct (the round-2
    deviation was silent); bilinear must interpolate, nearest must repeat."""
    top = jnp.arange(8.0).reshape(1, 2, 4, 1)
    lateral = jnp.zeros((1, 4, 8, 1))
    bil = ResNetFPN(upsample="bilinear")._upsample_add(top, lateral)
    near = ResNetFPN(upsample="nearest")._upsample_add(top, lateral)
    assert bil.shape == near.shape == lateral.shape
    assert not np.allclose(np.asarray(bil), np.asarray(near))
    # Nearest = exact 2x pixel repeat.
    np.testing.assert_array_equal(
        np.asarray(near)[0, :, :, 0],
        np.repeat(np.repeat(np.arange(8.0).reshape(2, 4), 2, 0), 2, 1))
    # Bilinear = jax.image.resize 'linear' (half-pixel centers, the
    # torch align_corners=False convention the reference uses).
    expect = jax.image.resize(top, lateral.shape, method="linear")
    np.testing.assert_allclose(np.asarray(bil), np.asarray(expect),
                               rtol=1e-6)


def test_backbone_forward_all_variants():
    """Each (norm, upsample) variant runs and yields the 5 FPN levels."""
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    for norm in ("frozen", "affine", "group"):
        net, params = _init(norm, upsample="bilinear")
        feats = net.apply(params, x)
        assert len(feats) == 5
        assert feats[0].shape == (1, 16, 16, 32)
        assert all(bool(jnp.isfinite(f).all()) for f in feats)
