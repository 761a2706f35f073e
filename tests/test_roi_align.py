import jax
import jax.numpy as jnp
import numpy as np

from stereo_rcnn_tpu.ops import (fpn_level_assignment, multilevel_roi_align,
                                 roi_align)


def test_roi_align_constant_map():
    """On a constant feature map every bin must equal the constant."""
    feat = jnp.full((32, 32, 8), 3.5)
    rois = jnp.array([[4.0, 4.0, 20.0, 28.0]])
    out = roi_align(feat, rois, output_size=7, spatial_scale=1.0)
    assert out.shape == (1, 7, 7, 8)
    np.testing.assert_allclose(out, 3.5, atol=1e-5)


def test_roi_align_linear_ramp():
    """Bilinear sampling of a linear ramp is exact: bin centers of an
    axis-aligned ramp average to the ramp value at the bin center."""
    h = w = 32
    ramp = jnp.arange(w, dtype=jnp.float32)[None, :].repeat(h, 0)[..., None]
    rois = jnp.array([[8.0, 8.0, 24.0, 24.0]])
    p = 4
    out = roi_align(ramp, rois, output_size=p, spatial_scale=1.0,
                    sampling_ratio=2)
    bin_w = 16.0 / p
    expected_x = 8.0 + (np.arange(p) + 0.5) * bin_w
    np.testing.assert_allclose(out[0, 0, :, 0], expected_x, atol=1e-4)


def test_roi_align_gradients_flow():
    feat = jnp.ones((16, 16, 4))
    rois = jnp.array([[2.0, 2.0, 12.0, 12.0]])

    def loss(f):
        return roi_align(f, rois, 7, 1.0).sum()

    g = jax.grad(loss)(feat)
    assert float(jnp.abs(g).sum()) > 0
    # Gradient mass should concentrate inside the roi.
    inside = g[2:13, 2:13].sum()
    np.testing.assert_allclose(inside, g.sum(), rtol=0.05)


def test_fpn_level_assignment():
    rois = jnp.array([
        [0, 0, 32, 32],      # sqrt(wh)=32 -> log2(32/224)<0 -> level 0
        [0, 0, 224, 224],    # exactly canonical -> level 2
        [0, 0, 1000, 1000],  # huge -> clamp to 3
    ], jnp.float32)
    lv = fpn_level_assignment(rois, num_levels=4)
    assert lv.tolist() == [0, 2, 3]


def test_multilevel_matches_single_level():
    """A roi routed to level L must produce the same output as direct
    roi_align against that level."""
    rng = np.random.RandomState(1)
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.rand(64 // (s // 4), 64 // (s // 4), 6)
                         .astype(np.float32)) for s in strides]
    rois = jnp.array([[10.0, 10.0, 60.0, 60.0]])   # small -> level 0
    out_ml = multilevel_roi_align(feats, rois, strides, 7)
    out_direct = roi_align(feats[0], rois, 7, 1.0 / strides[0])
    np.testing.assert_allclose(out_ml, out_direct, atol=1e-5)
