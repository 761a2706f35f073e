import jax.numpy as jnp
import numpy as np

from stereo_rcnn_tpu.ops.roi_pool import roi_pool


def test_roi_pool_max_semantics():
    feat = jnp.zeros((16, 16, 1)).at[5, 5, 0].set(9.0).at[10, 12, 0].set(4.0)
    rois = jnp.array([[0.0, 0.0, 16.0, 16.0]])
    out = roi_pool(feat, rois, output_size=2, spatial_scale=1.0,
                   samples_per_bin=8)
    # Peak 9 is in the top-left quadrant, peak 4 in the bottom-right.
    assert float(out[0, 0, 0, 0]) == 9.0
    assert float(out[0, 1, 1, 0]) == 4.0
    assert float(out[0, 0, 1, 0]) == 0.0


def test_roi_pool_constant():
    feat = jnp.full((8, 8, 4), 2.5)
    rois = jnp.array([[1.0, 1.0, 7.0, 7.0]])
    out = roi_pool(feat, rois, 3, 1.0)
    np.testing.assert_allclose(out, 2.5)
