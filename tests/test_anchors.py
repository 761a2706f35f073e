import numpy as np

from stereo_rcnn_tpu.config import AnchorConfig
from stereo_rcnn_tpu.geometry import (anchors_per_level, base_anchors,
                                      generate_anchors)


def test_base_anchor_areas():
    b = base_anchors(64.0, (0.5, 1.0, 2.0))
    areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    np.testing.assert_allclose(areas, 64.0 ** 2, rtol=1e-5)
    ratios = (b[:, 3] - b[:, 1]) / (b[:, 2] - b[:, 0])
    np.testing.assert_allclose(ratios, [0.5, 1.0, 2.0], rtol=1e-5)


def test_anchor_counts_and_layout():
    cfg = AnchorConfig()
    h, w = 128, 256
    anchors = np.asarray(generate_anchors(cfg, h, w))
    counts = anchors_per_level(cfg, h, w)
    assert anchors.shape == (sum(counts), 4)
    # First level: stride 4 -> 32x64 cells x 3 ratios.
    assert counts[0] == 32 * 64 * 3
    # First anchor is centered at (2, 2) (half-stride).
    c0 = anchors[0]
    np.testing.assert_allclose([(c0[0] + c0[2]) / 2, (c0[1] + c0[3]) / 2],
                               [2.0, 2.0], atol=1e-4)


def test_projection_roundtrip():
    import jax.numpy as jnp
    from stereo_rcnn_tpu.geometry import (box2d_from_3d, default_kitti_calib,
                                          project)
    calib = default_kitti_calib()
    # A point 10m ahead on the optical axis projects near the principal pt.
    uv = project(jnp.array([[-calib.tx2, 0.0, 10.0]]), calib)
    np.testing.assert_allclose(uv[0, 0], calib.cu, atol=1e-3)
    # Right-image projection of the same point is shifted left by f*b/z.
    uv_r = project(jnp.array([[-calib.tx2, 0.0, 10.0]]), calib, right=True)
    disp = float(calib.f * calib.baseline / 10.0)
    np.testing.assert_allclose(float(uv[0, 0] - uv_r[0, 0]), disp, atol=1e-3)

    box_l = box2d_from_3d(jnp.array([0.0, 1.6, 15.0]),
                          jnp.array([1.5, 1.6, 3.9]), jnp.array(0.3), calib)
    box_r = box2d_from_3d(jnp.array([0.0, 1.6, 15.0]),
                          jnp.array([1.5, 1.6, 3.9]), jnp.array(0.3), calib,
                          right=True)
    assert box_l[2] > box_l[0] and box_l[3] > box_l[1]
    assert float(box_r[0]) < float(box_l[0])   # right view shifts left
