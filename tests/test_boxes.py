import jax.numpy as jnp
import numpy as np

from stereo_rcnn_tpu.geometry import (clip_boxes, decode_stereo_boxes,
                                      encode_stereo_boxes, pairwise_iou,
                                      union_box)


def test_iou_basic():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0],
                   [20.0, 20.0, 30.0, 30.0]])
    iou = pairwise_iou(a, b)
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 25.0 / 175.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 2], 0.0, atol=1e-6)


def test_stereo_coder_roundtrip(rng):
    n = 64
    anchors = np.zeros((n, 4), np.float32)
    anchors[:, 0] = rng.uniform(0, 500, n)
    anchors[:, 1] = rng.uniform(0, 300, n)
    anchors[:, 2] = anchors[:, 0] + rng.uniform(20, 200, n)
    anchors[:, 3] = anchors[:, 1] + rng.uniform(20, 120, n)

    left = anchors + rng.uniform(-8, 8, (n, 4)).astype(np.float32)
    left[:, 2] = np.maximum(left[:, 2], left[:, 0] + 4)
    left[:, 3] = np.maximum(left[:, 3], left[:, 1] + 4)
    # Right box: shifted left by disparity, same vertical extent.
    disp = rng.uniform(2, 40, n).astype(np.float32)
    right = left.copy()
    right[:, 0] -= disp
    right[:, 2] -= disp * 0.9   # slightly different width

    deltas = encode_stereo_boxes(jnp.asarray(anchors), jnp.asarray(left),
                                 jnp.asarray(right))
    dec_l, dec_r = decode_stereo_boxes(jnp.asarray(anchors), deltas)
    np.testing.assert_allclose(dec_l, left, atol=1e-2)
    # Decoded right shares left's (y, h) — true for our construction.
    np.testing.assert_allclose(dec_r[:, 0], right[:, 0], atol=1e-2)
    np.testing.assert_allclose(dec_r[:, 2], right[:, 2], atol=1e-2)
    np.testing.assert_allclose(dec_r[:, 1], left[:, 1], atol=1e-2)
    np.testing.assert_allclose(dec_r[:, 3], left[:, 3], atol=1e-2)


def test_union_and_clip():
    l = jnp.array([[10.0, 10.0, 20.0, 30.0]])
    r = jnp.array([[5.0, 12.0, 18.0, 28.0]])
    u = union_box(l, r)
    np.testing.assert_allclose(u[0], [5.0, 10.0, 20.0, 30.0])
    c = clip_boxes(jnp.array([[-5.0, -5.0, 500.0, 500.0]]), 100, 200)
    np.testing.assert_allclose(c[0], [0.0, 0.0, 200.0, 100.0])
