"""A/B parity: Pallas RoIAlign kernel vs the XLA atlas implementation
(SURVEY.md §7 step 2: 'Pallas kernel second with an A/B parity test').
Runs in interpret mode on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from stereo_rcnn_tpu.ops.roi_align import multilevel_roi_align
from stereo_rcnn_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas


@pytest.fixture(scope="module")
def pyramid(rng=None):
    r = np.random.RandomState(7)
    strides = [4, 8, 16, 32]
    h, w = 128, 256
    feats = [jnp.asarray(r.rand(h // s, w // s, 32).astype(np.float32))
             for s in strides]
    return feats, strides, h, w


def test_pallas_matches_xla(pyramid):
    feats, strides, h, w = pyramid
    r = np.random.RandomState(1)
    # Interior rois across all levels (window clamping differs only at
    # image borders, where the reference semantics are also clamp-y).
    rois = []
    for size in (40, 90, 200, 240):
        for _ in range(3):
            x1 = r.uniform(8, w - size - 8) if w - size - 16 > 0 else 8
            y1 = r.uniform(8, max(h - size // 2 - 8, 9))
            rois.append([x1, y1, x1 + size, min(y1 + size / 2, h - 4.0)])
    rois = jnp.asarray(np.asarray(rois, np.float32))

    ref = multilevel_roi_align(feats, rois, strides, 7, 2)
    out = multilevel_roi_align_pallas(feats, rois, strides, 7, 2,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)


def test_pallas_batched(pyramid):
    feats, strides, h, w = pyramid
    bf = [jnp.stack([f, f * 2.0]) for f in feats]
    rois = jnp.asarray([[[20.0, 20.0, 70.0, 60.0]],
                        [[20.0, 20.0, 70.0, 60.0]]])
    out = multilevel_roi_align_pallas(bf, rois, strides, 7, 2,
                                      interpret=True)
    assert out.shape == (2, 1, 7, 7, 32)
    np.testing.assert_allclose(np.asarray(out[1]), 2 * np.asarray(out[0]),
                               rtol=1e-3)
