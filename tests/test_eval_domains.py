"""Held-out evaluation domains (data/synthetic.py::EVAL_DOMAINS).

The synthetic AP numbers are self-referential if the eval renders inside
the training renderer's quirks (VERDICT round-4 weak #5); the domain
machinery perturbs APPEARANCE while keeping the SAME scene geometry, so a
checkpoint's AP under domain shift bounds that circularity.  These tests
pin the two properties the comparison relies on: identical ground truth
across domains, and perturbations that actually change (only) the pixels
in the way each domain claims.
"""

import numpy as np
import pytest

from stereo_rcnn_tpu.config import tiny_test_config
from stereo_rcnn_tpu.data.synthetic import EVAL_DOMAINS, synthetic_batch

CFG = tiny_test_config()


def _batch(domain):
    return synthetic_batch(CFG, batch=2, seed=7, n_objects=3, domain=domain)


def test_same_scenes_across_domains():
    """Ground truth (geometry, classes, keypoints) is byte-identical for
    every domain — the perturbation rng never touches the scene stream."""
    base = _batch("none")[2]
    for domain in EVAL_DOMAINS[1:]:
        gt = _batch(domain)[2]
        for f, a, b in zip(gt._fields, base, gt):
            np.testing.assert_array_equal(a, b, err_msg=f"{domain}:{f}")


def test_untinted_differs_only_on_object_pixels():
    il0, ir0, gt, _ = _batch("none")
    il1, ir1, gt1, _ = _batch("untinted")
    # Tints are a per-column gain on object pixels; background identical.
    assert not np.array_equal(il0, il1)
    diff = np.abs(il0[0] - il1[0]).max(-1) > 1e-3
    ys, xs = np.nonzero(diff)
    boxes = np.asarray(gt.left[0])[np.asarray(gt.valid[0])]
    # Every differing pixel lies inside some gt (2D) box.
    means = np.asarray(CFG.backbone.pixel_means_bgr, np.float32)
    for y, x in zip(ys[:: max(len(ys) // 50, 1)],
                    xs[:: max(len(xs) // 50, 1)]):
        inside = ((boxes[:, 0] - 1 <= x) & (x <= boxes[:, 2] + 1) &
                  (boxes[:, 1] - 1 <= y) & (y <= boxes[:, 3] + 1))
        assert inside.any(), (y, x)


def test_illum_is_affine_and_stereo_consistent():
    il0, ir0, *_ = _batch("none")
    il1, ir1, *_ = _batch("illum")
    means = np.asarray(CFG.backbone.pixel_means_bgr, np.float32)
    a0, a1 = il0[0] + means, il1[0] + means          # undo mean-sub
    # Fit gain/offset on unclipped pixels; the same (gain, off) must map
    # BOTH views of the frame (photometric consistency preserved).
    mask = (a1 > 1.0) & (a1 < 254.0)
    x, y = a0[mask], a1[mask]
    gain = np.cov(x, y)[0, 1] / np.var(x)
    off = y.mean() - gain * x.mean()
    np.testing.assert_allclose(y, gain * x + off, atol=0.5)
    b0, b1 = ir0[0] + means, ir1[0] + means
    m = (b1 > 1.0) & (b1 < 254.0)
    np.testing.assert_allclose(b1[m], gain * b0[m] + off, atol=0.5)
    # And it is per-frame: frame 1 gets a different gain.
    c0, c1 = il0[1] + means, il1[1] + means
    m = (c1 > 1.0) & (c1 < 254.0)
    gain1 = np.cov(c0[m], c1[m])[0, 1] / np.var(c0[m])
    assert abs(gain1 - gain) > 1e-3


def test_noise_is_independent_per_view():
    il0, ir0, *_ = _batch("none")
    il1, ir1, *_ = _batch("noise")
    dl = (il1 - il0).ravel()
    dr = (ir1 - ir0).ravel()
    assert 6.0 < dl.std() < 10.0          # sigma ~8 (clipping shaves a bit)
    # Left and right perturbations are uncorrelated (independent draws).
    n = min(len(dl), len(dr))
    corr = np.corrcoef(dl[:n], dr[:n])[0, 1]
    assert abs(corr) < 0.05


def test_shaded_is_achromatic_and_object_only():
    """Lambertian shading is a per-column ACHROMATIC gain on object
    pixels: per-pixel channel ratios stay equal, background untouched."""
    il0, _, gt, _ = _batch("untinted")           # plain = pre-gain pixels
    il1, _, gt1, _ = _batch("shaded")
    means = np.asarray(CFG.backbone.pixel_means_bgr, np.float32)
    a0, a1 = il0[0] + means, il1[0] + means
    diff = np.abs(a0 - a1).max(-1) > 1e-3
    ys, xs = np.nonzero(diff)
    assert len(ys) > 0
    boxes = np.asarray(gt.left[0])[np.asarray(gt.valid[0])]
    for y, x in zip(ys[:: max(len(ys) // 50, 1)],
                    xs[:: max(len(xs) // 50, 1)]):
        inside = ((boxes[:, 0] - 1 <= x) & (x <= boxes[:, 2] + 1) &
                  (boxes[:, 1] - 1 <= y) & (y <= boxes[:, 3] + 1))
        assert inside.any(), (y, x)
        # Achromatic: the same multiplicative gain on every channel
        # (skip clipped pixels where the ratio is distorted).
        p0, p1 = a0[y, x], a1[y, x]
        if (p0 > 2.0).all() and (p1 < 253.0).all():
            r = p1 / np.maximum(p0, 1e-6)
            assert r.max() - r.min() < 1e-3, (y, x, r)


def test_cfg_appearance_is_the_none_domain():
    """domain='none' renders cfg.data.synthetic_appearance; a shaded
    config's training distribution == the 'shaded' eval domain."""
    import dataclasses
    cfg_sh = dataclasses.replace(
        CFG, data=dataclasses.replace(CFG.data,
                                      synthetic_appearance="shaded"))
    il_a, ir_a, *_ = synthetic_batch(cfg_sh, batch=1, seed=7, n_objects=3,
                                     domain="none")
    il_b, ir_b, *_ = _batch("shaded")
    np.testing.assert_array_equal(il_a, il_b[:1])
    np.testing.assert_array_equal(ir_a, ir_b[:1])


def test_unknown_domain_fails_fast():
    with pytest.raises(ValueError, match="unknown domain"):
        synthetic_batch(CFG, batch=1, seed=0, domain="fog")
    from stereo_rcnn_tpu.data.synthetic import render_pair
    from stereo_rcnn_tpu.geometry.calib import default_kitti_calib
    with pytest.raises(ValueError, match="unknown appearance"):
        render_pair([], default_kitti_calib(), 64, 64,
                    np.random.RandomState(0), appearance="matte")
