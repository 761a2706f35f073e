"""Gradient A/B parity: the Pallas fused-stereo RoIAlign backward kernel
(hat-matrix transpose + sequential RMW accumulation) vs the XLA atlas
implementation's autodiff gradient (VERDICT item 2 — the flagship kernel
must serve the training hot loop).  Runs in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_rcnn_tpu.ops.roi_align import multilevel_roi_align
from stereo_rcnn_tpu.ops.roi_align_pallas import stereo_roi_align_batched


@pytest.fixture(scope="module")
def batched_pyramid():
    r = np.random.RandomState(11)
    strides = [4, 8, 16, 32]
    h, w = 128, 256
    b = 2
    feats = [jnp.asarray(r.rand(b, h // s, w // s, 16).astype(np.float32))
             for s in strides]
    rois_l, rois_r = [], []
    rb = np.random.RandomState(5)
    for _ in range(b):
        bl, br = [], []
        for size in (40, 90, 180):
            x1 = rb.uniform(30, w - size - 30) if w - size - 60 > 0 else 30
            y1 = rb.uniform(8, max(h - size // 2 - 8, 9))
            box = [x1, y1, x1 + size, min(y1 + size / 2, h - 4.0)]
            bl.append(box)
            br.append([box[0] - 12, box[1], box[2] - 12, box[3]])
        rois_l.append(bl)
        rois_r.append(br)
    return (feats, jnp.asarray(np.asarray(rois_l, np.float32)),
            jnp.asarray(np.asarray(rois_r, np.float32)), strides)


def _xla_stereo(feats_l, feats_r, rois_l, rois_r, strides):
    pl7 = multilevel_roi_align(list(feats_l), rois_l, strides, 7, 2)
    pr7 = multilevel_roi_align(list(feats_r), rois_r, strides, 7, 2)
    pk14 = multilevel_roi_align(list(feats_l), rois_l, strides, 14, 1)
    return pl7, pr7, pk14


def test_forward_batched_matches_xla(batched_pyramid):
    feats, rois_l, rois_r, strides = batched_pyramid
    out7l, out7r, out14 = stereo_roi_align_batched(
        tuple(feats), tuple(feats), rois_l, rois_r, strides, 7, 14, True)
    ref7l, ref7r, ref14 = _xla_stereo(feats, feats, rois_l, rois_r, strides)
    np.testing.assert_allclose(np.asarray(out7l), np.asarray(ref7l),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out7r), np.asarray(ref7r),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out14), np.asarray(ref14),
                               atol=2e-3, rtol=1e-3)


def test_gradient_matches_xla(batched_pyramid):
    feats, rois_l, rois_r, strides = batched_pyramid
    r = np.random.RandomState(3)
    b, n = rois_l.shape[:2]
    c = feats[0].shape[-1]
    w7l = jnp.asarray(r.randn(b, n, 7, 7, c).astype(np.float32))
    w7r = jnp.asarray(r.randn(b, n, 7, 7, c).astype(np.float32))
    w14 = jnp.asarray(r.randn(b, n, 14, 14, c).astype(np.float32))

    def loss_pallas(fl):
        o7l, o7r, o14 = stereo_roi_align_batched(
            tuple(fl), tuple(fl), rois_l, rois_r, strides, 7, 14, True)
        return (o7l * w7l).sum() + (o7r * w7r).sum() + (o14 * w14).sum()

    def loss_xla(fl):
        o7l, o7r, o14 = _xla_stereo(fl, fl, rois_l, rois_r, strides)
        return (o7l * w7l).sum() + (o7r * w7r).sum() + (o14 * w14).sum()

    g_pallas = jax.grad(lambda fl: loss_pallas(fl))(list(feats))
    g_xla = jax.grad(lambda fl: loss_xla(fl))(list(feats))
    for gp, gx, lvl in zip(g_pallas, g_xla, range(4)):
        # Scale tolerance with gradient magnitude per level.
        scale = max(float(jnp.abs(gx).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), atol=5e-3 * scale, rtol=2e-3,
            err_msg=f"level {lvl}")


def test_packed_batched_matches_tuple_api(batched_pyramid):
    """stereo_roi_align_batched_packed (the detector's path): its packed
    rows must be bit-identical slices of the 3-tuple API's outputs, and
    its custom-vjp gradient must match the 3-tuple API's gradient."""
    from stereo_rcnn_tpu.ops.roi_align_pallas import (
        stereo_roi_align_batched_packed)
    feats, rois_l, rois_r, strides = batched_pyramid
    b, n = rois_l.shape[:2]
    c = feats[0].shape[-1]

    packed = stereo_roi_align_batched_packed(
        tuple(feats), tuple(feats), rois_l, rois_r, strides, 7, 14, True)
    o7l, o7r, o14 = stereo_roi_align_batched(
        tuple(feats), tuple(feats), rois_l, rois_r, strides, 7, 14, True)
    kk, pp = 196, 49
    np.testing.assert_array_equal(
        np.asarray(packed[:, :, :kk].reshape(b, n, 14, 14, c)),
        np.asarray(o14))
    np.testing.assert_array_equal(
        np.asarray(packed[:, :, kk:kk + pp].reshape(b, n, 7, 7, c)),
        np.asarray(o7l))
    np.testing.assert_array_equal(
        np.asarray(packed[:, :, kk + pp:].reshape(b, n, 7, 7, c)),
        np.asarray(o7r))

    r = np.random.RandomState(4)
    wp = jnp.asarray(r.randn(b, n, kk + 2 * pp, c).astype(np.float32))

    def loss_packed(fl):
        out = stereo_roi_align_batched_packed(
            tuple(fl), tuple(fl), rois_l, rois_r, strides, 7, 14, True)
        return (out * wp).sum()

    def loss_tuple(fl):
        o7l_, o7r_, o14_ = stereo_roi_align_batched(
            tuple(fl), tuple(fl), rois_l, rois_r, strides, 7, 14, True)
        w14 = wp[:, :, :kk].reshape(b, n, 14, 14, c)
        w7l = wp[:, :, kk:kk + pp].reshape(b, n, 7, 7, c)
        w7r = wp[:, :, kk + pp:].reshape(b, n, 7, 7, c)
        return (o14_ * w14).sum() + (o7l_ * w7l).sum() + (o7r_ * w7r).sum()

    g_packed = jax.grad(lambda fl: loss_packed(fl))(list(feats))
    g_tuple = jax.grad(lambda fl: loss_tuple(fl))(list(feats))
    for gp, gt, lvl in zip(g_packed, g_tuple, range(4)):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gt),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"level {lvl}")


def test_gradient_zero_for_invalid_rois(batched_pyramid):
    feats, rois_l, rois_r, strides = batched_pyramid
    # Degenerate (zero-area) rois are masked by the valid bit: outputs and
    # gradients must be exactly zero.
    zero_rois = jnp.zeros_like(rois_l)

    def loss(fl):
        o7l, o7r, o14 = stereo_roi_align_batched(
            tuple(fl), tuple(fl), zero_rois, zero_rois, strides, 7, 14,
            True)
        return (o7l ** 2).sum() + (o7r ** 2).sum() + (o14 ** 2).sum()

    g = jax.grad(loss)(list(feats))
    for gl in g:
        assert float(jnp.abs(gl).max()) == 0.0
