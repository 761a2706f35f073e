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


def test_fused_stereo_kernel_matches_xla(pyramid):
    feats, strides, h, w = pyramid
    r = np.random.RandomState(3)
    rois_l, rois_r = [], []
    for size in (40, 90, 180):
        for _ in range(3):
            x1 = r.uniform(30, w - size - 30) if w - size - 60 > 0 else 30
            y1 = r.uniform(8, max(h - size // 2 - 8, 9))
            box = [x1, y1, x1 + size, min(y1 + size / 2, h - 4.0)]
            rois_l.append(box)
            rois_r.append([box[0] - 10, box[1], box[2] - 10, box[3]])
    rois_l = jnp.asarray(np.asarray(rois_l, np.float32))
    rois_r = jnp.asarray(np.asarray(rois_r, np.float32))

    from stereo_rcnn_tpu.ops.roi_align_pallas import stereo_roi_align_pallas
    out7l, out7r, out14l = stereo_roi_align_pallas(
        feats, feats, rois_l, rois_r, strides, 7, 14, interpret=True)
    ref7l = multilevel_roi_align(feats, rois_l, strides, 7, 2)
    ref7r = multilevel_roi_align(feats, rois_r, strides, 7, 2)
    ref14l = multilevel_roi_align(feats, rois_l, strides, 14, 1)
    np.testing.assert_allclose(np.asarray(out7l), np.asarray(ref7l),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out7r), np.asarray(ref7r),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out14l), np.asarray(ref14l),
                               atol=2e-3, rtol=1e-3)


def test_atlas_stereo_kernel_matches_per_level_kernel(pyramid):
    """The branchless atlas forward must reproduce the per-level-branch
    kernel (and hence the XLA reference) exactly: garbage atlas cells
    beyond a level's extent carry exactly-zero hat weights."""
    feats, strides, h, w = pyramid
    r = np.random.RandomState(9)
    rois_l, rois_r = [], []
    # Sizes spanning every level assignment, INCLUDING border-clamped and
    # tiny P2 rois, plus a zero-area padded roi.
    for size in (16, 40, 90, 180, 230):
        for _ in range(3):
            x1 = r.uniform(0, max(w - size, 1))
            y1 = r.uniform(0, max(h - size / 2, 1))
            box = [x1, y1, min(x1 + size, w - 1.0),
                   min(y1 + size / 2, h - 1.0)]
            rois_l.append(box)
            rois_r.append([max(box[0] - 12, 0.0), box[1],
                           max(box[2] - 12, 1.0), box[3]])
    rois_l.append([0.0, 0.0, 0.0, 0.0])
    rois_r.append([0.0, 0.0, 0.0, 0.0])
    rois_l = jnp.asarray(np.asarray(rois_l, np.float32))
    rois_r = jnp.asarray(np.asarray(rois_r, np.float32))

    from stereo_rcnn_tpu.ops.roi_align_pallas import (
        stereo_roi_align_pallas, stereo_roi_align_pallas_atlas)
    ref = stereo_roi_align_pallas(feats, feats, rois_l, rois_r, strides,
                                  7, 14, interpret=True)
    out = stereo_roi_align_pallas_atlas(feats, feats, rois_l, rois_r,
                                        strides, 7, 14, interpret=True)
    for o, rf in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(rf),
                                   atol=1e-5, rtol=1e-5)
    # The padded zero-area roi produced exactly zero output.
    assert float(jnp.abs(out[0][-1]).max()) == 0.0


def test_fused_stereo_kernel_packed_parity(pyramid):
    """packed_out=True (single merged output block, the production path)
    must be BIT-identical to the unpacked kernel — same f32 sampling, only
    the output copy layout differs."""
    feats, strides, h, w = pyramid
    r = np.random.RandomState(7)
    rois_l, rois_r = [], []
    for size in (30, 70, 150, 300):
        for _ in range(2):
            x1 = r.uniform(20, max(w - size - 20, 21))
            y1 = r.uniform(8, max(h - size // 2 - 8, 9))
            box = [x1, y1, min(x1 + size, w - 2.0),
                   min(y1 + size / 2, h - 4.0)]
            rois_l.append(box)
            rois_r.append([box[0] - 12, box[1], box[2] - 12, box[3]])
    rois_l.append([0.0, 0.0, 0.0, 0.0])            # padded zero-area roi
    rois_r.append([0.0, 0.0, 0.0, 0.0])
    rois_l = jnp.asarray(np.asarray(rois_l, np.float32))
    rois_r = jnp.asarray(np.asarray(rois_r, np.float32))

    from stereo_rcnn_tpu.ops.roi_align_pallas import stereo_roi_align_pallas
    base = stereo_roi_align_pallas(feats, feats, rois_l, rois_r, strides,
                                   7, 14, interpret=True)
    packed = stereo_roi_align_pallas(feats, feats, rois_l, rois_r, strides,
                                     7, 14, interpret=True, packed_out=True)
    for b, pk in zip(base, packed):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(pk))


def test_fused_stereo_kernel_group_parity(pyramid):
    """group>1 (multiple rois per grid step) must be bit-identical to
    group=1, including the padded tail when R % group != 0."""
    feats, strides, h, w = pyramid
    r = np.random.RandomState(9)
    rois_l, rois_r = [], []
    for size in (40, 90, 180):
        for _ in range(3):                           # 9 rois: odd for pad
            x1 = r.uniform(20, max(w - size - 20, 21))
            y1 = r.uniform(8, max(h - size // 2 - 8, 9))
            box = [x1, y1, min(x1 + size, w - 2.0),
                   min(y1 + size / 2, h - 4.0)]
            rois_l.append(box)
            rois_r.append([box[0] - 12, box[1], box[2] - 12, box[3]])
    rois_l = jnp.asarray(np.asarray(rois_l, np.float32))
    rois_r = jnp.asarray(np.asarray(rois_r, np.float32))

    from stereo_rcnn_tpu.ops.roi_align_pallas import stereo_roi_align_pallas
    base = stereo_roi_align_pallas(feats, feats, rois_l, rois_r, strides,
                                   7, 14, interpret=True, packed_out=True)
    for g in (2, 4):
        out = stereo_roi_align_pallas(feats, feats, rois_l, rois_r,
                                      strides, 7, 14, interpret=True,
                                      packed_out=True, group=g)
        for b_, o_ in zip(base, out):
            np.testing.assert_array_equal(np.asarray(b_), np.asarray(o_))


def test_fused_stereo_kernel_kron_bf16_parity(pyramid):
    """kron_bf16 (single-matmul bf16 sampling weights — the bench/serving
    inference knob) must track the XLA reference within bf16-weight
    tolerance: ~2^-9 relative on each of <=4 taps per sample."""
    feats, strides, h, w = pyramid
    r = np.random.RandomState(5)
    rois_l, rois_r = [], []
    for size in (40, 90, 180):
        for _ in range(3):
            x1 = r.uniform(30, w - size - 30) if w - size - 60 > 0 else 30
            y1 = r.uniform(8, max(h - size // 2 - 8, 9))
            box = [x1, y1, x1 + size, min(y1 + size / 2, h - 4.0)]
            rois_l.append(box)
            rois_r.append([box[0] - 10, box[1], box[2] - 10, box[3]])
    rois_l = jnp.asarray(np.asarray(rois_l, np.float32))
    rois_r = jnp.asarray(np.asarray(rois_r, np.float32))

    from stereo_rcnn_tpu.ops.roi_align_pallas import stereo_roi_align_pallas
    out = stereo_roi_align_pallas(feats, feats, rois_l, rois_r, strides,
                                  7, 14, interpret=True,
                                  hat_dtype="kron_bf16", packed_out=True)
    refs = (multilevel_roi_align(feats, rois_l, strides, 7, 2),
            multilevel_roi_align(feats, rois_r, strides, 7, 2),
            multilevel_roi_align(feats, rois_l, strides, 14, 1))
    for o, rf in zip(out, refs):
        np.testing.assert_allclose(np.asarray(o), np.asarray(rf),
                                   atol=2e-2, rtol=1e-2)


def test_fused_stereo_kernel_hilo_parity(pyramid):
    """hat_dtype='hilo' (two-pass bf16 hat matmuls, ~2^-17 relative error
    — see _sample_grid) must hold the SAME parity tolerance vs the XLA
    reference as the f32 path; bf16 single-pass is the one that may not."""
    feats, strides, h, w = pyramid
    r = np.random.RandomState(5)
    rois_l, rois_r = [], []
    for size in (40, 90, 180):
        for _ in range(3):
            x1 = r.uniform(30, w - size - 30) if w - size - 60 > 0 else 30
            y1 = r.uniform(8, max(h - size // 2 - 8, 9))
            box = [x1, y1, x1 + size, min(y1 + size / 2, h - 4.0)]
            rois_l.append(box)
            rois_r.append([box[0] - 10, box[1], box[2] - 10, box[3]])
    rois_l = jnp.asarray(np.asarray(rois_l, np.float32))
    rois_r = jnp.asarray(np.asarray(rois_r, np.float32))

    from stereo_rcnn_tpu.ops.roi_align_pallas import stereo_roi_align_pallas
    out = stereo_roi_align_pallas(feats, feats, rois_l, rois_r, strides,
                                  7, 14, interpret=True, hat_dtype="hilo")
    refs = (multilevel_roi_align(feats, rois_l, strides, 7, 2),
            multilevel_roi_align(feats, rois_r, strides, 7, 2),
            multilevel_roi_align(feats, rois_l, strides, 14, 1))
    for o, rf in zip(out, refs):
        np.testing.assert_allclose(np.asarray(o), np.asarray(rf),
                                   atol=2e-3, rtol=1e-3)
