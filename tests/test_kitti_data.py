import dataclasses
import os

import numpy as np
import pytest

from stereo_rcnn_tpu.config import tiny_test_config
from stereo_rcnn_tpu.data import (KittiDataset, KittiPipeline, random_scene,
                                  render_pair, write_kitti_frame)
from stereo_rcnn_tpu.geometry import default_kitti_calib
from stereo_rcnn_tpu.utils.host_preproc import (native_available,
                                                resize_subtract_pad)


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    """Synthetic KITTI tree with 4 frames."""
    root = str(tmp_path_factory.mktemp("kitti"))
    calib = default_kitti_calib()
    rng = np.random.RandomState(0)
    h, w = 375, 1242
    for i in range(4):
        objs = random_scene(rng, 3, calib, h, w)
        left, right = render_pair(objs, calib, h, w, rng)
        write_kitti_frame(root, f"{i:06d}", objs, calib, left, right)
    return root


def test_dataset_reader(kitti_root):
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, kitti_root=kitti_root))
    ds = KittiDataset(cfg.data)
    assert len(ds) == 4
    annos, calib = ds.load_annotation(0, 1242.0)
    assert len(annos) >= 1
    a = annos[0]
    # Right box sits left of the left box (positive disparity) and shares
    # vertical extent.
    assert a.box_right[0] < a.box_left[0]
    np.testing.assert_allclose(a.box_right[1], a.box_left[1])
    assert 0 <= a.kpt_type < 4
    assert a.border_u[0] < a.border_u[1]
    assert float(calib.baseline) > 0.5


def test_pipeline_batches(kitti_root):
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, kitti_root=kitti_root))
    ds = KittiDataset(cfg.data)
    pipe = KittiPipeline(cfg, ds, batch_size=2, shuffle=False,
                         image_ext=".npy")
    batches = list(pipe)
    assert len(batches) == 2
    pb = batches[0]
    il, gt = pb.images_left, pb.gt
    assert il.shape == (2, cfg.data.image_h, cfg.data.image_w, 3)
    assert il.dtype == np.float32
    assert gt.left.shape == (2, cfg.train.max_gt_boxes, 4)
    assert pb.n_valid == 2
    # Per-frame calib is batched and scaled to working resolution.
    assert pb.calib.f.shape == (2,)
    assert np.allclose(pb.calib.f, 721.5377 * pb.scales, rtol=1e-5)
    # Letterboxed content extent: source 1242x375 scaled by the per-frame
    # factor; smaller than the canvas on whichever axis doesn't bind.
    assert pb.content_wh.shape == (2, 2)
    assert np.allclose(pb.content_wh[:, 0], 1242 * pb.scales, rtol=1e-5)
    assert np.allclose(pb.content_wh[:, 1], 375 * pb.scales, rtol=1e-5)
    assert (pb.content_wh[:, 0] <= cfg.data.image_w + 1e-3).all()
    assert (pb.content_wh[:, 1] <= cfg.data.image_h + 1e-3).all()
    # Scaled gt boxes must lie inside the padded image.
    v = gt.valid
    assert (gt.left[v][:, 2] <= cfg.data.image_w + 1).all()
    assert (gt.left[v][:, 3] <= cfg.data.image_h + 1).all()
    # 3D pose rides along in metric units.
    assert np.abs(gt.location[v][:, 2]).max() > 5.0


def test_pipeline_ragged_tail_padded(kitti_root):
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, kitti_root=kitti_root))
    ds = KittiDataset(cfg.data)           # 4 frames
    pipe = KittiPipeline(cfg, ds, batch_size=3, shuffle=False,
                         image_ext=".npy")
    batches = list(pipe)
    assert len(batches) == 2 == pipe.steps_per_epoch()
    assert batches[0].n_valid == 3
    tail = batches[1]
    assert tail.n_valid == 1
    assert tail.images_left.shape[0] == 3   # static shape, padded
    # Pad replicas wrap around to the start of the epoch order (frames
    # 0, 1), not a repeat of the final frame.
    np.testing.assert_array_equal(tail.images_left[1],
                                  batches[0].images_left[0])
    np.testing.assert_array_equal(tail.images_left[2],
                                  batches[0].images_left[1])


def test_native_preproc_matches_numpy():
    rng = np.random.RandomState(1)
    src = rng.randint(0, 255, (100, 200, 3), dtype=np.uint8)
    means = (102.98, 115.95, 122.77)
    ref = resize_subtract_pad(src, 64, 128, 0.6, means, force_numpy=True)
    if not native_available():
        pytest.skip("no C++ toolchain")
    out = resize_subtract_pad(src, 64, 128, 0.6, means)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=0.75)   # rounding differences
    # Padding region is exactly zero in both.
    assert (out[62:] == 0).all() and (ref[62:] == 0).all()


def test_pipeline_tail_pads_with_wraparound_frames():
    """The ragged tail pads with wrap-around frames from this epoch's
    order — NOT by repeating the last frame (which over-weighted that one
    frame in training every epoch; round-2 advisor finding)."""
    import types
    import numpy as np
    from stereo_rcnn_tpu.data.pipeline import KittiPipeline

    fake = types.SimpleNamespace(
        ds=types.SimpleNamespace(__len__=lambda self: 10),
        shuffle=False, rng=np.random.RandomState(0), batch_size=4)
    fake.ds = [None] * 10          # only len() is used
    batches, counts = KittiPipeline._epoch_indices(fake)
    assert batches.shape == (3, 4)
    assert counts == [4, 4, 2]
    tail = batches[-1]
    np.testing.assert_array_equal(tail[:2], [8, 9])      # real frames
    np.testing.assert_array_equal(tail[2:], [0, 1])      # wrap-around pad
