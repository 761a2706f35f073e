"""Parity switch for the perspective-keypoint softmax semantics.

SURVEY.md §3.4 fact 5 (reference: stereo_rcnn.py keypoint branch) is
explicitly UNCERTAIN whether the 4 corner-type channels form one joint
(4 x G)-bin categorical or four independent G-bin categoricals.  Like the
box convention, `rcnn.kpt_softmax` makes both semantics first-class so
parity day is a config flip: these tests pin each mode's loss and decode
numerically against independent numpy references and prove the flag
threads end to end.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_rcnn_tpu.config import tiny_test_config
from stereo_rcnn_tpu.models.detector import decode_keypoints
from stereo_rcnn_tpu.models.heads import RCNNOutputs
from stereo_rcnn_tpu.train.losses import rcnn_losses
from stereo_rcnn_tpu.train.targets import RoiTargets


def _np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _random_targets(rng, s, g):
    """Minimal RoiTargets exercising only the keypoint terms."""
    z = np.zeros
    return RoiTargets(
        rois_left=jnp.asarray(rng.uniform(0, 100, (s, 4)), jnp.float32),
        rois_right=jnp.asarray(rng.uniform(0, 100, (s, 4)), jnp.float32),
        cls=jnp.asarray(rng.integers(0, 2, (s,)), jnp.int32),
        weights=jnp.ones((s,), jnp.float32),
        box_targets=jnp.asarray(z((s, 6)), jnp.float32),
        dim_targets=jnp.asarray(z((s, 3)), jnp.float32),
        orien_targets=jnp.asarray(z((s, 2)), jnp.float32),
        kpt_bin=jnp.asarray(rng.integers(0, 4 * g, (s,)), jnp.int32),
        kpt_weight=jnp.asarray(rng.integers(0, 2, (s,)), jnp.float32),
        border_bins=jnp.asarray(rng.integers(0, g, (s, 2)), jnp.int32),
        border_weight=jnp.asarray(rng.integers(0, 2, (s,)), jnp.float32),
        num_fg=jnp.asarray(s, jnp.int32),
    )


def _zero_outputs(s, ncls):
    z = jnp.zeros
    return RCNNOutputs(cls_logits=z((s, ncls)), box_deltas=z((s, ncls, 6)),
                       dims=z((s, ncls, 3)), orien=z((s, ncls, 2)))


@pytest.mark.parametrize("mode", ["joint", "per_channel"])
def test_kpt_loss_matches_numpy_reference(mode):
    rng = np.random.default_rng(0)
    s, g = 16, 8
    kl = rng.normal(size=(s, 6, g)).astype(np.float32)
    tgt = _random_targets(rng, s, g)
    out = _zero_outputs(s, 2)

    losses = rcnn_losses(out, jnp.asarray(kl), tgt, kpt_softmax=mode)
    got = float(losses["kpt"])

    kpt_bin = np.asarray(tgt.kpt_bin)
    kw = np.asarray(tgt.kpt_weight)
    bw = np.asarray(tgt.border_weight)
    bb = np.asarray(tgt.border_bins)
    if mode == "joint":
        p = _np_softmax(kl[:, :4, :].reshape(s, 4 * g))
        ce = -np.log(p[np.arange(s), kpt_bin])
    else:
        p = _np_softmax(kl[:, :4, :])                      # [S, 4, G]
        ce = -np.log(p[np.arange(s), kpt_bin // g, kpt_bin % g])
    pb = _np_softmax(kl[:, 4, :])
    pb2 = _np_softmax(kl[:, 5, :])
    bce = (-np.log(pb[np.arange(s), bb[:, 0]])
           - np.log(pb2[np.arange(s), bb[:, 1]]))
    want = ((ce * kw).sum() + (bce * bw).sum()) / max(kw.sum() + bw.sum(), 1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("mode", ["joint", "per_channel"])
def test_kpt_decode_matches_numpy_reference(mode):
    rng = np.random.default_rng(1)
    d, g = 32, 8
    kl = rng.normal(size=(d, 6, g)).astype(np.float32) * 3.0
    rois = np.stack([np.full(d, 10.0), np.full(d, 5.0),
                     rng.uniform(30, 90, d).astype(np.float32),
                     np.full(d, 40.0)], axis=1).astype(np.float32)

    ku, kt, pk, bu = decode_keypoints(jnp.asarray(kl), jnp.asarray(rois),
                                      kpt_softmax=mode)

    if mode == "joint":
        p = _np_softmax(kl[:, :4, :].reshape(d, 4 * g))
    else:
        p = _np_softmax(kl[:, :4, :]).reshape(d, 4 * g)
    flat = p.argmax(-1)
    w = np.maximum(rois[:, 2] - rois[:, 0], 1e-3)
    np.testing.assert_array_equal(np.asarray(kt), flat // g)
    np.testing.assert_allclose(np.asarray(ku),
                               rois[:, 0] + (flat % g + 0.5) / g * w,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pk), p[np.arange(d), flat],
                               rtol=1e-5)
    # Boundary channels are mode-independent.
    bbin = kl[:, 4:6, :].argmax(-1)
    np.testing.assert_allclose(
        np.asarray(bu), rois[:, 0:1] + (bbin + 0.5) / g * w[:, None],
        rtol=1e-5)


def test_modes_disagree_on_crafted_logits():
    """The two semantics are genuinely different decoders: a channel with a
    FLAT distribution but one large logit loses to a peaked channel under
    per-channel normalisation, while the raw joint argmax picks it."""
    g = 8
    kl = np.zeros((1, 6, g), np.float32)
    # Channel 0: uniformly large logits (flat per-channel softmax ~1/g).
    kl[0, 0, :] = 5.0
    # Channel 1: one sharp peak above a low floor (per-channel prob ~1).
    kl[0, 1, :] = -5.0
    kl[0, 1, 3] = 4.0
    rois = jnp.asarray([[0.0, 0.0, 80.0, 40.0]])
    _, kt_j, _, _ = decode_keypoints(jnp.asarray(kl), rois, "joint")
    _, kt_c, _, _ = decode_keypoints(jnp.asarray(kl), rois, "per_channel")
    assert int(kt_j[0]) == 0          # joint: channel 0's 5.0 logits win
    assert int(kt_c[0]) == 1          # per-channel: channel 1's peak wins


def test_unknown_mode_raises():
    kl = jnp.zeros((1, 6, 4))
    rois = jnp.zeros((1, 4))
    with pytest.raises(ValueError, match="kpt_softmax"):
        decode_keypoints(kl, rois, "nonsense")
    rng = np.random.default_rng(2)
    tgt = _random_targets(rng, 4, 4)
    with pytest.raises(ValueError, match="kpt_softmax"):
        rcnn_losses(_zero_outputs(4, 2), jnp.zeros((4, 6, 4)), tgt,
                    kpt_softmax="nonsense")


def test_flag_threads_from_config():
    """cfg.rcnn.kpt_softmax reaches both the training loss and the
    inference decode (detector.run_keypoints / train step partials)."""
    cfg = tiny_test_config()
    assert cfg.rcnn.kpt_softmax == "joint"
    pc = cfg.replace(
        rcnn=dataclasses.replace(cfg.rcnn, kpt_softmax="per_channel"))
    assert pc.rcnn.kpt_softmax == "per_channel"
    # YAML/CLI path uses the nested-override machinery.
    from stereo_rcnn_tpu.config import _update_dataclass
    pc2 = _update_dataclass(cfg, {"rcnn": {"kpt_softmax": "per_channel"}})
    assert pc2.rcnn.kpt_softmax == "per_channel"
