"""Full-checkpoint converter parity: a torch twin of the WHOLE Stereo R-CNN
(reference state_dict naming: RCNN_layer*/RCNN_toplayer/RCNN_rpn.RPN_*/
RCNN_fc6/RCNN_kpts_*) is converted via ``convert.stereo_import`` and must
match our flax model stage by stage — backbone+FPN features, RPN logits/
deltas, RCNN head outputs (incl. the NCHW->NHWC fc6 permutation), and the
keypoint branch (incl. exact ConvTranspose semantics).

This is the golden-parity harness of SURVEY.md §4 / VERDICT item 1: once
the real released ``.pth`` exists, ``tools/capture_golden.py`` feeds it
through the same converter; this test pins the conversion math so the only
thing left to verify against the real file is the NAME_MAP spelling.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stereo_rcnn_tpu.convert.stereo_import import (import_detector,  # noqa: E402
                                                   merge_params)
from stereo_rcnn_tpu.models.heads import KeypointHead, RCNNHead  # noqa: E402
from stereo_rcnn_tpu.models.resnet_fpn import ResNetFPN  # noqa: E402
from stereo_rcnn_tpu.models.stereo_rpn import StereoRPNHead  # noqa: E402

DEPTH = 26            # (2, 2, 2, 2) bottlenecks — fast but full-path
FPN_DIM = 64
FC_DIM = 128
KPT_DIM = 64
NUM_ANCHORS = 3
NUM_CLASSES = 2


# ---------------------------------------------------------------------------
# Torch twin with reference parameter naming.
# ---------------------------------------------------------------------------

class TorchBottleneck(tnn.Module):
    """Caffe-variant bottleneck: stride on the FIRST 1x1 conv."""

    def __init__(self, cin, width, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, width, 1, stride=stride, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width * 4)
        self.relu = tnn.ReLU()
        if stride != 1 or cin != width * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, width * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(width * 4))
        else:
            self.downsample = None

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idn)


class TorchStereoRCNN(tnn.Module):
    """Reference-named twin of our architecture (depth-26, small dims)."""

    def __init__(self):
        super().__init__()
        blocks = (2, 2, 2, 2)
        self.RCNN_layer0 = tnn.Sequential(
            tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False),
            tnn.BatchNorm2d(64), tnn.ReLU(),
            tnn.MaxPool2d(3, stride=2, padding=1))
        cin = 64
        layers = []
        for li, (width, n) in enumerate(zip((64, 128, 256, 512), blocks),
                                        start=1):
            stride = 1 if li == 1 else 2
            seq = []
            for b in range(n):
                seq.append(TorchBottleneck(cin, width,
                                           stride if b == 0 else 1))
                cin = width * 4
            layers.append(tnn.Sequential(*seq))
        (self.RCNN_layer1, self.RCNN_layer2, self.RCNN_layer3,
         self.RCNN_layer4) = layers

        d = FPN_DIM
        self.RCNN_toplayer = tnn.Conv2d(2048, d, 1)
        self.RCNN_latlayer1 = tnn.Conv2d(1024, d, 1)
        self.RCNN_latlayer2 = tnn.Conv2d(512, d, 1)
        self.RCNN_latlayer3 = tnn.Conv2d(256, d, 1)
        self.RCNN_smooth1 = tnn.Conv2d(d, d, 3, padding=1)
        self.RCNN_smooth2 = tnn.Conv2d(d, d, 3, padding=1)
        self.RCNN_smooth3 = tnn.Conv2d(d, d, 3, padding=1)

        class RPN(tnn.Module):
            def __init__(self):
                super().__init__()
                self.RPN_Conv = tnn.Conv2d(2 * d, 2 * d, 3, padding=1)
                self.RPN_cls_score = tnn.Conv2d(2 * d, NUM_ANCHORS * 2, 1)
                self.RPN_bbox_pred = tnn.Conv2d(2 * d, NUM_ANCHORS * 6, 1)
        self.RCNN_rpn = RPN()

        self.RCNN_fc6 = tnn.Linear(2 * d * 7 * 7, FC_DIM)
        self.RCNN_fc7 = tnn.Linear(FC_DIM, FC_DIM)
        self.RCNN_cls_score = tnn.Linear(FC_DIM, NUM_CLASSES)
        self.RCNN_bbox_pred = tnn.Linear(FC_DIM, NUM_CLASSES * 6)
        self.RCNN_dim_orien_pred = tnn.Linear(FC_DIM, NUM_CLASSES * 5)

        self.RCNN_kpts_conv1 = tnn.Conv2d(d, KPT_DIM, 3, padding=1)
        self.RCNN_kpts_conv2 = tnn.Conv2d(KPT_DIM, KPT_DIM, 3, padding=1)
        self.RCNN_kpts_deconv = tnn.ConvTranspose2d(KPT_DIM, KPT_DIM, 4,
                                                    stride=2, padding=1)
        self.RCNN_kpts_score = tnn.Conv2d(KPT_DIM, 6, 1)

    def backbone_fpn(self, x):
        c1 = self.RCNN_layer0(x)
        c2 = self.RCNN_layer1(c1)
        c3 = self.RCNN_layer2(c2)
        c4 = self.RCNN_layer3(c3)
        c5 = self.RCNN_layer4(c4)
        p5 = self.RCNN_toplayer(c5)

        def up_add(top, lat):
            # Reference-exact: resnet.py _upsample_add uses
            # F.upsample(..., mode='bilinear') to the lateral's size
            # (align_corners=False, the half-pixel-center convention —
            # same as jax.image.resize method='linear').
            up = tnn.functional.interpolate(
                top, size=lat.shape[2:], mode="bilinear",
                align_corners=False)
            return up + lat

        p4 = up_add(p5, self.RCNN_latlayer1(c4))
        p3 = up_add(p4, self.RCNN_latlayer2(c3))
        p2 = up_add(p3, self.RCNN_latlayer3(c2))
        p4 = self.RCNN_smooth1(p4)
        p3 = self.RCNN_smooth2(p3)
        p2 = self.RCNN_smooth3(p2)
        p6 = p5[:, :, ::2, ::2]
        return p2, p3, p4, p5, p6

    def rpn(self, feats_l, feats_r):
        logits, deltas = [], []
        relu = tnn.functional.relu
        for fl, fr in zip(feats_l, feats_r):
            x = torch.cat([fl, fr], dim=1)
            x = relu(self.RCNN_rpn.RPN_Conv(x))
            lg = self.RCNN_rpn.RPN_cls_score(x)      # [B, 2A, H, W]
            dl = self.RCNN_rpn.RPN_bbox_pred(x)      # [B, 6A, H, W]
            b, _, h, w = lg.shape
            # Match our flatten: NHWC row-major, anchor-minor, 2 last.
            lg = lg.permute(0, 2, 3, 1).reshape(b, h * w * NUM_ANCHORS, 2)
            dl = dl.permute(0, 2, 3, 1).reshape(b, h * w * NUM_ANCHORS, 6)
            logits.append(lg)
            deltas.append(dl)
        return torch.cat(logits, 1), torch.cat(deltas, 1)

    def heads(self, pooled_concat_nchw):
        relu = tnn.functional.relu
        r = pooled_concat_nchw.shape[0]
        x = pooled_concat_nchw.reshape(r, -1)
        x = relu(self.RCNN_fc6(x))
        x = relu(self.RCNN_fc7(x))
        return (self.RCNN_cls_score(x), self.RCNN_bbox_pred(x),
                self.RCNN_dim_orien_pred(x))

    def keypoints(self, pooled_left_nchw):
        relu = tnn.functional.relu
        x = relu(self.RCNN_kpts_conv1(pooled_left_nchw))
        x = relu(self.RCNN_kpts_conv2(x))
        x = relu(self.RCNN_kpts_deconv(x))
        x = self.RCNN_kpts_score(x)                  # [R, 6, G, G]
        return x.sum(dim=2)                          # [R, 6, G] (sum rows)


@pytest.fixture(scope="module")
def twin_and_params():
    torch.manual_seed(0)
    twin = TorchStereoRCNN()
    for mod in twin.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5)
            mod.running_var.uniform_(0.5, 2.0)
            mod.weight.data.uniform_(0.5, 1.5)
            mod.bias.data.normal_(0, 0.5)
    twin.eval()
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    converted, report = import_detector(sd, depth=DEPTH, pool=7,
                                        fpn_dim=FPN_DIM)
    # Everything in the twin must be claimed by a conversion rule.
    assert report["unclaimed"] == [], report["unclaimed"]
    return twin, converted


def test_backbone_fpn_parity(twin_and_params):
    twin, converted = twin_and_params
    model = ResNetFPN(depth=DEPTH, fpn_dim=FPN_DIM, dtype=jnp.float32,
                      stride_in_1x1=True, norm="frozen")
    rng = np.random.RandomState(0)
    img = rng.randn(1, 64, 128, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(img))
    # ResNetFPN initialised standalone has no "backbone_net" wrapper; merge
    # the converted backbone subtree at its top level.
    merged = merge_params(params, converted["backbone_net"])
    ours = model.apply(jax.tree.map(jnp.asarray, merged), jnp.asarray(img))
    with torch.no_grad():
        theirs = twin.backbone_fpn(
            torch.from_numpy(img.transpose(0, 3, 1, 2)))
    for our, their, name in zip(ours, theirs,
                                ("p2", "p3", "p4", "p5", "p6")):
        their_nhwc = their.numpy().transpose(0, 2, 3, 1)
        assert our.shape == their_nhwc.shape, name
        np.testing.assert_allclose(np.asarray(our), their_nhwc,
                                   atol=5e-3, rtol=1e-3, err_msg=name)


def test_rpn_head_parity(twin_and_params):
    twin, converted = twin_and_params
    head = StereoRPNHead(num_anchors=NUM_ANCHORS, conv_dim=2 * FPN_DIM,
                         dtype=jnp.float32)
    rng = np.random.RandomState(1)
    shapes = [(16, 32), (8, 16), (4, 8)]
    feats_l = [rng.randn(1, h, w, FPN_DIM).astype(np.float32)
               for h, w in shapes]
    feats_r = [rng.randn(1, h, w, FPN_DIM).astype(np.float32)
               for h, w in shapes]
    params = head.init(jax.random.PRNGKey(0),
                       [jnp.asarray(f) for f in feats_l],
                       [jnp.asarray(f) for f in feats_r])
    p = dict(params["params"])
    p.update(jax.tree.map(jnp.asarray, converted["rpn_head"]))
    logits, deltas = head.apply({"params": p},
                                [jnp.asarray(f) for f in feats_l],
                                [jnp.asarray(f) for f in feats_r])
    with torch.no_grad():
        tl = [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats_l]
        tr = [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats_r]
        t_logits, t_deltas = twin.rpn(tl, tr)
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(deltas), t_deltas.numpy(),
                               atol=2e-4, rtol=1e-4)


def test_rcnn_head_parity(twin_and_params):
    """Covers the fc6 NCHW->NHWC flatten permutation and all linear heads."""
    twin, converted = twin_and_params
    head = RCNNHead(num_classes=NUM_CLASSES, fc_dim=FC_DIM,
                    dtype=jnp.float32)
    rng = np.random.RandomState(2)
    pooled = rng.randn(5, 7, 7, 2 * FPN_DIM).astype(np.float32)  # NHWC
    params = head.init(jax.random.PRNGKey(0), jnp.asarray(pooled))
    p = dict(params["params"])
    p.update(jax.tree.map(jnp.asarray, converted["rcnn_head"]))
    out = head.apply({"params": p}, jnp.asarray(pooled))
    with torch.no_grad():
        t_cls, t_box, t_do = twin.heads(
            torch.from_numpy(pooled.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(out.cls_logits), t_cls.numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.box_deltas).reshape(5, -1), t_box.numpy(),
        atol=2e-4, rtol=1e-4)
    do = np.concatenate([np.asarray(out.dims),
                         np.asarray(out.orien)], axis=-1).reshape(5, -1)
    np.testing.assert_allclose(do, t_do.numpy(), atol=2e-4, rtol=1e-4)


def test_keypoint_head_parity(twin_and_params):
    """Covers conv + EXACT ConvTranspose2d(k4, s2, p1) conversion + score +
    row-marginalisation."""
    twin, converted = twin_and_params
    head = KeypointHead(grid=28, conv_dim=KPT_DIM, dtype=jnp.float32)
    rng = np.random.RandomState(3)
    pooled = rng.randn(4, 14, 14, FPN_DIM).astype(np.float32)
    params = head.init(jax.random.PRNGKey(0), jnp.asarray(pooled))
    p = dict(params["params"])
    p.update(jax.tree.map(jnp.asarray, converted["kpt_head"]))
    ours = head.apply({"params": p}, jnp.asarray(pooled))     # [R, 6, G]
    with torch.no_grad():
        theirs = twin.keypoints(
            torch.from_numpy(pooled.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               atol=5e-4, rtol=1e-4)
