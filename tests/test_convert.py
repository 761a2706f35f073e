"""Weight-converter parity: a torch ResNet (eval-mode BN) and our converted
flax backbone must produce matching stage features — the golden-parity
strategy of SURVEY.md §4 applied to the backbone."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from stereo_rcnn_tpu.convert.resnet_import import import_resnet_backbone
from stereo_rcnn_tpu.models.resnet_fpn import ResNetFPN


def _make_torch_resnet50():
    """Minimal torch ResNet-50 with torchvision's parameter naming (no
    torchvision in this environment)."""
    import torch.nn as nn

    class Bottleneck(nn.Module):
        def __init__(self, cin, width, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(width, width, 3, stride=stride,
                                   padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(width * 4)
            self.relu = nn.ReLU()
            if stride != 1 or cin != width * 4:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, width * 4, 1, stride=stride, bias=False),
                    nn.BatchNorm2d(width * 4))
            else:
                self.downsample = None

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return self.relu(y + idn)

    class ResNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3,
                                   bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            cin = 64
            for li, (width, n, stride) in enumerate(
                    [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)],
                    start=1):
                blocks = []
                for b in range(n):
                    blocks.append(Bottleneck(cin, width,
                                             stride if b == 0 else 1))
                    cin = width * 4
                setattr(self, f"layer{li}", nn.Sequential(*blocks))

        def forward(self, x):
            raise NotImplementedError

    return ResNet()


def _torch_resnet50():
    m = _make_torch_resnet50()
    torch.manual_seed(0)
    # Randomise BN stats so folding is actually exercised.
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5)
            mod.running_var.uniform_(0.5, 2.0)
            mod.weight.data.uniform_(0.5, 1.5)
            mod.bias.data.normal_(0, 0.5)
    m.eval()
    return m


def test_backbone_matches_torch():
    m = _torch_resnet50()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    converted = import_resnet_backbone(sd, depth=50)

    model = ResNetFPN(depth=50, dtype=jnp.float32, stride_in_1x1=False)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    p = {**params["params"]}
    for k, v in converted.items():
        p[k] = jax.tree.map(jnp.asarray, v)
    params = {"params": p}

    rng = np.random.RandomState(0)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)

    feats = model.apply(params, jnp.asarray(img))

    with torch.no_grad():
        t = torch.from_numpy(img.transpose(0, 3, 1, 2))
        y = m.conv1(t)
        y = m.bn1(y)
        y = m.relu(y)
        y = m.maxpool(y)
        c2 = m.layer1(y)
        c3 = m.layer2(c2)
        c4 = m.layer3(c3)
        c5 = m.layer4(c4)

    # Our FPN consumes c2..c5; compare c5 by re-running just the stages.
    # The FPN convs are freshly initialised, so compare the raw stage
    # features instead: recompute them with a stage-truncated apply.
    from flax import linen as fnn

    class Stages(fnn.Module):
        depth: int = 50
        dtype: object = jnp.float32
        stride_in_1x1: bool = False

        @fnn.compact
        def __call__(self, x):
            from flax import linen as nn
            from stereo_rcnn_tpu.models.resnet_fpn import (Bottleneck,
                                                           FrozenBatchNorm,
                                                           STAGE_BLOCKS)
            blocks = STAGE_BLOCKS[self.depth]
            x = x.astype(self.dtype)
            x = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
            x = FrozenBatchNorm(64, self.dtype, name="bn1")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)])
            outs = []
            widths = (64, 128, 256, 512)
            for stage_idx, (width, n_blocks) in enumerate(
                    zip(widths, blocks)):
                stride = 1 if stage_idx == 0 else 2
                for bi in range(n_blocks):
                    x = Bottleneck(width, stride if bi == 0 else 1,
                                   self.dtype,
                                   stride_in_1x1=self.stride_in_1x1,
                                   name=f"layer{stage_idx + 1}_{bi}")(x)
                outs.append(x)
            return outs

    stages = Stages(depth=50, dtype=jnp.float32, stride_in_1x1=False)
    ours = stages.apply(params, jnp.asarray(img))
    for our, theirs, name in zip(
            ours, (c2, c3, c4, c5), ("c2", "c3", "c4", "c5")):
        theirs_nhwc = theirs.numpy().transpose(0, 2, 3, 1)
        assert our.shape == theirs_nhwc.shape, name
        np.testing.assert_allclose(np.asarray(our), theirs_nhwc,
                                   atol=2e-3, rtol=1e-3, err_msg=name)
