"""ResNet-101 + FPN backbone, TPU-native (NHWC, bf16 compute, frozen BN).

Behavioral reference: ``lib/model/stereo_rcnn/resnet.py`` — ``ResNet``,
``Bottleneck``, and the FPN layers ``RCNN_toplayer`` / ``RCNN_latlayer1-3``
/ ``RCNN_smooth1-3``; caffe-style variant: BGR input with mean subtraction
only (no std), stride on the FIRST 1x1 conv of each bottleneck, BatchNorm
frozen everywhere (affine constants), conv1+layer1 frozen
(cfg.RESNET.FIXED_BLOCKS=1).

TPU design notes:
  * NHWC layout throughout — XLA's preferred conv layout on TPU.
  * Params stay float32; compute (conv inputs/outputs) in bfloat16 so the
    convs hit the MXU at full rate.
  * Frozen BN is an affine y = x * scale + bias with ``stop_gradient`` on
    the constants, so it fuses into the adjacent conv at XLA level.
  * Freezing of early stages is implemented with ``stop_gradient`` on the
    stage output (equivalent to requires_grad=False when those params feed
    nothing else).
  * The left/right streams SHARE this module's weights — the caller simply
    applies it twice (SURVEY.md §3.4 fact 1); under jit the two applications
    can also be batched as a size-2 batch axis, which is what
    :func:`stereo_rcnn_tpu.models.detector` does for MXU efficiency.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

STAGE_BLOCKS = {26: (2, 2, 2, 2), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3),
                152: (3, 8, 36, 3)}


class GroupNorm32(nn.Module):
    """GroupNorm(32) — the norm option for training WITHOUT pretrained BN
    constants.  Identity-initialised FrozenBatchNorm makes a 100-layer
    network's activations explode (observed: softmax saturation at init);
    GroupNorm is batch-size-independent (detectors train at batch 1-2/chip)
    and needs no statistics transfer."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        groups = min(32, self.features)
        return nn.GroupNorm(num_groups=groups, dtype=self.dtype,
                            name="gn")(x)


class FrozenBatchNorm(nn.Module):
    """BatchNorm with statistics and affine folded into fixed scale/bias.

    Parameters are initialised to identity; a weight converter can load
    ``scale = gamma / sqrt(var + eps)`` and ``bias = beta - mean * scale``.
    Gradients are stopped — these never train (reference freezes all BN).
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        scale = jax.lax.stop_gradient(scale).astype(self.dtype)
        bias = jax.lax.stop_gradient(bias).astype(self.dtype)
        return x * scale + bias


class Bottleneck(nn.Module):
    """ResNet bottleneck.

    ``stride_in_1x1=True`` is the caffe variant the reference uses (stride
    on the first 1x1 conv); ``False`` is torchvision's v1 (stride on the
    3x3) — supported so torchvision-lineage checkpoints convert exactly.
    """

    features: int           # bottleneck width; output is 4x this
    stride: int = 1
    dtype: Any = jnp.bfloat16
    stride_in_1x1: bool = True
    norm: str = "frozen"    # "frozen" (pretrained constants) | "group"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        norm_cls = FrozenBatchNorm if self.norm == "frozen" else GroupNorm32
        out_features = self.features * 4
        residual = x
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride
        y = nn.Conv(self.features, (1, 1), strides=(s1, s1),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = norm_cls(self.features, self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(s3, s3),
                    padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = norm_cls(self.features, self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = norm_cls(out_features, self.dtype, name="bn3")(y)
        if residual.shape[-1] != out_features or self.stride != 1:
            residual = nn.Conv(out_features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = norm_cls(out_features, self.dtype,
                                name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetFPN(nn.Module):
    """ResNet-{50,101,152} + FPN producing P2..P6 (256ch each).

    Returns a tuple of 5 NHWC feature maps at strides (4, 8, 16, 32, 64).
    """

    depth: int = 101
    fpn_dim: int = 256
    frozen_stages: int = 1      # cfg.RESNET.FIXED_BLOCKS
    dtype: Any = jnp.bfloat16
    stride_in_1x1: bool = True  # caffe variant (the reference's lineage)
    norm: str = "frozen"        # "frozen" for converted weights, "group"
                                # for from-scratch training

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        blocks = STAGE_BLOCKS[self.depth]
        x = x.astype(self.dtype)

        # Stem: conv1 7x7/2 + maxpool 3x3/2.
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        norm_cls = FrozenBatchNorm if self.norm == "frozen" else GroupNorm32
        x = norm_cls(64, self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if self.norm == "frozen" and self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        stages = []
        widths = (64, 128, 256, 512)
        for stage_idx, (width, n_blocks) in enumerate(zip(widths, blocks)):
            stride = 1 if stage_idx == 0 else 2
            for b in range(n_blocks):
                x = Bottleneck(width, stride if b == 0 else 1, self.dtype,
                               stride_in_1x1=self.stride_in_1x1,
                               norm=self.norm,
                               name=f"layer{stage_idx + 1}_{b}")(x)
            if self.norm == "frozen" and stage_idx + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            stages.append(x)
        c2, c3, c4, c5 = stages

        # FPN. Reference names: RCNN_toplayer (C5->P5), RCNN_latlayer1-3,
        # RCNN_smooth1-3.  P6 = stride-2 subsample of P5 (RPN-only level).
        p5 = nn.Conv(self.fpn_dim, (1, 1), dtype=self.dtype,
                     name="fpn_top")(c5)
        p4 = self._upsample_add(
            p5, nn.Conv(self.fpn_dim, (1, 1), dtype=self.dtype,
                        name="fpn_lat4")(c4))
        p3 = self._upsample_add(
            p4, nn.Conv(self.fpn_dim, (1, 1), dtype=self.dtype,
                        name="fpn_lat3")(c3))
        p2 = self._upsample_add(
            p3, nn.Conv(self.fpn_dim, (1, 1), dtype=self.dtype,
                        name="fpn_lat2")(c2))
        p4 = nn.Conv(self.fpn_dim, (3, 3), padding=[(1, 1), (1, 1)],
                     dtype=self.dtype, name="fpn_smooth4")(p4)
        p3 = nn.Conv(self.fpn_dim, (3, 3), padding=[(1, 1), (1, 1)],
                     dtype=self.dtype, name="fpn_smooth3")(p3)
        p2 = nn.Conv(self.fpn_dim, (3, 3), padding=[(1, 1), (1, 1)],
                     dtype=self.dtype, name="fpn_smooth2")(p2)
        p6 = nn.max_pool(p5, (1, 1), strides=(2, 2))
        return p2, p3, p4, p5, p6

    @staticmethod
    def _upsample_add(top: jnp.ndarray, lateral: jnp.ndarray) -> jnp.ndarray:
        """Nearest-neighbour 2x upsample of `top` + lateral (cheap on VPU;
        the reference uses bilinear — nearest is the standard FPN choice and
        is noted as a deliberate deviation)."""
        b, h, w, c = lateral.shape
        up = jnp.repeat(jnp.repeat(top, 2, axis=1), 2, axis=2)
        return up[:, :h, :w, :] + lateral
