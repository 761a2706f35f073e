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

STAGE_BLOCKS = {10: (1, 1, 1, 1), 26: (2, 2, 2, 2), 50: (3, 4, 6, 3),
                101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


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
        if (self.is_mutable_collection("norm_stats")
                and not self.is_initializing()):
            # Calibration capture (convert/norm_calibrate.py): per-channel
            # pooled moments of this site's INPUT, exactly as GroupNorm
            # groups them.  Total variance over the batch = E[var_g] +
            # Var[mu_g] (law of total variance), broadcast group -> channel.
            xs = x.astype(jnp.float32)
            n, h, w, c = xs.shape
            xg = xs.reshape(n, h * w, groups, c // groups)
            mu = xg.mean(axis=(1, 3))                            # [n, g]
            var = ((xg - mu[:, None, :, None]) ** 2).mean(axis=(1, 3))
            rep = c // groups
            self.sow("norm_stats", "mu", jnp.repeat(mu.mean(0), rep))
            self.sow("norm_stats", "var",
                     jnp.repeat(var.mean(0) + mu.var(0), rep))
        return nn.GroupNorm(num_groups=groups, dtype=self.dtype,
                            name="gn")(x)


class FrozenBatchNorm(nn.Module):
    """BatchNorm with statistics and affine folded into fixed scale/bias.

    Parameters are initialised to identity; a weight converter can load
    ``scale = gamma / sqrt(var + eps)`` and ``bias = beta - mean * scale``.
    Gradients are stopped — these never train (reference freezes all BN).

    ``trainable=True`` turns this into a per-channel affine (the "affine"
    norm option): IDENTICAL forward computation and parameter tree, but the
    scale/bias DO receive gradients, and ``zero_init`` zero-initialises the
    scale (the standard zero-gamma residual trick) so a deep norm-free
    ResNet starts as an identity stack and trains stably from scratch.
    Because forward and tree match the frozen variant exactly, a checkpoint
    trained in affine mode restores into the default frozen-BN inference
    program with no recompile.
    """

    features: int
    dtype: Any = jnp.bfloat16
    trainable: bool = False
    zero_init: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale_init = (nn.initializers.zeros if self.zero_init
                      else nn.initializers.ones)
        scale = self.param("scale", scale_init, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        if not self.trainable:
            scale = jax.lax.stop_gradient(scale)
            bias = jax.lax.stop_gradient(bias)
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


def _norm(norm: str, features: int, dtype: Any, name: str,
          zero_init: bool = False) -> nn.Module:
    """norm options: "frozen" (pretrained constants, reference setup),
    "affine" (trainable scale/bias, zero-gamma — from-scratch training with
    a frozen-BN-compatible tree), "group" (GroupNorm)."""
    if norm == "group":
        return GroupNorm32(features, dtype, name=name)
    return FrozenBatchNorm(features, dtype, trainable=(norm == "affine"),
                           zero_init=zero_init and norm == "affine",
                           name=name)


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
        out_features = self.features * 4
        residual = x
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride
        y = nn.Conv(self.features, (1, 1), strides=(s1, s1),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = _norm(self.norm, self.features, self.dtype, "bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(s3, s3),
                    padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = _norm(self.norm, self.features, self.dtype, "bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        # zero_init (affine mode only): residual branch starts at zero so
        # the network begins as an identity stack — lets the norm-free
        # affine variant train from scratch.
        y = _norm(self.norm, out_features, self.dtype, "bn3",
                  zero_init=True)(y)
        if residual.shape[-1] != out_features or self.stride != 1:
            residual = nn.Conv(out_features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = _norm(self.norm, out_features, self.dtype,
                             "downsample_bn")(residual)
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
    norm: str = "frozen"        # "frozen" for converted weights, "affine"
                                # or "group" for from-scratch training
    upsample: str = "bilinear"  # FPN top-down: "bilinear" (reference-exact,
                                # resnet.py _upsample_add) | "nearest"
    remat: bool = False         # rematerialise each bottleneck on backward:
                                # only block-boundary activations are kept
                                # live (~3x less backbone activation HBM,
                                # ~+1/3 backbone FLOPs on the bwd pass).
                                # Same param tree, same forward numerics.

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        blocks = STAGE_BLOCKS[self.depth]
        block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck
        x = x.astype(self.dtype)

        # Stem: conv1 7x7/2 + maxpool 3x3/2.
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = _norm(self.norm, 64, self.dtype, "bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if self.norm == "frozen" and self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        stages = []
        widths = (64, 128, 256, 512)
        for stage_idx, (width, n_blocks) in enumerate(zip(widths, blocks)):
            stride = 1 if stage_idx == 0 else 2
            for b in range(n_blocks):
                x = block_cls(width, stride if b == 0 else 1, self.dtype,
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

    def _upsample_add(self, top: jnp.ndarray,
                      lateral: jnp.ndarray) -> jnp.ndarray:
        """FPN top-down 2x upsample of `top` + lateral.

        "bilinear" matches the reference exactly (``resnet.py`` —
        ``_upsample_add`` uses ``F.upsample(..., mode='bilinear')`` to the
        lateral's spatial size; jax.image.resize 'linear' uses the same
        half-pixel-center convention as align_corners=False).  "nearest"
        (repeat) is cheaper on the VPU and is kept as a measured option —
        feature maps differ, so converted reference checkpoints require
        bilinear for parity.
        """
        b, h, w, c = lateral.shape
        if self.upsample == "bilinear":
            up = jax.image.resize(top, (b, h, w, c), method="linear")
            return up.astype(lateral.dtype) + lateral
        up = jnp.repeat(jnp.repeat(top, 2, axis=1), 2, axis=2)
        return up[:, :h, :w, :] + lateral
