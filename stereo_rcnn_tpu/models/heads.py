"""Second-stage heads: classification / stereo box / dims+viewpoint /
perspective keypoints.

Behavioral reference: ``lib/model/stereo_rcnn/stereo_rcnn.py`` —
``_StereoRCNN``: pooled left+right RoI features are concatenated, flattened
through a 2-layer FC trunk, then linear heads predict class scores,
per-class stereo 6-tuple deltas, and per-class (3 dims + sin/cos viewpoint);
a separate convolutional branch on the LEFT pooled features predicts six
28-bin one-dimensional keypoint distributions (4 perspective-keypoint
channels from a 2-D map marginalised over rows + 2 visible-boundary
channels) — SURVEY.md §3.4 fact 5.

TPU design: FC trunk is two big matmuls over [R, 7*7*512] — lands straight
on the MXU batched over all RoIs.  The keypoint branch is small convs over
[R, 14, 14, C]; its row-marginalisation is a single sum.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
from flax import linen as nn


class RCNNOutputs(NamedTuple):
    cls_logits: jnp.ndarray       # [R, num_classes]
    box_deltas: jnp.ndarray       # [R, num_classes, 6] stereo 6-tuple
    dims: jnp.ndarray             # [R, num_classes, 3] (dh, dw, dl) vs mean
    orien: jnp.ndarray            # [R, num_classes, 2] (sin a, cos a)


class RCNNHead(nn.Module):
    num_classes: int = 2
    fc_dim: int = 2048
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pooled_concat: jnp.ndarray) -> RCNNOutputs:
        """pooled_concat: [R, P, P, 2*C] concatenated left+right RoI feats."""
        r = pooled_concat.shape[0]
        x = pooled_concat.astype(self.dtype).reshape(r, -1)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc7")(x))
        k = self.num_classes
        # Reference-parity output init (net_utils.normal_init: cls 0.01,
        # regression 0.001, zero bias).  ALSO load-bearing for from-scratch
        # training: with an un-normalised backbone (norm="affine") the fc
        # trunk's activations are O(10-100) at init, and default lecun
        # kernels then emit O(30) logits/deltas — a saturated softmax and
        # smooth-L1 far outside its quadratic zone (measured: kpt CE 51 and
        # box loss 34 at step 20 of the round-4 full-res run; the keypoint
        # branch never recovered).  Small output kernels start every head
        # at zero-ish predictions regardless of trunk magnitude.
        cls_logits = nn.Dense(
            k, dtype=self.dtype, name="cls_score",
            kernel_init=nn.initializers.normal(stddev=0.01))(x)
        box = nn.Dense(
            k * 6, dtype=self.dtype, name="bbox_pred",
            kernel_init=nn.initializers.normal(stddev=0.001))(x)
        dim_orien = nn.Dense(
            k * 5, dtype=self.dtype, name="dim_orien_pred",
            kernel_init=nn.initializers.normal(stddev=0.001))(x)
        dim_orien = dim_orien.reshape(r, k, 5).astype(jnp.float32)
        return RCNNOutputs(
            cls_logits=cls_logits.astype(jnp.float32),
            box_deltas=box.reshape(r, k, 6).astype(jnp.float32),
            dims=dim_orien[..., :3],
            orien=dim_orien[..., 3:],
        )


class KeypointHead(nn.Module):
    """Predicts six `grid`-bin 1-D horizontal distributions per RoI.

    Channels 0..3: perspective keypoint u-distribution for corner k (the
    network also learns which corners are visible via the mass it assigns).
    Channels 4..5: left/right visible-boundary u-distributions.
    """

    grid: int = 28
    conv_dim: int = 256
    num_channels: int = 6
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pooled_left: jnp.ndarray) -> jnp.ndarray:
        """pooled_left: [R, P_k, P_k, C] (14x14 left-image RoI feats).

        Returns logits [R, num_channels, grid] over horizontal bins.
        """
        x = pooled_left.astype(self.dtype)
        x = nn.relu(nn.Conv(self.conv_dim, (3, 3), padding="SAME",
                            dtype=self.dtype, name="kpt_conv1")(x))
        x = nn.relu(nn.Conv(self.conv_dim, (3, 3), padding="SAME",
                            dtype=self.dtype, name="kpt_conv2")(x))
        # Deconv x2: 14 -> 28 spatial.  ``transpose_kernel=True`` matches
        # torch ConvTranspose2d(k=4, s=2, p=1) semantics exactly, so the
        # reference checkpoint's deconv weights convert losslessly
        # (verified numerically in tests/test_convert.py).
        x = nn.relu(nn.ConvTranspose(self.conv_dim, (4, 4), strides=(2, 2),
                                     padding="SAME", transpose_kernel=True,
                                     dtype=self.dtype,
                                     name="kpt_deconv")(x))
        # Small output init (see RCNNHead): the row-marginalisation below
        # sums `grid` logit rows, amplifying any init-time logit scale x28.
        x = nn.Conv(self.num_channels, (1, 1), dtype=self.dtype,
                    name="kpt_score",
                    kernel_init=nn.initializers.normal(stddev=0.001))(x)
        # [R, G, G, 6]
        # Marginalise over rows (v) -> 1-D u distributions.
        logits = x.sum(axis=1)                              # [R, G, 6]
        return jnp.swapaxes(logits, 1, 2).astype(jnp.float32)  # [R, 6, G]
