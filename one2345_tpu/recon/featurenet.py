"""2D pyramid feature extractor (FPN) for the cost volume.

Parity target: reconstruction/models/featurenet.py:43-91 (FeatureNet) +
the 3-scale fusion at trainer_generic.py:1104-1125 (upsample x4 / x2 with
align_corners and concat to 56 channels).  Channels-last layout; all views
are batched along the leading axis in one jit call.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from one2345_tpu.nn.layers import ConvBnAct, resize_bilinear_align_corners


class FeatureNet(nn.Module):
    """3-level FPN: returns [feat2 (32ch, H/4), feat1 (16ch, H/2), feat0 (8ch, H)]."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, H, W, 3]
        dt = self.dtype
        conv0 = ConvBnAct(8, (3, 3), dtype=dt)(x, train)
        conv0 = ConvBnAct(8, (3, 3), dtype=dt)(conv0, train)

        conv1 = ConvBnAct(16, (5, 5), (2, 2), dtype=dt)(conv0, train)
        conv1 = ConvBnAct(16, (3, 3), dtype=dt)(conv1, train)
        conv1 = ConvBnAct(16, (3, 3), dtype=dt)(conv1, train)

        conv2 = ConvBnAct(32, (5, 5), (2, 2), dtype=dt)(conv1, train)
        conv2 = ConvBnAct(32, (3, 3), dtype=dt)(conv2, train)
        conv2 = ConvBnAct(32, (3, 3), dtype=dt)(conv2, train)

        feat2 = nn.Conv(32, (1, 1), dtype=dt, name="toplayer")(conv2)
        lat1 = nn.Conv(32, (1, 1), dtype=dt, name="lat1")(conv1)
        lat0 = nn.Conv(32, (1, 1), dtype=dt, name="lat0")(conv0)

        up2 = jax.vmap(lambda im: resize_bilinear_align_corners(im, lat1.shape[1:3]))(feat2)
        feat1 = up2 + lat1
        up1 = jax.vmap(lambda im: resize_bilinear_align_corners(im, lat0.shape[1:3]))(feat1)
        feat0 = up1 + lat0

        feat1 = nn.Conv(16, (3, 3), padding="SAME", dtype=dt, name="smooth1")(feat1)
        feat0 = nn.Conv(8, (3, 3), padding="SAME", dtype=dt, name="smooth0")(feat0)
        return [feat2, feat1, feat0]


class PyramidFeatureFusion(nn.Module):
    """FeatureNet + full-resolution fusion to 56 channels
    (trainer_generic.py:1116-1123: [up4(feat2), up2(feat1), feat0])."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        # images: [V, H, W, 3] -> [V, H, W, 56]
        feats = FeatureNet(dtype=self.dtype, name="fpn")(images, train)
        H, W = images.shape[1], images.shape[2]
        f2 = jax.vmap(lambda im: resize_bilinear_align_corners(im, (H, W)))(feats[0])
        f1 = jax.vmap(lambda im: resize_bilinear_align_corners(im, (H, W)))(feats[1])
        return jnp.concatenate([f2, f1, feats[2]], axis=-1)
