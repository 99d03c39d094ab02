"""IBRNet-style view-blending rendering network.

Parity target: reconstruction/models/rendering_network.py:26-129
(GeneralRenderingNetwork): per-sample features from all source views are
blended with visibility-weighted softmax; anti-alias pooling weights come
from the ray-direction dot products.  Kaiming-normal init matches the
reference's `weights_init`.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _mlp(features, name, dtype):
    return nn.Dense(
        features,
        kernel_init=nn.initializers.he_normal(),
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )


class GeneralRenderingNetwork(nn.Module):
    in_geometry_feat_ch: int = 16
    in_rendering_feat_ch: int = 56
    anti_alias_pooling: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, geometry_feat, rgb_feat, ray_diff, mask):
        """
        :param geometry_feat: [n_rays, n_samples, G]
        :param rgb_feat: [n_views, n_rays, n_samples, 3 + F] (colors ++ feats)
        :param ray_diff: [n_views, n_rays, n_samples, 4] (dir diff, dot)
        :param mask: [n_views, n_rays, n_samples] validity
        :return: (rgb [n_rays, n_samples, 3], valid_mask [n_rays, 1])
        """
        dt = self.dtype
        # -> [n_rays, n_samples, n_views, *]
        rgb_feat = jnp.moveaxis(rgb_feat, 0, 2)
        ray_diff = jnp.moveaxis(ray_diff, 0, 2)
        mask = jnp.moveaxis(mask[..., None].astype(dt), 0, 2)
        num_views = rgb_feat.shape[2]
        geo = jnp.repeat(geometry_feat[:, :, None, :], num_views, axis=2)

        # ray_dir_fc
        d = nn.elu(_mlp(16, "ray_dir_fc0", dt)(ray_diff))
        d = nn.elu(_mlp(self.in_rendering_feat_ch + 3, "ray_dir_fc1", dt)(d))
        rgb_in = rgb_feat[..., :3]
        rgb_feat = rgb_feat + d

        if self.anti_alias_pooling:
            s = self.param("s", lambda k: jnp.asarray(0.2, jnp.float32))
            dot_prod = ray_diff[..., 3:]
            exp_dot = jnp.exp(jnp.abs(s) * (dot_prod - 1.0))
            weight = (exp_dot - jnp.min(exp_dot, axis=2, keepdims=True)) * mask
        else:
            weight = mask
        weight = weight / (jnp.sum(weight, axis=2, keepdims=True) + 1e-8)

        mean = jnp.sum(rgb_feat * weight, axis=2, keepdims=True)
        var = jnp.sum(weight * (rgb_feat - mean) ** 2, axis=2, keepdims=True)
        globalfeat = jnp.concatenate([mean, var], axis=-1)

        x = jnp.concatenate(
            [geo, jnp.broadcast_to(globalfeat, geo.shape[:3] + (globalfeat.shape[-1],)), rgb_feat],
            axis=-1,
        )
        x = nn.elu(_mlp(64, "base_fc0", dt)(x))
        x = nn.elu(_mlp(32, "base_fc1", dt)(x))

        x_vis = nn.elu(_mlp(32, "vis_fc0", dt)(x * weight))
        x_vis = nn.elu(_mlp(33, "vis_fc1", dt)(x_vis))
        x_res, vis = x_vis[..., :-1], x_vis[..., -1:]
        vis = jax.nn.sigmoid(vis) * mask
        x = x + x_res
        v2 = nn.elu(_mlp(32, "vis_fc2_0", dt)(x * vis))
        vis = jax.nn.sigmoid(_mlp(1, "vis_fc2_1", dt)(v2)) * mask

        x = jnp.concatenate([x, vis, ray_diff], axis=-1)
        x = nn.elu(_mlp(16, "rgb_fc0", dt)(x))
        x = nn.elu(_mlp(8, "rgb_fc1", dt)(x))
        x = _mlp(1, "rgb_fc2", dt)(x)
        x = jnp.where(mask == 0, -1e9, x)
        blend = jax.nn.softmax(x, axis=2)
        rgb_out = jnp.sum(rgb_in * blend, axis=2)

        # validity: point valid if seen by >= 2 views; ray valid if > 8 samples
        views_per_point = jnp.sum(mask[..., 0], axis=2)
        point_ok = (views_per_point >= 2).astype(dt)
        valid_mask = (jnp.sum(point_ok, axis=1, keepdims=True) > 8)
        return rgb_out, valid_mask
