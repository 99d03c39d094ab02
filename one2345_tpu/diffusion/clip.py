"""Frozen CLIP ViT-L/14 image tower -> 768-d conditioning token.

Parity target: ldm/modules/encoders/modules.py:343-382
(FrozenCLIPImageEmbedder): bicubic resize to 224 with renormalization from
[-1,1] inputs to CLIP stats, ViT-L/14 visual encoder, projected CLS token,
output [B, 1, 768].
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_for_clip(images: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """[B, H, W, 3] in [-1, 1] -> [B, 224, 224, 3] CLIP-normalized
    (modules.py:363-371: bicubic + antialias resize, renormalize)."""
    B = images.shape[0]
    x = jax.image.resize(images, (B, size, size, 3), method="cubic", antialias=True)
    x = (x + 1.0) / 2.0
    return (x - CLIP_MEAN) / CLIP_STD


class QuickGELU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        dh = C // self.heads
        q = nn.Dense(C, dtype=self.dtype, name="q_proj")(x).reshape(B, T, self.heads, dh)
        k = nn.Dense(C, dtype=self.dtype, name="k_proj")(x).reshape(B, T, self.heads, dh)
        v = nn.Dense(C, dtype=self.dtype, name="v_proj")(x).reshape(B, T, self.heads, dh)
        o = jax.nn.dot_product_attention(q, k, v).reshape(B, T, C)
        return nn.Dense(C, dtype=self.dtype, name="out_proj")(o)


class CLIPBlock(nn.Module):
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x).astype(self.dtype)
        x = x + CLIPAttention(self.heads, self.dtype, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x).astype(self.dtype)
        h = nn.Dense(x.shape[-1] * 4, dtype=self.dtype, name="fc")(h)
        h = QuickGELU()(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="proj")(h)
        return x + h


class CLIPVisionTower(nn.Module):
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    embed_dim: int = 768
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images):
        """[B, 224, 224, 3] CLIP-normalized -> [B, embed_dim] image embedding."""
        dt = self.dtype
        B = images.shape[0]
        n = (self.image_size // self.patch_size) ** 2
        x = nn.Conv(
            self.width,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            dtype=dt,
            name="patch_embed",
        )(images.astype(dt))
        x = x.reshape(B, n, self.width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.width,)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.width)).astype(dt), x], axis=1)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.02), (n + 1, self.width)
        )
        x = x + pos.astype(dt)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(x).astype(dt)
        for i in range(self.layers):
            x = CLIPBlock(self.heads, dt, name=f"resblock_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (self.width, self.embed_dim)
        )
        return (x.astype(dt) @ proj.astype(dt)).astype(jnp.float32)
