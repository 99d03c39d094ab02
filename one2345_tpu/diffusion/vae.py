"""SD AutoencoderKL (first-stage VAE).

Parity target: ldm/models/autoencoder.py:285-424 (AutoencoderKL) with the
Encoder/Decoder of ldm/modules/diffusionmodules/model.py (ch 128, mult
(1,2,4,4), 2 res blocks, attention at the bottleneck only, double_z).

The pipeline uses `encode(...).mode()` for conditioning (zero123_utils.py:74)
and `decode` for the sampled latents; the 0.18215 scale factor lives in the
wrapper (ddpm scale_factor), not here.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class _Norm(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import math

        g = math.gcd(32, x.shape[-1])
        return nn.GroupNorm(num_groups=g, epsilon=1e-6, dtype=jnp.float32)(
            x.astype(jnp.float32)
        ).astype(self.dtype)


class VAEResBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = _Norm(self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(h)
        h = _Norm(self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full attention at the bottleneck (model.py AttnBlock)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = _Norm(self.dtype, name="norm")(x)
        q = nn.Conv(C, (1, 1), dtype=self.dtype, name="q")(h).reshape(B, H * W, 1, C)
        k = nn.Conv(C, (1, 1), dtype=self.dtype, name="k")(h).reshape(B, H * W, 1, C)
        v = nn.Conv(C, (1, 1), dtype=self.dtype, name="v")(h).reshape(B, H * W, 1, C)
        o = jax.nn.dot_product_attention(q, k, v).reshape(B, H, W, C)
        o = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(o)
        return x + o


class Encoder(nn.Module):
    base_channels: int = 128
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        h = nn.Conv(self.base_channels, (3, 3), padding="SAME", dtype=dt, name="conv_in")(
            x.astype(dt)
        )
        for level, mult in enumerate(self.channel_mult):
            ch = self.base_channels * mult
            for i in range(self.num_res_blocks):
                h = VAEResBlock(ch, dt, name=f"down_{level}_block_{i}")(h)
            if level != len(self.channel_mult) - 1:
                # SD uses asymmetric (0,1) padding on the stride-2 conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    ch, (3, 3), strides=(2, 2), padding="VALID", dtype=dt,
                    name=f"down_{level}_downsample",
                )(h)
        ch = self.base_channels * self.channel_mult[-1]
        h = VAEResBlock(ch, dt, name="mid_block_1")(h)
        h = AttnBlock(dt, name="mid_attn")(h)
        h = VAEResBlock(ch, dt, name="mid_block_2")(h)
        h = _Norm(dt, name="norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(2 * self.z_channels, (3, 3), padding="SAME", dtype=dt, name="conv_out")(h)
        # quant_conv (autoencoder.py:300)
        h = nn.Conv(2 * self.z_channels, (1, 1), dtype=dt, name="quant_conv")(h)
        return h.astype(jnp.float32)  # moments: [B, h, w, 2*z]


class Decoder(nn.Module):
    base_channels: int = 128
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_channels: int = 3
    z_channels: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, z):
        dt = self.dtype
        h = nn.Conv(self.z_channels, (1, 1), dtype=dt, name="post_quant_conv")(
            z.astype(dt)
        )
        ch = self.base_channels * self.channel_mult[-1]
        h = nn.Conv(ch, (3, 3), padding="SAME", dtype=dt, name="conv_in")(h)
        h = VAEResBlock(ch, dt, name="mid_block_1")(h)
        h = AttnBlock(dt, name="mid_attn")(h)
        h = VAEResBlock(ch, dt, name="mid_block_2")(h)
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            ch = self.base_channels * mult
            for i in range(self.num_res_blocks + 1):
                h = VAEResBlock(ch, dt, name=f"up_{level}_block_{i}")(h)
            if level != 0:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
                h = nn.Conv(ch, (3, 3), padding="SAME", dtype=dt, name=f"up_{level}_conv")(h)
        h = _Norm(dt, name="norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=dt, name="conv_out")(h)
        return h.astype(jnp.float32)


def moments_mode(moments: jnp.ndarray) -> jnp.ndarray:
    """DiagonalGaussianDistribution.mode() = mean (first half of moments)."""
    return jnp.split(moments, 2, axis=-1)[0]


def moments_sample(moments: jnp.ndarray, key) -> jnp.ndarray:
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape)
