"""Zero123-XL denoiser UNet (Stable-Diffusion-1.x architecture, 8 in-ch).

Parity target: ldm/modules/diffusionmodules/openaimodel.py:414-778
(UNetModel with the config at configs/sd-objaverse-finetune-c_concat-256.yaml:
28-43: model_channels 320, mult (1,2,4,4), 2 res blocks/level, spatial
transformer depth 1 at ds 1/2/4, context_dim 768, heads 8, legacy=False)
plus the attention stack (ldm/modules/attention.py:152-266).

TPU design notes:
- channels-last NHWC everywhere (conv + MXU friendly);
- attention uses `jax.nn.dot_product_attention` (XLA fused attention; the
  reference uses unfused einsum softmax, attention.py:152-193);
- bf16 compute / f32 params; GroupNorm + softmax accumulate in f32;
- no gradient checkpointing at inference; training wraps blocks in
  `jax.checkpoint` at the call site.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from one2345_tpu.diffusion import quantize as q
from one2345_tpu.diffusion.schedule import timestep_embedding


def zero_init():
    return nn.initializers.zeros


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in f32 (openaimodel normalization).
    Falls back to gcd(32, C) groups so tiny test configs stay valid."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import math

        g = math.gcd(32, x.shape[-1])
        return nn.GroupNorm(
            num_groups=g, epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32
        )(x.astype(jnp.float32)).astype(self.dtype)


class ResBlock(nn.Module):
    """openaimodel.ResBlock:164-260 (scale-shift off: emb added to h)."""

    out_channels: int
    dtype: Any = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x, emb):
        h = GroupNorm32(self.dtype, name="in_norm")(x)
        h = nn.silu(h)
        h = q.conv(
            self.quant, self.out_channels, (3, 3), dtype=self.dtype, name="in_conv"
        )(h)
        e = nn.Dense(self.out_channels, dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        h = h + e[:, None, None, :]
        h = GroupNorm32(self.dtype, name="out_norm")(h)
        h = nn.silu(h)
        h = q.conv(
            self.quant, self.out_channels, (3, 3), dtype=self.dtype,
            kernel_init=zero_init(), name="out_conv",
        )(h)
        if x.shape[-1] != self.out_channels:
            x = q.conv(self.quant, self.out_channels, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class Attention(nn.Module):
    """Multi-head attention over flattened spatial tokens.

    Self-attention when ``context`` is None, cross-attention otherwise
    (attention.py CrossAttention:152-193).
    """

    heads: int
    dim_head: int
    dtype: Any = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        # int8 mode: the q/k/v/out projections route through q.dense, but the
        # shipped SKIP_QUANT keeps them bf16 — the B=56 ablation measured
        # dense-side quantization a net LOSS (quantize.py:SKIP_QUANT).  The
        # attention core also stays bf16: its ~0.37 MFU cap is the 40-deep
        # head_dim contraction (docs/diffusion_profile.md), which 8-bit does
        # not deepen.
        q_ = q.dense(self.quant, inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k_ = q.dense(self.quant, inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v_ = q.dense(self.quant, inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        B, T, _ = q_.shape
        S = k_.shape[1]
        q_ = q_.reshape(B, T, self.heads, self.dim_head)
        k_ = k_.reshape(B, S, self.heads, self.dim_head)
        v_ = v_.reshape(B, S, self.heads, self.dim_head)
        if S == 1:
            # Zero123 cross-attention context is ONE token (the cc-projected
            # CLIP+pose embedding, ddpm.py:747-752): softmax over a single
            # key is identically 1, so the output equals the broadcast V
            # projection — exact, and the query path dead-codes away.  XLA
            # also hoists the (timestep-invariant) K/V work out of the DDIM
            # scan, removing cross-attention from the hot loop entirely.
            o = jnp.broadcast_to(v_, (B, T, self.heads, self.dim_head))
        else:
            from one2345_tpu.ops.flash_attention import attention as fused_attention

            o = fused_attention(q_, k_, v_)
        o = o.reshape(B, T, inner)
        return q.dense(self.quant, x.shape[-1], dtype=self.dtype, name="to_out")(o)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Any = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        h = q.dense(self.quant, self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        a, g = jnp.split(h, 2, axis=-1)
        return a * nn.gelu(g)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> GEGLU FF, pre-LN residuals
    (attention.py:196-218)."""

    heads: int
    dim_head: int
    dtype: Any = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x, context):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)
        x = x + Attention(self.heads, self.dim_head, self.dtype, self.quant, name="attn1")(
            ln("norm1")(x).astype(self.dtype)
        )
        x = x + Attention(self.heads, self.dim_head, self.dtype, self.quant, name="attn2")(
            ln("norm2")(x).astype(self.dtype), context
        )
        h = ln("norm3")(x).astype(self.dtype)
        h = GEGLU(x.shape[-1] * 4, self.dtype, self.quant, name="ff_geglu")(h)
        h = q.dense(self.quant, x.shape[-1], dtype=self.dtype, name="ff_out")(h)
        return x + h


class SpatialTransformer(nn.Module):
    """GroupNorm -> 1x1 proj -> transformer blocks -> zero 1x1 proj, residual
    (attention.py:221-266)."""

    heads: int
    depth: int
    dtype: Any = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        dim_head = C // self.heads
        h = GroupNorm32(self.dtype, name="norm")(x)
        h = q.conv(self.quant, C, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(B, H * W, C)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                self.heads, dim_head, self.dtype, self.quant, name=f"block{i}"
            )(h, context)
        h = h.reshape(B, H, W, C)
        h = q.conv(
            self.quant, C, (1, 1), dtype=self.dtype, kernel_init=zero_init(),
            name="proj_out",
        )(h)
        return x + h


class Downsample(nn.Module):
    channels: int
    dtype: Any = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        return q.conv(
            self.quant, self.channels, (3, 3), strides=(2, 2),
            padding=((1, 1), (1, 1)), dtype=self.dtype, name="op",
        )(x)


class Upsample(nn.Module):
    channels: int
    dtype: Any = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return q.conv(self.quant, self.channels, (3, 3), dtype=self.dtype, name="conv")(x)


class UNetModel(nn.Module):
    in_channels: int = 8
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 768
    dtype: Any = jnp.bfloat16
    # gradient rematerialization of every res/attention block — the TPU
    # equivalent of the reference's per-block grad checkpointing
    # (attention.py BasicTransformerBlock + openaimodel checkpoint());
    # trades FLOPs for activation memory when finetuning at 256^2.
    remat: bool = False
    # W8A8 int8 fast mode (diffusion/quantize.py): quantized kernels live
    # in the param tree as int8 + per-channel scales (derive the tree with
    # quantize_unet_params); activations quantize dynamically per call.
    # The shipped mode is conv-only (measured ablation in quantize.py).
    # Inference-only — training/conversion always use the f32 tree.
    quant: bool = False

    @nn.compact
    def __call__(self, x, timesteps, context):
        """
        :param x: [B, H, W, in_channels] noisy latent ++ concat conditioning
        :param timesteps: [B] int
        :param context: [B, T_ctx, context_dim] cross-attention tokens
        :return: [B, H, W, out_channels] predicted noise
        """
        dt = self.dtype
        mc = self.model_channels
        ResB = nn.remat(ResBlock) if self.remat else ResBlock
        SpT = nn.remat(SpatialTransformer) if self.remat else SpatialTransformer

        t_emb = timestep_embedding(timesteps, mc)
        emb = nn.Dense(mc * 4, dtype=dt, name="time_embed_0")(t_emb.astype(dt))
        emb = nn.Dense(mc * 4, dtype=dt, name="time_embed_2")(nn.silu(emb))
        context = context.astype(dt)

        hs = []
        h = q.conv(self.quant, mc, (3, 3), dtype=dt, name="conv_in")(x.astype(dt))
        hs.append(h)
        ds = 1
        # ---- encoder
        for level, mult in enumerate(self.channel_mult):
            ch = mc * mult
            for i in range(self.num_res_blocks):
                h = ResB(ch, dt, self.quant, name=f"in_{level}_{i}_res")(h, emb)
                if ds in self.attention_resolutions:
                    h = SpT(
                        self.num_heads, self.transformer_depth, dt,
                        self.quant, name=f"in_{level}_{i}_attn",
                    )(h, context)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                h = Downsample(ch, dt, self.quant, name=f"down_{level}")(h)
                hs.append(h)
                ds *= 2
        # ---- middle
        ch = mc * self.channel_mult[-1]
        h = ResB(ch, dt, self.quant, name="mid_res1")(h, emb)
        h = SpT(
            self.num_heads, self.transformer_depth, dt, self.quant,
            name="mid_attn",
        )(h, context)
        h = ResB(ch, dt, self.quant, name="mid_res2")(h, emb)
        # ---- decoder
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            ch = mc * mult
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResB(ch, dt, self.quant, name=f"out_{level}_{i}_res")(h, emb)
                if ds in self.attention_resolutions:
                    h = SpT(
                        self.num_heads, self.transformer_depth, dt,
                        self.quant, name=f"out_{level}_{i}_attn",
                    )(h, context)
            if level != 0:
                h = Upsample(ch, dt, self.quant, name=f"up_{level}")(h)
                ds //= 2

        h = GroupNorm32(dt, name="out_norm")(h)
        h = nn.silu(h)
        h = q.conv(
            self.quant, self.out_channels, (3, 3), dtype=dt,
            kernel_init=zero_init(), name="conv_out",
        )(h)
        return h.astype(jnp.float32)
