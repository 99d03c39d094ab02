"""Pallas TPU flash attention (forward) for the UNet self-attention.

The reference computes attention as unfused einsum + softmax + einsum
(ldm/modules/attention.py:152-193), materializing the [T, T] score matrix in
HBM — at the UNet's 64x64 level that is a 4096^2 matrix per head.  This
kernel keeps the online-softmax running statistics in VMEM and never writes
scores to HBM.

Design: grid over (batch*heads, query blocks); K/V for one (batch, head)
live fully in VMEM (T <= 4096, d <= 160 after padding -> ~4 MB), the query
block streams.  f32 accumulation; bf16 inputs welcome.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_kv: int):
    q = q_ref[0].astype(jnp.float32) * scale  # [BT, D]
    S = k_ref.shape[1]
    BT, D = q.shape
    n_kv = S // block_kv

    def body(j, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(j * block_kv, block_kv), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_kv, block_kv), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BT, BKV]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc = jnp.zeros((BT, D), jnp.float32)
    m = jnp.full((BT, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((BT, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_kv, body, (acc, m, l))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _pad_to(x, axis, m):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("block_q", "block_kv"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 256,
    block_kv: int = 256,
) -> jnp.ndarray:
    """Multi-head attention, softmax(q k^T / sqrt(d)) v.

    :param q: [B, T, H, D]; :param k/v: [B, S, H, D]
    :return: [B, T, H, D] in q's dtype
    """
    B, T, H, D = q.shape
    S = k.shape[1]
    scale = 1.0 / (D**0.5)

    # fold heads into batch, pad D to the 128-lane tile and T/S to blocks
    def fold(x, L):
        x = jnp.moveaxis(x, 2, 1).reshape(B * H, L, D)
        return _pad_to(x, 2, 128)

    if S % block_kv != 0:
        # ragged keys would need masking of padded rows — our UNet shapes
        # (1024/4096 tokens) never hit this; use XLA attention instead
        return jax.nn.dot_product_attention(q, k, v)

    qf = _pad_to(fold(q, T), 1, block_q)  # zero-padded queries are sliced off
    kf = fold(k, S)
    vf = fold(v, S)

    Tp = qf.shape[1]
    Sp = kf.shape[1]
    Dp = qf.shape[2]

    grid = (B * H, Tp // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_kv=block_kv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, Dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, Dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, Dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, Dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, Dp), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tp * Sp * Dp,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=B * H * Tp * Sp,
        ),
    )(qf, kf, vf)

    out = out[:, :T, :D].reshape(B, H, T, D)
    return jnp.moveaxis(out, 1, 2)


def attention(q, k, v, use_flash: bool | None = None):
    """Dispatch: pallas flash attention on TPU for long self-attention,
    XLA fused attention otherwise (short sequences / CPU)."""
    if use_flash is None:
        on_tpu = jax.devices()[0].platform == "tpu"
        T, S = q.shape[1], k.shape[1]
        use_flash = on_tpu and S >= 1024 and T % 256 == 0 and S % 256 == 0
    if use_flash:
        return flash_attention(q, k, v)
    return jax.nn.dot_product_attention(q, k, v)
