"""Pallas TPU flash attention (forward + backward) for the UNet attention.

The reference computes attention as unfused einsum + softmax + einsum
(ldm/modules/attention.py:152-193), materializing the [T, T] score matrix in
HBM — at the UNet's 64x64 level that is a 4096^2 matrix per head.  This
kernel keeps the online-softmax running statistics in VMEM and never writes
scores to HBM.

Forward: grid over (batch*heads, query blocks); K/V for one (batch, head)
live fully in VMEM (T <= 4096, d <= 160 after padding -> ~4 MB), the query
block streams.  The per-row logsumexp L = m + log(l) is written as a
residual for the backward pass.

Backward (flash-attention-2 style, via jax.custom_vjp):
- D_i = rowsum(dO_i * O_i) precomputed with XLA (cheap elementwise),
- dQ kernel: grid over query blocks, loops KV blocks, recomputes
  P = exp(S - L); dQ_i = scale * sum_j P*(dP - D) @ K_j,
- dK/dV kernel: grid over KV blocks, loops query blocks;
  dV_j = sum_i P^T dO_i, dK_j = scale * sum_i (P*(dP - D))^T Q_i.
Scores are recomputed from Q/K in VMEM — nothing quadratic ever hits HBM,
so training memory matches inference.  f32 accumulation throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                      block_kv: int):
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
    # lse is laid out [BH, Tp, 1]: a trailing singleton lane dim keeps the
    # block shape (block_q, 1) legal under the TPU (8, 128)-tiling rule
    # (last dim == array dim); a flat [BH, Tp] output with (1, block_q)
    # blocks fails Pallas lowering on real TPUs.
    lse_ref[0] = m + jnp.log(l)


def _flash_bwd_dq_kernel(q_ref, do_ref, lse_ref, dsum_ref, k_ref, v_ref,
                         dq_ref, *, scale: float, block_kv: int):
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # [BT, 1]
    dsum = dsum_ref[0]  # [BT, 1]
    S = k_ref.shape[1]
    BT, D = q.shape

    def body(j, dq):
        k = k_ref[0, pl.ds(j * block_kv, block_kv), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_kv, block_kv), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - dsum)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(0, S // block_kv, body, jnp.zeros((BT, D), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, dsum_ref,
                          dk_ref, dv_ref, *, scale: float, block_q: int):
    k = k_ref[0].astype(jnp.float32)  # [BKV, D]
    v = v_ref[0].astype(jnp.float32)
    T = q_ref.shape[1]
    BKV, D = k.shape

    def body(i, carry):
        dk, dv = carry
        qb = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        dob = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :]  # [BQ, 1]
        dsum = dsum_ref[0, pl.ds(i * block_q, block_q), :]  # [BQ, 1]
        s = jax.lax.dot_general(
            qb, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [BQ, BKV]
        p = jnp.exp(s - lse)
        dv_new = dv + jax.lax.dot_general(
            p, dob, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            dob, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - dsum)
        dk_new = dk + jax.lax.dot_general(
            ds, qb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk_new, dv_new

    dk = jnp.zeros((BKV, D), jnp.float32)
    dv = jnp.zeros((BKV, D), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, T // block_q, body, (dk, dv))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# --------------------------------------------------------------------------
# custom_vjp over folded [B*H, L, Dp] arrays
# --------------------------------------------------------------------------


def _fwd_impl(qf, kf, vf, scale, block_q, block_kv):
    BH, Tp, Dp = qf.shape
    Sp = kf.shape[1]
    grid = (BH, Tp // block_q)
    return pl.pallas_call(
        functools.partial(_flash_fwd_kernel, scale=scale, block_kv=block_kv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, Dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, Dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, Dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, Dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tp, Dp), qf.dtype),
            jax.ShapeDtypeStruct((BH, Tp, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Tp * Sp * Dp,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=BH * Tp * Sp,
        ),
    )(qf, kf, vf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_folded(qf, kf, vf, scale, block_q, block_kv):
    o, _ = _fwd_impl(qf, kf, vf, scale, block_q, block_kv)
    return o


def _flash_folded_fwd(qf, kf, vf, scale, block_q, block_kv):
    o, lse = _fwd_impl(qf, kf, vf, scale, block_q, block_kv)
    return o, (qf, kf, vf, o, lse)


def _flash_folded_bwd(scale, block_q, block_kv, res, do):
    qf, kf, vf, o, lse = res
    BH, Tp, Dp = qf.shape
    Sp = kf.shape[1]
    dsum = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )  # [BH, Tp, 1]

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, block_kv=block_kv),
        grid=(BH, Tp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, Dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, Dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, Dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, Dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Tp, Dp), qf.dtype),
        cost_estimate=pl.CostEstimate(
            flops=5 * BH * Tp * Sp * Dp,
            bytes_accessed=(qf.size * 3 + kf.size * 2) * qf.dtype.itemsize,
            transcendentals=BH * Tp * Sp,
        ),
    )(qf, do, lse, dsum, kf, vf)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, block_q=block_q),
        grid=(BH, Sp // block_kv),
        in_specs=[
            pl.BlockSpec((1, block_kv, Dp), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, Dp), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, Dp), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, Dp), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, 1), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, 1), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_kv, Dp), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, Dp), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Sp, Dp), kf.dtype),
            jax.ShapeDtypeStruct((BH, Sp, Dp), vf.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * BH * Tp * Sp * Dp,
            bytes_accessed=(qf.size * 2 + kf.size * 3) * qf.dtype.itemsize,
            transcendentals=BH * Tp * Sp,
        ),
    )(kf, vf, qf, do, lse, dsum)

    return dq, dk, dv


_flash_folded.defvjp(_flash_folded_fwd, _flash_folded_bwd)


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
    """Multi-head attention, softmax(q k^T / sqrt(d)) v.  Differentiable
    (flash backward kernels via custom_vjp).

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

    out = _flash_folded(qf, kf, vf, scale, block_q, block_kv)
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
