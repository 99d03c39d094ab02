"""W8A8 int8 quantization for the UNet hot path (opt-in fast mode).

v5e's MXU runs s8xs8->s32 contractions at 394 TOPS — 2x the 197 TFLOP/s
bf16 peak.  docs/diffusion_profile.md measured the diffusion stage
compute-bound at component-level speed-of-light for bf16 (conv side
~0.74 MFU); precision is the one remaining lever that doesn't change the
model architecture.  This module provides:

- ``QConv`` / ``QDense``: drop-in flax layers whose kernels live in the
  param tree as int8 + a per-output-channel f32 scale.  Activations are
  quantized dynamically per-tensor (absmax/127) at each call; the int32
  MXU output is dequantized by ``act_scale * kernel_scale`` straight into
  the bf16 epilogue.  The SHIPPED mode quantizes convs only — see
  SKIP_QUANT below for the measured ablation that set this.
- ``quantize_unet_params``: one-time f32 tree -> quant tree transform
  (per-output-channel symmetric absmax).  The f32 tree stays the single
  source of truth for training / weight conversion; the quant tree is a
  derived artifact, computed once per process and reused across the DDIM
  scan (weights are NOT re-quantized inside the sampling loop).

Quality caveat (same story as the dpmpp fast mode): W8A8 with per-tensor
dynamic activations is the standard deployment recipe for SD-class UNets,
but low-bit error on the REAL checkpoint is unvalidated until weights are
available (README runbook).  The reference-semantics path stays bf16.

No reference analogue: /root/reference runs fp32/fp16 only
(utils/zero123_utils.py:45-47 half_precision).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import traverse_util
from jax import lax

# leaf module names whose kernels stay full-precision, in two groups:
#
# 1. Sensitivity skips — the time/emb MLPs and the first/last convs are
#    <0.5% of UNet FLOPs and disproportionately sensitive (conv_out writes
#    the eps prediction directly).
# 2. Measured-loss skips — ALL transformer/FF/projection matmuls.  The
#    B=56 production-shape ablation (examples/quant_ablation.py, v5e):
#        bf16 95.28 | conv-only int8 83.24 | full int8 89.33
#        dense-only int8 101.25 | full+static-act 83.4   (ms/UNet eval)
#    i.e. quantizing the dense side LOSES money (the per-token matmuls are
#    small-K and the quantize/dequantize epilogue isn't free), while the
#    conv side harvests the 2x 8-bit MXU path (standalone s8xs8 convs
#    measured up to 2.2x bf16, examples/int8_probe.py).  The shipped int8
#    mode is therefore CONV-ONLY with dynamic activation scales (ties
#    full+static within noise, needs no calibration pass).
_SKIP_SENSITIVE = ("time_embed_0", "time_embed_2", "emb_proj", "conv_in", "conv_out")
_SKIP_DENSE = ("to_q", "to_k", "to_v", "to_out", "proj", "ff_out")
SKIP_QUANT = _SKIP_SENSITIVE + _SKIP_DENSE


def quantize_activation(x):
    """Dynamic symmetric per-tensor quantization -> (int8 x, f32 scale)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return xq, s


def quantize_kernel(w):
    """Per-output-channel symmetric absmax -> (int8 kernel, f32 scale[out]).
    Works for conv HWIO ([kh,kw,in,out]) and dense ([in,out]) layouts —
    the output channel is always the last axis."""
    wf = jnp.asarray(w, jnp.float32)
    axes = tuple(range(wf.ndim - 1))
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=axes), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return wq, s


class QConv(nn.Module):
    """int8 conv: param-tree kernel is pre-quantized (kernel_q, kernel_scale);
    the activation quantizes dynamically per call.  Mirrors the nn.Conv
    surface used by diffusion/unet.py (NHWC, HWIO)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kshape = (*self.kernel_size, x.shape[-1], self.features)
        wq = self.param("kernel_q", nn.initializers.zeros, kshape, jnp.int8)
        ws = self.param(
            "kernel_scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        xq, xs = quantize_activation(x)
        dn = lax.conv_dimension_numbers(x.shape, kshape, ("NHWC", "HWIO", "NHWC"))
        pad = self.padding
        if not isinstance(pad, str):
            pad = tuple(tuple(p) for p in pad)
        y = lax.conv_general_dilated(
            xq, wq, tuple(self.strides), pad, dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (xs * ws) + b
        return y.astype(self.dtype)


class QDense(nn.Module):
    """int8 dense over the last axis; see QConv."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        wq = self.param(
            "kernel_q", nn.initializers.zeros,
            (x.shape[-1], self.features), jnp.int8,
        )
        ws = self.param(
            "kernel_scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        xq, xs = quantize_activation(x)
        y = lax.dot_general(
            xq.reshape(-1, x.shape[-1]), wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (xs * ws)
        if b is not None:
            y = y + b
        return y.reshape(*x.shape[:-1], self.features).astype(self.dtype)


def conv(quant: bool, features, kernel_size, *, strides=(1, 1), padding="SAME",
         dtype=jnp.bfloat16, kernel_init=None, name=None):
    """nn.Conv or QConv, by the module's quant flag.  ``kernel_init`` only
    applies to the f32 path (quant params are derived, never trained)."""
    if quant and name not in SKIP_QUANT:
        return QConv(features, kernel_size, strides, padding, dtype, name=name)
    kw = {"kernel_init": kernel_init} if kernel_init is not None else {}
    return nn.Conv(
        features, tuple(kernel_size), strides=tuple(strides), padding=padding,
        dtype=dtype, name=name, **kw,
    )


def dense(quant: bool, features, *, use_bias=True, dtype=jnp.bfloat16, name=None):
    if quant and name not in SKIP_QUANT:
        return QDense(features, use_bias, dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


@functools.partial(jax.jit, static_argnums=1)
def _quantize_tree(f32_params: dict, skip_names: tuple) -> dict:
    flat = traverse_util.flatten_dict(f32_params)
    out = {}
    for path, leaf in flat.items():
        # norm layers carry 'scale'/'bias', never 'kernel', so keying on the
        # leaf name + owning-module name covers exactly the conv/dense set
        if path[-1] == "kernel" and path[-2] not in skip_names:
            wq, ws = quantize_kernel(leaf)
            out[path[:-1] + ("kernel_q",)] = wq
            out[path[:-1] + ("kernel_scale",)] = ws
        else:
            out[path] = leaf
    return traverse_util.unflatten_dict(out)


def quantize_unet_params(unet_vars: dict, skip_names=SKIP_QUANT) -> dict:
    """f32 UNet variables -> quantized variables for UNetModel(quant=True).

    Every conv/dense ``kernel`` outside ``skip_names`` becomes
    (kernel_q int8, kernel_scale f32[out]); biases, norm scales and the
    skipped kernels pass through unchanged.  Pure and jitted — call once
    per process, reuse across all sampling calls.
    """
    return {"params": _quantize_tree(unet_vars["params"], tuple(skip_names))}
