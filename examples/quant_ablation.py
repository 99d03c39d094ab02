"""Ablation of the int8 fast mode at B=56 production shapes: which part of
the UNet actually wins from 8-bit on this toolchain?

Variants (all vs the bf16 baseline):
  full          every conv+dense quantized
  dense_only    transformer/FF/projection matmuls int8, convs bf16
  conv_only     convs int8, matmuls bf16 (the SHIPPED int8 mode)
  static_act    full, but activation scales are CONSTANTS (what a
                calibration pass would give) — isolates the cost of the
                dynamic absmax reduce before every quantized op

Measured 2026-08 (v5e, quiet host, ms/UNet eval vs bf16 95.28):
  full 89.33 | dense_only 101.25 | conv_only 83.24 | static_act 83.4
-> conv-only with dynamic activations ships (quantize.py:SKIP_QUANT).

Context: a standalone 8192^3 s8xs8 matmul measured 1.53x bf16 on this
chip (examples/int8_probe.py territory), so a native 8-bit MXU path
exists; this probe shows how much of it the UNet's shapes can harvest.
Run on a QUIET host; one JSON line per variant.
"""

# allow `python examples/<name>.py` from the repo root without installing
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp

from examples.profile_unet import build_unet, sync, time_scan
from one2345_tpu.diffusion import quantize as q

CONV_NAMES = ("in_conv", "out_conv", "skip", "op", "conv", "proj_in",
              "proj_out", "conv_in", "conv_out")
DENSE_NAMES = ("to_q", "to_k", "to_v", "to_out", "proj", "ff_out",
               "time_embed_0", "time_embed_2", "emb_proj")
# the always-skipped sensitivity set (NOT q.SKIP_QUANT, which now bakes in
# this ablation's conv-only verdict)
BASE = q._SKIP_SENSITIVE


def run_variant(label, skip_names, static_act=False):
    orig_skip = q.SKIP_QUANT
    orig_qact = q.quantize_activation
    try:
        q.SKIP_QUANT = skip_names
        if static_act:
            def static_quant(x, _s=0.05):
                xq = jnp.clip(
                    jnp.round(x.astype(jnp.float32) / _s), -127, 127
                ).astype(jnp.int8)
                return xq, jnp.float32(_s)

            q.quantize_activation = static_quant

        unet, cfg = build_unet(attn=True)
        qunet = unet.clone(quant=True)
        B, L = 56, 32
        x = jnp.zeros((B, L, L, cfg.in_channels), jnp.float32)
        t = jnp.full((B,), 500, jnp.int32)
        c = jnp.zeros((B, 1, cfg.context_dim), jnp.float32)
        params = jax.jit(unet.init)(jax.random.key(0), x, t, c)
        qparams = q.quantize_unet_params(params, skip_names=skip_names)
        sync(qparams)

        def step(p, x8):
            out = qunet.apply(p, x8, t, c)
            return jnp.concatenate([out, out], axis=-1)

        return time_scan(step, qparams, x, 20, label)
    finally:
        q.SKIP_QUANT = orig_skip
        q.quantize_activation = orig_qact


def main():
    ms_full = run_variant("int8_full", BASE)
    ms_dense = run_variant("int8_dense_only", BASE + CONV_NAMES)
    ms_conv = run_variant("int8_conv_only", BASE + DENSE_NAMES)
    ms_static = run_variant("int8_full_static_act", BASE, static_act=True)
    print(json.dumps({
        "component": "ablation_b56_ms",
        "full": round(ms_full, 2), "dense_only": round(ms_dense, 2),
        "conv_only": round(ms_conv, 2), "static_act": round(ms_static, 2),
        "note": "compare to bf16_unet_b56 in quant_probe.py output",
    }), flush=True)


if __name__ == "__main__":
    main()
