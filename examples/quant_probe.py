"""A/B: bf16 UNet vs W8A8 int8 UNet (diffusion/quantize.py) at production
shapes — the one lever docs/diffusion_profile.md left on the table
("not reachable without changing the model (head_dim) or precision (int8)").

Measures per-eval wall inside a 20-eval lax.scan at B=56 (stage-2 CFG
batch) and B=8 (stage-1), plus the numeric divergence of one eval on
random weights.  Run on a QUIET TPU host.  One JSON line per result.
"""

# allow `python examples/<name>.py` from the repo root without installing
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp
import numpy as np

from examples.profile_unet import build_unet, sync, time_scan
from one2345_tpu.core.profiling import unet_flops_per_eval
from one2345_tpu.diffusion.quantize import quantize_unet_params

V5E_BF16_PEAK = 197e12
V5E_INT8_PEAK = 394e12


def main():
    unet, cfg = build_unet(attn=True)
    qunet = unet.clone(quant=True)

    L = 32
    x0 = jax.random.normal(jax.random.key(1), (8, L, L, cfg.in_channels))
    t0 = jnp.full((8,), 500, jnp.int32)
    c0 = jax.random.normal(jax.random.key(2), (8, 1, cfg.context_dim))
    params = jax.jit(unet.init)(jax.random.key(0), x0, t0, c0)
    qparams = quantize_unet_params(params)  # jitted internally, runs once
    sync(qparams)

    # numeric divergence of ONE eval (random weights; the real-weights
    # error is unvalidatable in this env — README runbook).  The zero-init
    # output convs would make both outputs exactly 0 (rel = 0/0) — perturb
    # every leaf so the comparison flows through real weights.
    @jax.jit
    def perturb(tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        out = [
            l + 0.05 * jax.random.normal(jax.random.key(1000 + i), l.shape, l.dtype)
            for i, l in enumerate(leaves)
        ]
        return jax.tree_util.tree_unflatten(treedef, out)

    pparams = perturb(params)
    ref = jax.jit(unet.apply)(pparams, x0, t0, c0)
    out = jax.jit(qunet.apply)(quantize_unet_params(pparams), x0, t0, c0)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    print(json.dumps({"component": "int8_rel_l2_vs_bf16", "value": round(rel, 5)}),
          flush=True)

    for B in (56, 8):
        x = jnp.zeros((B, L, L, cfg.in_channels), jnp.float32)
        t = jnp.full((B,), 500, jnp.int32)
        c = jnp.zeros((B, 1, cfg.context_dim), jnp.float32)

        def step_bf16(p, x8):
            out = unet.apply(p, x8, t, c)
            return jnp.concatenate([out, out], axis=-1)

        def step_int8(p, x8):
            out = qunet.apply(p, x8, t, c)
            return jnp.concatenate([out, out], axis=-1)

        ms_b = time_scan(step_bf16, params, x, 20, f"bf16_unet_b{B}")
        ms_q = time_scan(step_int8, qparams, x, 20, f"int8_unet_b{B}")
        flops = unet_flops_per_eval(B, L)
        print(json.dumps({
            "component": f"int8_vs_bf16_b{B}",
            "bf16_ms": round(ms_b, 2), "int8_ms": round(ms_q, 2),
            "speedup": round(ms_b / ms_q, 3),
            "bf16_mfu": round(flops / (ms_b * 1e-3) / V5E_BF16_PEAK, 3),
            "int8_mfu_of_394tops": round(flops / (ms_q * 1e-3) / V5E_INT8_PEAK, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
