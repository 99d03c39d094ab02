"""Per-component profile of one warm UNet CFG step at production shapes.

VERDICT r02 asked for measurement behind the "diffusion is at roofline"
claim.  This probe times the stage-2 hot program (batch 56 = 28 views x 2
CFG, 32x32 latents, bf16) and its ablations INSIDE a lax.scan of many
UNet evals — isolated small programs carry a ~30 ms dispatch+sync floor
under the axon tunnel (CLAUDE.md), so per-eval cost must be amortized.

Components measured:
  full        the production UNet eval
  attn_free   spatial transformers removed (attention_resolutions=())
              -> attention cost = full - attn_free
  gn_silu     microbench: scan of [GroupNorm+SiLU+conv] vs [conv] at the
              per-level shapes -> is the normalization already fused?

Also reports analytic FLOPs/eval and the implied MFU on v5e
(197 TFLOP/s bf16 peak).  Prints one JSON line per measurement.

Run on a QUIET TPU host: python examples/profile_unet.py
"""

# allow `python examples/<name>.py` from the repo root without installing
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from one2345_tpu.core.config import UNetConfig

V5E_BF16_PEAK = 197e12


def sync(x):
    """Drain the axon stream with a real fetch (block_until_ready lies
    right after compile — CLAUDE.md)."""
    np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1]


def time_scan(step, params, carry0, n_iter: int, label: str, reps: int = 3) -> float:
    """Min wall of a jitted scan of n_iter carry->carry evals, per-eval ms.

    ``params`` MUST be a jit argument, not a closure capture: captured
    params lower as multi-GB program constants and the remote compile
    tunnel chokes shipping them (measured: 3.35 GB -> broken pipe)."""

    @jax.jit
    def scanned(params, carry0):
        def body(c, _):
            return step(params, c), None

        out, _ = jax.lax.scan(body, carry0, None, length=n_iter)
        return out

    out = scanned(params, carry0)  # compile + warm
    sync(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = scanned(params, carry0)
        sync(out)
        times.append(time.perf_counter() - t0)
    ms = min(times) / n_iter * 1e3
    print(json.dumps({"component": label, "ms_per_eval": round(ms, 2),
                      "n_iter": n_iter, "reps_s": [round(t, 3) for t in times]}),
          flush=True)
    return ms


def build_unet(attn: bool = True):
    from one2345_tpu.diffusion.unet import UNetModel

    cfg = UNetConfig()
    unet = UNetModel(
        in_channels=cfg.in_channels,
        out_channels=cfg.out_channels,
        model_channels=cfg.model_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=tuple(cfg.attention_resolutions) if attn else (),
        channel_mult=tuple(cfg.channel_mult),
        num_heads=cfg.num_heads,
        transformer_depth=cfg.transformer_depth,
        context_dim=cfg.context_dim,
        dtype=jnp.bfloat16,
    )
    return unet, cfg


from one2345_tpu.core.profiling import unet_flops_per_eval as analytic_flops


def main():
    B = 56  # stage-2: 28 views x 2 CFG
    L = 32

    unet, cfg = build_unet(attn=True)
    x = jnp.zeros((B, L, L, cfg.in_channels), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)
    c = jnp.zeros((B, 1, cfg.context_dim), jnp.float32)
    params = jax.jit(unet.init)(jax.random.key(0), x, t, c)

    def step_full(p, x8):
        out = unet.apply(p, x8, t, c)  # [B, L, L, 4]
        return jnp.concatenate([out, out], axis=-1)  # recycle as 8-ch input

    ms_full = time_scan(step_full, params, x, 20, "full_unet_b56")

    def eval_full(params, t, c, x):
        return unet.apply(params, x, t, c)

    # XLA cost analysis (client-side when available) vs hand count
    flops = analytic_flops(B, L)
    try:
        comp = jax.jit(eval_full).lower(params, t, c, x).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        xla_flops = float(ca.get("flops", -1)) if ca else -1.0
    except Exception as e:  # noqa: BLE001 — backend-dependent
        xla_flops = -1.0
        print(json.dumps({"cost_analysis_error": str(e)[:120]}), flush=True)
    mfu = flops / (ms_full * 1e-3) / V5E_BF16_PEAK
    print(json.dumps({
        "component": "mfu", "analytic_tflops_per_eval": round(flops / 1e12, 3),
        "xla_flops_per_eval": xla_flops, "ms_per_eval": round(ms_full, 2),
        "mfu_vs_197tflops": round(mfu, 3),
    }), flush=True)

    # attention share
    unet_nf, _ = build_unet(attn=False)
    params_nf = jax.jit(unet_nf.init)(jax.random.key(0), x, t, c)

    def step_nf(p, x8):
        out = unet_nf.apply(p, x8, t, c)
        return jnp.concatenate([out, out], axis=-1)

    ms_nf = time_scan(step_nf, params_nf, x, 20, "attn_free_unet_b56")
    print(json.dumps({"component": "attention_share",
                      "ms": round(ms_full - ms_nf, 2),
                      "frac": round(1 - ms_nf / ms_full, 3)}), flush=True)

    # GroupNorm+SiLU fusion microbench at the per-level shapes
    import flax.linen as nn

    for chn, hw in ((320, 32), (640, 16), (1280, 8)):
        h0 = jnp.zeros((B, hw, hw, chn), jnp.bfloat16)

        class ConvOnly(nn.Module):
            @nn.compact
            def __call__(self, h):
                return nn.Conv(chn, (3, 3), padding="SAME", dtype=jnp.bfloat16)(h)

        class GnSiluConv(nn.Module):
            @nn.compact
            def __call__(self, h):
                h = nn.GroupNorm(num_groups=32, dtype=jnp.float32)(h)
                h = nn.silu(h)
                return nn.Conv(chn, (3, 3), padding="SAME", dtype=jnp.bfloat16)(h)

        m1, m2 = ConvOnly(), GnSiluConv()
        p1 = jax.jit(m1.init)(jax.random.key(0), h0)
        p2 = jax.jit(m2.init)(jax.random.key(0), h0)
        a = time_scan(lambda p, h: m1.apply(p, h), p1, h0, 50,
                      f"conv_only_{chn}x{hw}")
        b = time_scan(lambda p, h: m2.apply(p, h).astype(jnp.bfloat16), p2, h0, 50,
                      f"gn_silu_conv_{chn}x{hw}")
        print(json.dumps({"component": f"gn_silu_overhead_{chn}x{hw}",
                          "ms": round(b - a, 3),
                          "frac_of_conv": round(b / a - 1, 3)}), flush=True)


if __name__ == "__main__":
    main()
