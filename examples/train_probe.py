"""Zero123 finetune throughput on one chip at production scale.

Measures steps/sec of `Zero123Trainer.train_step` (full 860M-param SD
UNet, 256^2 images, remat backward, f32 params + Adam + EMA, bf16
compute) — the single-chip building block of the sharded trainer that
`__graft_entry__.dryrun_multichip` validates on the virtual mesh.
Run on a QUIET host.  One JSON line.

    PYTHONPATH=/root/.axon_site:/root/repo python examples/train_probe.py [--batch 4]

Reference scale for context: the reference finetunes Zero123 at batch
192 across 8xA100-80GB (README + zero123 configs); per-chip HBM on v5e
(16 GB) bounds the local batch instead — the DP/model-sharded trainer
(training/zero123_trainer.py::make_sharded_train_step) is the scale-out
path.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def recon_probe(iters: int = 8):
    """ReconTrainer.train_step at the production contract (512 rays,
    96^3 volume, 64+64 samples, 32 source views at 256^2) — the per-step
    cost behind the reference's 200k-iteration schedule
    (exp_runner_generic_blender_train.py:211-403)."""
    import jax
    import jax.numpy as jnp

    from one2345_tpu.core.config import ReconConfig
    from one2345_tpu.recon.pipeline import ReconStage
    from one2345_tpu.training.recon_trainer import ReconTrainer

    cfg = ReconConfig()
    stage = ReconStage(cfg, seed=0)
    trainer = ReconTrainer(stage, cfg)
    state = trainer.init_state()

    rng = np.random.default_rng(0)
    V, H, W, N = 33, 256, 256, cfg.n_rays
    o = rng.normal(0, 1, (N, 3))
    v = o / np.linalg.norm(o, axis=-1, keepdims=True)
    scene = {
        "images": jnp.asarray(rng.uniform(0, 1, (1, V, H, W, 3)), jnp.float32),
        "affines": jnp.asarray(np.tile(np.eye(4), (1, V, 1, 1)), jnp.float32),
        "w2cs": jnp.asarray(np.tile(np.eye(4), (1, V, 1, 1)), jnp.float32),
        "intrinsics": jnp.asarray(np.tile(np.eye(3), (1, V, 1, 1)), jnp.float32),
        "near_far": jnp.asarray([[0.5, 1.8]], jnp.float32),
        "rays_o": jnp.asarray(-1.5 * v[None], jnp.float32),
        "rays_v": jnp.asarray(v[None], jnp.float32),
        "rays_color": jnp.asarray(rng.uniform(0, 1, (1, N, 3)), jnp.float32),
        "rays_mask": jnp.ones((1, N, 1), jnp.float32),
    }
    state, metrics = trainer.train_step(state, scene, jax.random.key(0))
    _ = np.asarray(metrics["loss"])  # drain

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = trainer.train_step(state, scene, jax.random.key(i + 1))
    final = float(np.asarray(metrics["loss"]))
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "component": "recon_train_step",
        "n_rays": N, "vol_dims": list(cfg.vol_dims), "views": V - 1,
        "sec_per_step": round(dt, 4),
        "steps_per_sec": round(1.0 / dt, 3),
        "loss_finite": bool(np.isfinite(final)),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--recon", action="store_true",
                    help="probe the recon trainer instead of zero123")
    args = ap.parse_args()

    if args.recon:
        recon_probe(args.iters)
        return

    from one2345_tpu.core.config import DiffusionConfig
    from one2345_tpu.diffusion.zero123 import Zero123Stage
    from one2345_tpu.training.zero123_trainer import Zero123Trainer

    cfg = DiffusionConfig()
    stage = Zero123Stage(cfg, seed=0)
    trainer = Zero123Trainer(stage, remat=True)
    state = trainer.init_state()
    frozen = {k: stage.params[k] for k in ("encoder", "clip")}

    B, S = args.batch, cfg.image_size
    rng = np.random.default_rng(0)
    batch = {
        "image_target": jnp.asarray(rng.uniform(-1, 1, (B, S, S, 3)), jnp.float32),
        "image_cond": jnp.asarray(rng.uniform(-1, 1, (B, S, S, 3)), jnp.float32),
        "T": jnp.asarray(rng.uniform(-1, 1, (B, 1, 4)), jnp.float32),
    }
    key = jax.random.key(0)

    state, loss = trainer.train_step(state, frozen, batch, key)  # compile
    _ = np.asarray(loss)  # drain (axon block_until_ready lies post-compile)

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, loss = trainer.train_step(state, frozen, batch, jax.random.key(i + 1))
    final = float(np.asarray(loss))
    dt = (time.perf_counter() - t0) / args.iters

    hbm = {}
    try:
        stats = jax.devices()[0].memory_stats() or {}
        for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            if k in stats:
                hbm[k.replace("bytes", "gib")] = round(stats[k] / 2**30, 2)
    except Exception:  # noqa: BLE001 — memory_stats unsupported on some backends
        pass
    print(json.dumps({
        "component": "zero123_train_step",
        "batch": B,
        "image_size": S,
        "sec_per_step": round(dt, 4),
        "steps_per_sec": round(1.0 / dt, 3),
        "images_per_sec": round(B / dt, 2),
        "loss_finite": bool(np.isfinite(final)),
        **hbm,
    }), flush=True)


if __name__ == "__main__":
    main()
