"""Zero123 finetune training CLI — the `main.py` the reference omits.

    python -m one2345_tpu.training.train_zero123 \
        --data_root views_whole_sphere --batch_size 192 --max_steps 100000

Reconstructs the training contract of configs/sd-objaverse-finetune-
c_concat-256.yaml (AdamW 1e-4, warmup 100, ckpt every 5000, EMA) with
data-parallel sharding over the device mesh.
"""

from __future__ import annotations

import argparse
import time


def build_parser():
    p = argparse.ArgumentParser(description="Zero123-XL finetune (TPU)")
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=192)
    p.add_argument("--base_lr", type=float, default=1e-4)
    p.add_argument("--max_steps", type=int, default=100_000)
    p.add_argument("--ckpt_every", type=int, default=5000)  # yaml modelcheckpoint
    p.add_argument("--log_every", type=int, default=50)
    # ImageLogger parity (yaml:96-111): periodic EMA sample grids
    p.add_argument("--sample_every", type=int, default=2000,
                   help="dump EMA sample grids every N steps (0 = off)")
    p.add_argument("--sample_views", type=int, default=4)
    p.add_argument("--sample_steps", type=int, default=25)
    p.add_argument("--exp_dir", type=str, default="exp/zero123_finetune")
    p.add_argument("--init_params", type=str, default=None, help="orbax dir (converted zero123-xl)")
    p.add_argument("--model_shards", type=int, default=1, help="FSDP-style param sharding factor")
    p.add_argument("--total_views", type=int, default=12)
    return p


def log_samples(stage, state, sample_batch, out_path: str, steps: int, seed: int):
    """EMA sample grid: rows = (conditioning image, sampled view, target)
    — the Lightning ImageLogger callback's role (yaml:96-111)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from one2345_tpu.utils.image import image_grid

    ema = jax.device_get(state.ema_params)
    params = {**stage.params, "unet": ema["unet"],
              "cc_projection": ema["cc_projection"]}
    sched = stage._schedule(steps)
    cond = jnp.asarray(sample_batch["image_cond"])
    T = jnp.asarray(sample_batch["T"])
    samples = np.asarray(stage._sample_views_jit(
        params, cond, T, jax.random.key(seed),
        jnp.arange(cond.shape[0], dtype=jnp.uint32), sched,
        cfg_scale=stage.config.cfg_scale,
    ))  # [B, H, W, 3] in [0, 1]
    cond01 = (np.asarray(sample_batch["image_cond"]) + 1.0) / 2.0
    target01 = (np.asarray(sample_batch["image_target"]) + 1.0) / 2.0
    B = samples.shape[0]
    grid = image_grid(
        np.concatenate([cond01, samples, target01]).astype(np.float32), 3, B
    )
    Image.fromarray((np.clip(grid, 0, 1) * 255).astype(np.uint8)).save(out_path)
    return out_path


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax

    from one2345_tpu.core import checkpoint
    from one2345_tpu.core.compile_cache import enable as enable_cache
    from one2345_tpu.core.config import DiffusionConfig
    from one2345_tpu.core.logging import MetricsLogger
    from one2345_tpu.core.meshes import create_mesh
    from one2345_tpu.diffusion.zero123 import Zero123Stage
    from one2345_tpu.training.data import ObjaverseViewsDataset, Prefetcher
    from one2345_tpu.training.zero123_trainer import Zero123Trainer

    enable_cache()
    n_dev = len(jax.devices())
    mesh = create_mesh(("data", "model"), (n_dev // args.model_shards, args.model_shards))

    params = checkpoint.restore(args.init_params) if args.init_params else None
    stage = Zero123Stage(DiffusionConfig(), params)
    trainer = Zero123Trainer(stage, base_lr=args.base_lr)
    step_fn, state_sh, frozen_sh = trainer.make_sharded_train_step(
        mesh, shard_params=args.model_shards > 1
    )
    state = jax.device_put(trainer.init_state(), state_sh)
    frozen = jax.device_put(
        {k: stage.params[k] for k in ("encoder", "clip")}, frozen_sh
    )

    import glob
    import os

    tars = (
        sorted(glob.glob(os.path.join(args.data_root, "*.tar")))
        if os.path.isdir(args.data_root)
        else sorted(glob.glob(args.data_root))
    )
    if tars and all(t.endswith(".tar") for t in tars):
        # webdataset-style tar shards (the reference's training ingestion)
        from one2345_tpu.training.data import ObjaverseTarShards

        ds = ObjaverseTarShards(tars, image_size=stage.config.image_size)
    else:
        ds = ObjaverseViewsDataset(
            args.data_root, total_views=args.total_views,
            image_size=stage.config.image_size,
        )
    batches = Prefetcher(ds.batches(args.batch_size))
    logger = MetricsLogger(args.exp_dir)

    key = jax.random.key(0)
    t0 = time.time()
    sample_batch = None
    for step_idx in range(args.max_steps):
        batch = next(batches)
        if sample_batch is None and args.sample_every:
            import os

            os.makedirs(f"{args.exp_dir}/samples", exist_ok=True)
            n = args.sample_views
            sample_batch = {k2: v[:n] for k2, v in batch.items()}
        key, k = jax.random.split(key)
        state, loss = step_fn(state, frozen, batch, k)
        if args.sample_every and step_idx > 0 and step_idx % args.sample_every == 0:
            path = log_samples(
                stage, state, sample_batch,
                f"{args.exp_dir}/samples/step_{step_idx:06d}.png",
                args.sample_steps, step_idx,
            )
            print(f"sample grid -> {path}", flush=True)
        if step_idx % args.log_every == 0:
            loss = float(loss)
            rate = args.log_every * args.batch_size / max(time.time() - t0, 1e-9)
            logger.log(step_idx, loss=loss, samples_per_sec=rate)
            print(f"step {step_idx} loss {loss:.4f} ({rate:.1f} samples/s)", flush=True)
            t0 = time.time()
        if step_idx > 0 and step_idx % args.ckpt_every == 0:
            checkpoint.save(f"{args.exp_dir}/step_{step_idx:06d}", jax.device_get(state.params))
    checkpoint.save(f"{args.exp_dir}/step_{args.max_steps:06d}", jax.device_get(state.params))
    logger.close()


if __name__ == "__main__":
    main()
