"""Generalizable-reconstruction training CLI.

Parity target: exp_runner_generic_blender_train.py --mode train
(Adam 2e-4 cosine, grad clip 1.0, 200k iters, 512 rays, one scene per
replica via DataParallel) — here scenes shard over the `data` mesh axis.

    python -m one2345_tpu.training.train_recon --data_root exp/ --max_steps 200000
"""

from __future__ import annotations

import argparse
import time


def build_parser():
    p = argparse.ArgumentParser(description="SparseNeuS generic training (TPU)")
    p.add_argument("--data_root", type=str, required=True, help="root of shape dirs")
    p.add_argument("--max_steps", type=int, default=200_000)
    p.add_argument("--learning_rate", type=float, default=2e-4)
    p.add_argument("--n_rays", type=int, default=512)
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32",
                   help="conv-path compute dtype (f32 = reference numerics)")
    p.add_argument("--num_lods", type=int, choices=[1, 2], default=1,
                   help="2 = coarse-to-fine training with the separate lod1 "
                        "networks (trainer_generic train_step:269-319)")
    p.add_argument("--fix_lod0", action="store_true",
                   help="freeze the lod0 networks and train only lod1 "
                        "(if_fix_lod0_networks)")
    p.add_argument("--ckpt_every", type=int, default=5000)  # conf save_freq
    p.add_argument("--log_every", type=int, default=100)  # conf report_freq
    p.add_argument("--val_every", type=int, default=0,
                   help="render a full-image validation panel + PSNR every "
                        "N steps (conf val_freq / GenericTrainer val_step; "
                        "0 = off)")
    p.add_argument("--exp_dir", type=str, default="exp/recon_train")
    p.add_argument("--init_params", type=str, default=None)
    p.add_argument("--resume", action="store_true", help="resume from latest step dir")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import numpy as np

    from one2345_tpu.core import checkpoint
    from one2345_tpu.core.compile_cache import enable as enable_cache
    from one2345_tpu.core.config import ReconConfig
    from one2345_tpu.core.logging import MetricsLogger
    from one2345_tpu.core.meshes import create_mesh
    from one2345_tpu.recon.pipeline import ReconStage
    from one2345_tpu.training.data import Prefetcher, ReconScenesDataset
    from one2345_tpu.training.recon_trainer import ReconTrainer, ReconTrainState

    enable_cache()
    mesh = create_mesh(("data",))
    n_dev = len(jax.devices())

    cfg = ReconConfig(learning_rate=args.learning_rate, end_iter=args.max_steps,
                      n_rays=args.n_rays, dtype=args.dtype,
                      num_lods=args.num_lods, fix_lod0_networks=args.fix_lod0)
    params = checkpoint.restore(args.init_params) if args.init_params else None
    stage = ReconStage(cfg, params)
    trainer = ReconTrainer(stage, cfg)
    state = trainer.init_state()
    start_step = 0
    if args.resume:
        latest = checkpoint.latest_step_dir(args.exp_dir)
        if latest:
            restored = checkpoint.restore(latest)
            state = ReconTrainState(**restored)
            start_step = int(np.asarray(state.step))
            print(f"resumed from {latest} at step {start_step}", flush=True)

    ds = ReconScenesDataset(args.data_root, n_rays=args.n_rays)

    def scene_batches():
        while True:
            scenes = [ds.sample_scene() for _ in range(n_dev)]
            yield {
                k: np.stack([s[k] for s in scenes]).astype(np.float32)
                for k in scenes[0]
            }

    batches = Prefetcher(scene_batches())
    logger = MetricsLogger(args.exp_dir)
    key = jax.random.key(start_step)
    t0 = time.time()
    validator = None
    for step_idx in range(start_step, args.max_steps):
        batch = next(batches)
        key, k = jax.random.split(key)
        state, metrics = trainer.train_step(state, batch, k)
        if args.val_every and step_idx > 0 and step_idx % args.val_every == 0:
            # val_step parity: full-image render of scene 0's query view,
            # panel + PSNR (GenericTrainer.val_step, trainer_generic:359)
            import os

            from PIL import Image as PILImage

            from one2345_tpu.recon.validation import Validator

            stage.params = trainer.stage_variables(state)
            if validator is None:
                validator = Validator(stage)
            sc = ds.load_scene(0)
            os.makedirs(f"{args.exp_dir}/val", exist_ok=True)
            lods = range(args.num_lods)  # val_step renders every lod
            for lod in lods:
                res = validator.render_view(sc["images"][1:], sc["cameras"], lod=lod)
                val_psnr = Validator.psnr(res["color"], sc["images"][0])
                panel = Validator.panel(res, sc["images"][0])
                suffix = "" if lod == 0 else f"_lod{lod}"
                PILImage.fromarray(
                    (np.clip(panel, 0, 1) * 255).astype(np.uint8)
                ).save(f"{args.exp_dir}/val/step_{step_idx:06d}{suffix}.png")
                logger.log(step_idx, **{f"val_psnr{suffix}": float(val_psnr)})
                print(f"val step {step_idx}: psnr{suffix}={val_psnr:.2f}", flush=True)
        if step_idx % args.log_every == 0:
            m = {k2: float(v) for k2, v in metrics.items()}
            m["steps_per_sec"] = args.log_every / max(time.time() - t0, 1e-9)
            logger.log(step_idx, **m)
            print(f"step {step_idx} " + " ".join(f"{k2}={v:.4f}" for k2, v in m.items()), flush=True)
            t0 = time.time()
        if step_idx > 0 and step_idx % args.ckpt_every == 0:
            checkpoint.save(
                f"{args.exp_dir}/step_{step_idx:06d}", jax.device_get(state._asdict())
            )
    checkpoint.save(
        f"{args.exp_dir}/step_{args.max_steps:06d}", jax.device_get(state._asdict())
    )
    logger.close()


if __name__ == "__main__":
    main()
