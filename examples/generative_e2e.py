"""Fully GENERATIVE pipeline e2e: trained tiny zero123 -> recon -> mesh.

The final rung of the in-env evidence ladder (VERDICT r4 #2 "second
variant"):

  - `examples/diffusion_quality.py` proved the diffusion stage GENERATES
    correct view-conditioned images (held-out pose tokens through the
    production DDIM+CFG scan);
  - `examples/pipeline_wiring.py` proved the inter-stage CONTRACTS with an
    oracle diffusion stage (bit-identical handoff, flipped control
    collapses);
  - this module composes the two: a tiny zero123 TRAINED IN-ENV drives the
    production `One2345Pipeline.run` — real stage-1 sampling from the
    input view, real stage-2 sampling conditioned on the SAMPLED stage-1
    images (not GT), pinned elevation, trained recon — and the final
    world-frame mesh is scored against the GT box (CD/F-score), with an
    untrained-UNet control through the identical path that must collapse.

This is the reference's golden-example workflow (run.py:99-119 on
demo/demo_examples with zero123-xl + ckpt_215000 weights there),
substituted in-env by from-scratch training on rasters of a known object.

Training data mirrors the runner's conditioning graph exactly
(zero123_utils.py:109-120,175-176 delta-table semantics):
  cond = input view           -> targets at the 12 STAGE1 deltas
  cond = stage-1 view i (0..7)-> targets at the 4 STAGE2 deltas
so the model learns BOTH hops of the two-stage cascade; at run time the
second hop is conditioned on its own (imperfect) stage-1 samples, like
the production cascade.

    PYTHONPATH=/root/.axon_site:/root/repo python examples/generative_e2e.py \
        [--size 64 --diff-steps 8000 --recon-steps 1500] [--json out.json]
"""

# allow `python examples/<name>.py` from the repo root without installing
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

from examples.pipeline_wiring import (
    OracleZero123,
    render_pack_views,
    score_mesh_vs_world_box,
    train_recon_on_pack,
)


def build_training_set(polar: float, size: int):
    """GT rasters + (cond_idx, target_idx, dx, dy) pairs covering the
    runner's two-hop conditioning graph.  Image order: [input view,
    12 stage-1 views, 8x4 stage-2 views] — all rendered through the SAME
    oracle geometry the wiring proof validated (so recon's pack poses and
    the diffusion model's world agree by construction)."""
    from one2345_tpu.diffusion.zero123 import (
        STAGE1_DELTA_X, STAGE1_DELTA_Y, STAGE2_DELTA_X, STAGE2_DELTA_Y,
    )

    oracle = OracleZero123(polar, size)
    cond0 = np.asarray(oracle._render([0.0], [0.0]))  # [1, S, S, 3]
    s1 = np.asarray(oracle.stage1(None, None))  # [12, S, S, 3]
    # GT stage-2 for the 8 parents the polar<=75 branch selects
    s2 = np.asarray(oracle.stage2(s1[:8], None)).reshape(32, size, size, 3)

    images = np.concatenate([cond0, s1, s2], axis=0)  # [45, S, S, 3]
    pairs = []  # (cond_idx, target_idx, dx, dy)
    for i in range(12):
        pairs.append((0, 1 + i, STAGE1_DELTA_X[i], STAGE1_DELTA_Y[i]))
    for p in range(8):
        for j in range(4):
            pairs.append((1 + p, 13 + p * 4 + j,
                          STAGE2_DELTA_X[j], STAGE2_DELTA_Y[j]))
    return images, pairs


def train_tiny_zero123(images01, pairs, size: int, steps: int, batch: int,
                       vae_steps: int, sample_steps: int, cfg_scale: float,
                       seed: int, model_channels: int = 48,
                       lr: float = 4e-4, vae_lr: float = 2e-3,
                       log_every: int = 200):
    """Pretrained-VAE + production-trainer tiny zero123 on the two-hop
    pair set; returns (trained EMA stage, untrained-control stage, stats).
    Mirrors examples/diffusion_quality.py's protocol (docs/
    diffusion_quality.md) with multi-condition-view pairs."""
    import jax
    import jax.numpy as jnp

    from examples.diffusion_quality import pretrain_vae
    from one2345_tpu.core.config import (
        CLIPVisionConfig, DiffusionConfig, UNetConfig, VAEConfig,
    )
    from one2345_tpu.diffusion.zero123 import Zero123Stage, pose_tokens
    from one2345_tpu.training.zero123_trainer import Zero123Trainer

    latent = size // 4
    cfg_base = dict(
        ddim_steps_stage1=sample_steps, ddim_steps_stage2=sample_steps,
        image_size=size, latent_size=latent, cfg_scale=cfg_scale,
        unet=UNetConfig(model_channels=model_channels, channel_mult=(1, 2),
                        attention_resolutions=(2,), num_heads=4,
                        dtype="float32"),
        vae=VAEConfig(base_channels=24, channel_mult=(1, 2, 2),
                      num_res_blocks=1, dtype="float32"),
        clip=CLIPVisionConfig(image_size=32, patch_size=8, width=64,
                              layers=2, heads=4, dtype="float32"),
    )
    stage = Zero123Stage(DiffusionConfig(**cfg_base), seed=seed)
    images = jnp.asarray(images01 * 2.0 - 1.0)

    t0 = time.perf_counter()
    vae_params, vae_psnr, z_std = pretrain_vae(
        stage, images, vae_steps, vae_lr, batch, seed, log_every=log_every)
    vae_secs = time.perf_counter() - t0
    print(f"vae: recon {vae_psnr:.2f} dB, latent std {z_std:.3f} "
          f"({vae_secs:.0f}s)", flush=True)

    scale = 1.0 / max(float(z_std), 1e-3)
    cfg = DiffusionConfig(**{
        **cfg_base,
        "vae": VAEConfig(base_channels=24, channel_mult=(1, 2, 2),
                         num_res_blocks=1, dtype="float32",
                         scale_factor=scale),
    })
    params = dict(stage.params)
    params.update(vae_params)
    stage = Zero123Stage(cfg, params=params)

    # untrained control: fresh UNet/cc on the SAME pretrained VAE — the
    # identical pipeline path must collapse without the learned prior
    fresh = Zero123Stage(DiffusionConfig(**cfg_base), seed=seed + 1)
    params_untrained = dict(stage.params)
    params_untrained["unet"] = fresh.params["unet"]
    params_untrained["cc_projection"] = fresh.params["cc_projection"]
    stage_untrained = Zero123Stage(cfg, params=params_untrained)

    trainer = Zero123Trainer(stage, base_lr=lr, remat=False)
    state = trainer.init_state()
    frozen = {k: stage.params[k] for k in ("encoder", "clip")}

    cond_idx = np.array([p[0] for p in pairs])
    tgt_idx = np.array([p[1] for p in pairs])
    tokens = jnp.asarray(pose_tokens([p[2] for p in pairs],
                                     [p[3] for p in pairs]))
    cond_dev = images[jnp.asarray(cond_idx)]
    tgt_dev = images[jnp.asarray(tgt_idx)]
    n_pairs = len(pairs)

    t0 = time.perf_counter()
    key = jax.random.key(seed)
    first = last = None
    for i in range(steps):
        k_b, k_s = jax.random.split(jax.random.fold_in(key, i))
        idx = jax.random.randint(k_b, (batch,), 0, n_pairs)
        b = {"image_target": tgt_dev[idx], "image_cond": cond_dev[idx],
             "T": tokens[idx]}
        state, loss = trainer.train_step(state, frozen, b, k_s)
        if i % log_every == 0 or i == steps - 1:
            l = float(loss)
            first = l if first is None else first
            last = l
            print(f"step {i:5d}  eps_mse {l:.4f}", flush=True)
            if not np.isfinite(l):
                raise RuntimeError(f"diffusion training diverged at step {i}")
    train_secs = time.perf_counter() - t0

    params_ema = dict(stage.params)
    params_ema["unet"] = state.ema_params["unet"]
    params_ema["cc_projection"] = state.ema_params["cc_projection"]
    stage_trained = Zero123Stage(cfg, params=params_ema)
    stats = {
        "vae_psnr": round(vae_psnr, 2), "latent_std": round(float(z_std), 3),
        "eps_mse_first": round(first, 4), "eps_mse_last": round(last, 4),
        "vae_secs": round(vae_secs, 1), "diff_train_secs": round(train_secs, 1),
    }
    return stage_trained, stage_untrained, stats


class _ScaledPackRecon:
    """Recon adapter for size != 256: the runner builds the camera pack in
    its native 256^2 frame, but the tiny pipeline's images are size^2 —
    scale K/affine pixel rows to match (the training-side counterpart
    lives in train_recon_on_pack; recon_quality.py::scaled_camera_pack is
    the original)."""

    def __init__(self, stage, size: int):
        self.stage = stage
        self.s = size / 256.0

    def reconstruct(self, images, cameras, resolution=None, out_path=None):
        pk = dict(cameras)
        pk["intrinsics"] = np.array(cameras["intrinsics"], np.float64)
        pk["intrinsics"][:, :2] *= self.s
        pk["affines"] = np.array(cameras["affines"], np.float64)
        pk["affines"][:, :2] *= self.s
        return self.stage.reconstruct(images, pk, resolution=resolution,
                                      out_path=out_path)


def build_generative_pipeline(polar: float, size: int, zero123_stage,
                              recon_stage, sample_steps: int):
    """Production One2345Pipeline with the trained tiny diffusion stage and
    the trained recon swapped in; elevation pinned (LoFTR at random weights
    cannot estimate it — the contracts under test are sampling + recon)."""
    from one2345_tpu.core.config import DiffusionConfig, PipelineConfig
    from one2345_tpu.pipeline.runner import One2345Pipeline

    cfg = PipelineConfig(diffusion=DiffusionConfig(
        image_size=size, ddim_steps_stage1=sample_steps,
        ddim_steps_stage2=sample_steps))
    pipe = One2345Pipeline(cfg, use_sam=False, auto_mesh=False)
    pipe._zero123 = zero123_stage
    pipe._recon = (recon_stage if size == 256
                   else _ScaledPackRecon(recon_stage, size))
    pipe.estimate_elevation = lambda views: float(polar)
    return pipe


def run_benchmark(polar: float = 75.0, size: int = 64, batch: int = 16,
                  diff_steps: int = 8000, vae_steps: int = 2500,
                  recon_steps: int = 1500, n_rays: int = 512, vol: int = 48,
                  sample_steps: int = 25, cfg_scale: float = 3.0,
                  seed: int = 0, mesh_resolution: int = 128,
                  model_channels: int = 48, log_every: int = 200,
                  n_samples: int = 48, n_importance: int = 48,
                  with_untrained_control: bool = True,
                  save_npz: str | None = None) -> dict:
    import jax

    t_all = time.perf_counter()
    out: dict = {"polar": polar, "size": size, "diff_steps": diff_steps,
                 "recon_steps": recon_steps, "sample_steps": sample_steps}

    # ---- phase 1: tiny zero123 trained on the two-hop pair set
    images, pairs = build_training_set(polar, size)
    print(f"data: {images.shape[0]} x {size}^2 renders, {len(pairs)} pairs "
          f"({time.perf_counter() - t_all:.1f}s)", flush=True)
    stage_diff, stage_untrained, stats = train_tiny_zero123(
        images, pairs, size, diff_steps, batch, vae_steps, sample_steps,
        cfg_scale, seed, model_channels=model_channels, log_every=log_every)
    out.update(stats)

    # ---- phase 2: recon trained on GT pack views (the recon_quality /
    # tier-B protocol — the stand-in for the generalizable ckpt_215000)
    from one2345_tpu.geometry.cameras import build_recon_cameras

    pack = build_recon_cameras(polar)
    gt_imgs, gt_alphas = render_pack_views(pack, size)
    # normal_query_prob=0.0 = reference semantics: this benchmark's
    # headline is GEOMETRY through the generative cascade; production
    # blend-path color quality has its own benchmark (recon_quality's
    # nq=0.5 A/B) and its own flip discriminator here (best-view MAE)
    stage_recon = train_recon_on_pack(
        pack, gt_imgs, gt_alphas, recon_steps, n_rays, vol, seed=seed,
        log_every=max(log_every // 2, 50), n_samples=n_samples,
        n_importance=n_importance, mesh_resolution=mesh_resolution,
        normal_query_prob=0.0)

    # ---- phase 3: the full generative runner, trained vs untrained
    input_img = images[0]  # the GT input view (what SAM would hand over)
    runs = [("e2e", stage_diff)]
    if with_untrained_control:
        runs.append(("e2e_untrained", stage_untrained))
    for label, dstage in runs:
        pipe = build_generative_pipeline(polar, size, dstage, stage_recon,
                                         sample_steps)
        t0 = time.perf_counter()
        res = pipe.run(input_img, skip_preprocess=True, seed=seed,
                       mesh_resolution=mesh_resolution)
        secs = time.perf_counter() - t0
        src = np.asarray(res.stage2_images).reshape(32, size, size, 3)
        score = score_mesh_vs_world_box(
            res.vertices, res.faces, colors=res.colors, images=src,
            pack=pack, size=size)
        # sample quality along the way: the 32 source rows handed to recon
        # vs GT rasters at the pack poses (tier-A comparator, now
        # generative), and the 8 stage-1 samples vs their GT renders
        s2_psnr = [_psnr01(src[k], gt_imgs[1 + k]) for k in range(32)]
        s1 = np.asarray(res.stage1_images)
        s1_psnr = [_psnr01(s1[k], images[1 + k]) for k in range(s1.shape[0])]
        score.update({
            "stage1_psnr_mean": round(float(np.mean(s1_psnr)), 2),
            "stage2_psnr_mean": round(float(np.mean(s2_psnr)), 2),
            "stage2_psnr_min": round(float(np.min(s2_psnr)), 2),
            "run_secs": round(secs, 1),
        })
        out[label] = score
        print(json.dumps({label: score}), flush=True)
        if save_npz:
            np.savez_compressed(
                f"{save_npz}_{label}.npz", vertices=res.vertices,
                faces=res.faces, colors=res.colors, src=src,
                stage1=np.asarray(res.stage1_images))

    out["total_secs"] = round(time.perf_counter() - t_all, 1)
    return out


def _psnr01(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return float(-10.0 * np.log10(max(mse, 1e-10)))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--polar", type=float, default=75.0)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--diff-steps", type=int, default=8000)
    p.add_argument("--vae-steps", type=int, default=2500)
    p.add_argument("--recon-steps", type=int, default=1500)
    p.add_argument("--rays", type=int, default=512)
    p.add_argument("--vol", type=int, default=48)
    p.add_argument("--sample-steps", type=int, default=25)
    p.add_argument("--json", default=None)
    p.add_argument("--save-npz", default=None,
                   help="prefix for per-run mesh/sample artifact dumps "
                        "(offline rescoring without retraining)")
    args = p.parse_args(argv)

    out = run_benchmark(
        polar=args.polar, size=args.size, batch=args.batch,
        diff_steps=args.diff_steps, vae_steps=args.vae_steps,
        recon_steps=args.recon_steps, n_rays=args.rays, vol=args.vol,
        sample_steps=args.sample_steps, save_npz=args.save_npz)
    print(json.dumps(out), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    _sys.exit(main())
