"""In-env diffusion quality benchmark: train -> sample held-out poses -> PSNR.

The mirror of examples/recon_quality.py for the diffusion stage — the one
piece of evidence that separates "the zero123 trainer's loss falls" from
"the framework generates correct view-conditioned images" without real
checkpoints:

1. rasterize a KNOWN asymmetric colored object (the recon-quality box)
   from cameras on the zero123 view sphere;
2. pretrain the tiny AutoencoderKL on those views (SD's first stage is
   pretrained separately and FROZEN during diffusion training — a random
   frozen VAE would destroy the signal this benchmark measures), then set
   scale_factor = 1/std(z) exactly the way SD's 0.18215 was chosen;
3. train the production `Zero123Trainer` (eps-MSE, hybrid conditioning
   through the production CCProjection, 5%/5%/5% CFG dropout, AdamW
   warmup, EMA — ddpm.py:1004-1037 contract) on (cond view, target view,
   relative pose token) pairs;
4. sample HELD-OUT pose tokens through the production DDIM+CFG scan
   (`Zero123Stage.sample_views`, the exact pipeline sampling path) and
   score PSNR/SSIM vs the rasterized GT at those poses, vs an untrained
   UNet baseline (same pretrained VAE), and a cross-pose discrimination
   matrix: sample(delta_i) must match GT(delta_i) better than GT(delta_j)
   — generated content must MOVE with the pose token, which memorizing
   one view cannot fake.

Mirrors what the reference demonstrates with zero123-xl via
utils/zero123_utils.py:60-134 (trained per
configs/sd-objaverse-finetune-c_concat-256.yaml), substituting a
synthetic-data overfit for the unavailable checkpoint.

    PYTHONPATH=/root/.axon_site:/root/repo python examples/diffusion_quality.py \
        [--steps 4000] [--res 64] [--json out.json]

Defaults are sized for the one-v5e TPU run; the CI test
(tests/test_diffusion_quality.py) injects tiny values via run_benchmark().
"""

# allow `python examples/<name>.py` from the repo root without installing
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


# -------------------------------------------------------------- data


def render_pose_views(polar_deg, azimuth_deg, res: int, radius: float = 1.6):
    """White-background rasterized views of the recon-quality GT box from
    spherical look-at cameras (the zero123 view-sphere geometry,
    utils/utils.py:80-104).  Returns [N, res, res, 3] float32 in [0, 1]."""
    from examples.recon_quality import make_gt_box
    from one2345_tpu.eval.render_harness import rasterize
    from one2345_tpu.geometry.cameras import BLENDER2OPENCV, spherical_look_at_poses

    verts, faces, colors = make_gt_box()
    c2ws = spherical_look_at_poses(
        np.radians(np.asarray(polar_deg, np.float64)),
        np.radians(np.asarray(azimuth_deg, np.float64)),
        radius=radius,
    ) @ BLENDER2OPENCV
    w2cs = np.linalg.inv(c2ws)
    f = res * 1.2  # wide enough that the box fills most of the frame
    K = np.array([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1.0]])

    imgs = []
    for i in range(w2cs.shape[0]):
        rgb, _ = rasterize(
            verts, faces, colors, K, w2cs[i].astype(np.float32),
            res=res, shade=False,
        )
        imgs.append(rgb)
    return np.stack(imgs).astype(np.float32)


def make_view_plan(cond_polar: float = 75.0, dx_set=(-20.0, 0.0, 20.0),
                   n_azim: int = 12,
                   heldout=((0.0, 45.0), (0.0, 135.0), (0.0, 225.0),
                            (0.0, 315.0), (20.0, 105.0), (-20.0, 285.0))):
    """(cond pose, train deltas, held-out deltas) on the zero123 sphere.

    Deltas are (delta_polar_deg, delta_azimuth_deg) RELATIVE to the cond
    view, exactly what `pose_tokens` encodes ((radians dx, sin dy, cos dy,
    0), zero123_utils.py:60-98).  Held-out deltas sit between the training
    azimuth grid lines, so passing them requires interpolating the pose
    conditioning, not replaying a memorized view.
    """
    train = [
        (dx, dy)
        for dx in dx_set
        for dy in np.linspace(0.0, 360.0, n_azim, endpoint=False)
    ]
    held = [h for h in heldout if h not in train]
    return (cond_polar, 0.0), train, held


# ----------------------------------------------------- VAE pretraining


def pretrain_vae(stage, images_pm1, steps: int, lr: float, batch: int,
                 seed: int, kl_weight: float = 1e-6, log_every: int = 200):
    """Autoencoder pretraining of the stage's Encoder/Decoder on the rig
    views (recon MSE + KL, the AutoencoderKL objective minus the
    discriminator — reference yaml:45-67 first stage).  Returns
    (vae_params {'encoder','decoder'}, recon_psnr, latent_std)."""
    import jax
    import jax.numpy as jnp
    import optax

    from one2345_tpu.diffusion.vae import moments_sample

    imgs = jnp.asarray(images_pm1)
    N = imgs.shape[0]
    params = {"encoder": stage.params["encoder"], "decoder": stage.params["decoder"]}
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(p, x, key):
        moments = stage.encoder.apply(p["encoder"], x)
        z = moments_sample(moments, key)
        rec = stage.decoder.apply(p["decoder"], z)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        kl = 0.5 * jnp.mean(mean**2 + jnp.exp(logvar) - 1.0 - logvar)
        return jnp.mean((rec - x) ** 2) + kl_weight * kl

    @jax.jit
    def step_fn(p, o, x, key):
        loss, g = jax.value_and_grad(loss_fn)(p, x, key)
        updates, o = tx.update(g, o)
        return optax.apply_updates(p, updates), o, loss

    key = jax.random.key(seed + 31)
    for i in range(steps):
        k_b, k_z = jax.random.split(jax.random.fold_in(key, i))
        idx = jax.random.randint(k_b, (batch,), 0, N)
        params, opt_state, loss = step_fn(params, opt_state, imgs[idx], k_z)
        if i % log_every == 0 or i == steps - 1:
            l = float(loss)
            print(f"vae step {i:5d}  loss {l:.5f}", flush=True)
            if not np.isfinite(l):
                raise RuntimeError(f"VAE pretraining diverged at step {i}")

    # reconstruction PSNR (mode latent, the sampling path's decode input
    # statistics) + latent std for the scale_factor calibration
    moments = stage.encoder.apply(params["encoder"], imgs)
    from one2345_tpu.diffusion.vae import moments_mode

    z = moments_mode(moments)
    rec = stage.decoder.apply(params["decoder"], z)
    mse = float(jnp.mean((rec - imgs) ** 2))
    # images are in [-1,1] (range 2) -> normalize to [0,1] PSNR convention
    psnr = float(-10.0 * np.log10(max(mse / 4.0, 1e-10)))
    std = float(jnp.std(z))
    return params, psnr, std


# ----------------------------------------------------------- scoring


def psnr01(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return float(-10.0 * np.log10(max(mse, 1e-10)))


def ssim01(a: np.ndarray, b: np.ndarray) -> float:
    """Global-statistics SSIM on [0,1] images (single-window variant —
    enough to rank 'structured object' vs 'noise' without scipy)."""
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    mu_a, mu_b = a.mean(), b.mean()
    va, vb = a.var(), b.var()
    cov = float(np.mean((a - mu_a) * (b - mu_b)))
    c1, c2 = 0.01**2, 0.03**2
    return float(((2 * mu_a * mu_b + c1) * (2 * cov + c2))
                 / ((mu_a**2 + mu_b**2 + c1) * (va + vb + c2)))


# --------------------------------------------------------- benchmark


def run_benchmark(
    steps: int = 4000,
    res: int = 64,
    batch: int = 16,
    vae_steps: int = 3000,
    vae_lr: float = 2e-3,
    lr: float = 4e-4,
    sample_steps: int = 25,
    cfg_scale: float = 3.0,
    seed: int = 0,
    model_channels: int = 48,
    n_azim: int = 12,
    log_every: int = 200,
    sampler: str = "ddim",
    out_png: str | None = None,
    eval_variants: tuple = (),
) -> dict:
    import jax
    import jax.numpy as jnp

    from one2345_tpu.core.config import (
        CLIPVisionConfig, DiffusionConfig, UNetConfig, VAEConfig,
    )
    from one2345_tpu.diffusion.zero123 import Zero123Stage, pose_tokens
    from one2345_tpu.training.zero123_trainer import Zero123Trainer

    t_all = time.perf_counter()
    (cond_polar, cond_azim), train_deltas, held_deltas = make_view_plan(
        n_azim=n_azim)

    # rasterized GT on the view sphere — cond view first, then train
    # targets, then held-out targets
    all_deltas = [(0.0, 0.0)] + train_deltas + held_deltas
    polars = [cond_polar + dx for dx, _ in all_deltas]
    azims = [cond_azim + dy for _, dy in all_deltas]
    views01 = render_pose_views(polars, azims, res)
    views = views01 * 2.0 - 1.0  # [-1, 1] (the trainer/VAE contract)
    cond01 = views01[0]
    train_targets = views[1 : 1 + len(train_deltas)]
    held_gt01 = views01[1 + len(train_deltas) :]
    print(f"data: {len(all_deltas)} x {res}^2 box renders "
          f"({time.perf_counter() - t_all:.1f}s)", flush=True)

    # tiny-but-real config on the production module classes.  VAE
    # channel_mult (1,2,2) -> factor-4 downsample: latent res/4.
    latent = res // 4
    cfg_base = dict(
        ddim_steps_stage1=sample_steps, ddim_steps_stage2=sample_steps,
        image_size=res, latent_size=latent, sampler=sampler,
        cfg_scale=cfg_scale,
        unet=UNetConfig(
            model_channels=model_channels, channel_mult=(1, 2),
            attention_resolutions=(2,), num_heads=4, dtype="float32",
        ),
        vae=VAEConfig(base_channels=24, channel_mult=(1, 2, 2),
                      num_res_blocks=1, dtype="float32"),
        clip=CLIPVisionConfig(image_size=32, patch_size=8, width=64,
                              layers=2, heads=4, dtype="float32"),
    )
    stage = Zero123Stage(DiffusionConfig(**cfg_base), seed=seed)

    # ---- phase 1: first-stage autoencoder (pretrained + frozen, like SD)
    t0 = time.perf_counter()
    vae_params, vae_psnr, z_std = pretrain_vae(
        stage, views, vae_steps, vae_lr, batch, seed, log_every=log_every)
    vae_secs = time.perf_counter() - t0
    print(f"vae: recon {vae_psnr:.2f} dB, latent std {z_std:.3f} "
          f"({vae_secs:.0f}s)", flush=True)

    # scale_factor = 1/std(z): the same calibration that produced SD's
    # 0.18215 (ddpm.py:483 'scale_factor' rationale) — diffusion assumes
    # unit-variance data
    scale = 1.0 / max(z_std, 1e-3)
    cfg = DiffusionConfig(**{
        **cfg_base,
        "vae": VAEConfig(base_channels=24, channel_mult=(1, 2, 2),
                         num_res_blocks=1, dtype="float32",
                         scale_factor=scale),
    })
    params = dict(stage.params)
    params.update(vae_params)
    stage = Zero123Stage(cfg, params=params)

    # ---- untrained baseline samples FIRST (same pretrained VAE, fresh
    # UNet/cc): the trained model must beat this decisively
    held_T = np.asarray(held_deltas, np.float64)
    cond_batch = jnp.asarray(
        np.tile((cond01 * 2.0 - 1.0)[None], (len(held_deltas), 1, 1, 1)))
    k_sample = jax.random.key(seed + 77)

    def sample_held(st, steps_=None, sampler_=None):
        out = st.sample_views(
            cond_batch, held_T[:, 0], held_T[:, 1], k_sample,
            steps=steps_ or sample_steps, cfg_scale=cfg_scale,
            sampler=sampler_ or sampler,
        )
        return np.asarray(out, np.float32)

    t0 = time.perf_counter()
    samples_untrained = sample_held(stage)
    print(f"untrained samples ({time.perf_counter() - t0:.0f}s)", flush=True)

    # ---- phase 2: production zero123 training on (cond, target, T) pairs
    trainer = Zero123Trainer(stage, base_lr=lr, remat=False)
    state = trainer.init_state()
    frozen = {k: stage.params[k] for k in ("encoder", "clip")}

    train_T = jnp.asarray(pose_tokens(
        [d[0] for d in train_deltas], [d[1] for d in train_deltas]))
    targets_dev = jnp.asarray(train_targets)
    cond_dev = jnp.asarray(cond01 * 2.0 - 1.0)
    n_train = len(train_deltas)

    t0 = time.perf_counter()
    key = jax.random.key(seed)
    losses = []
    for i in range(steps):
        k_b, k_s = jax.random.split(jax.random.fold_in(key, i))
        idx = jax.random.randint(k_b, (batch,), 0, n_train)
        b = {
            "image_target": targets_dev[idx],
            "image_cond": jnp.tile(cond_dev[None], (batch, 1, 1, 1)),
            "T": train_T[idx],
        }
        state, loss = trainer.train_step(state, frozen, b, k_s)
        if i % log_every == 0 or i == steps - 1:
            l = float(loss)
            losses.append(l)
            print(f"step {i:5d}  eps_mse {l:.4f}", flush=True)
            if not np.isfinite(l):
                raise RuntimeError(f"training diverged at step {i}")
    train_secs = time.perf_counter() - t0

    # ---- phase 3: sample held-out pose tokens through the production
    # DDIM+CFG scan with the EMA weights (the reference samples EMA,
    # ddpm.py LitEma)
    params_ema = dict(stage.params)
    params_ema["unet"] = state.ema_params["unet"]
    params_ema["cc_projection"] = state.ema_params["cc_projection"]
    stage_trained = Zero123Stage(cfg, params=params_ema)
    t0 = time.perf_counter()
    samples = sample_held(stage_trained)
    sample_secs = time.perf_counter() - t0

    # diagnostic: live (non-EMA) weights through the same path — separates
    # "model didn't learn" from "EMA lags" (LitEma warmup, ema.py:26-30)
    params_live = dict(stage.params)
    params_live["unet"] = state.params["unet"]
    params_live["cc_projection"] = state.params["cc_projection"]
    samples_live = sample_held(Zero123Stage(cfg, params=params_live))

    if out_png is not None:
        from PIL import Image

        from one2345_tpu.utils.image import image_grid

        rows = np.concatenate([samples, held_gt01, samples_untrained])
        grid = image_grid(rows, rows=3, cols=len(held_deltas))
        Image.fromarray((np.clip(grid, 0, 1) * 255).astype(np.uint8)).save(out_png)

    # ---- scoring
    H = len(held_deltas)
    psnr_tr = [psnr01(samples[i], held_gt01[i]) for i in range(H)]
    psnr_un = [psnr01(samples_untrained[i], held_gt01[i]) for i in range(H)]
    psnr_lv = [psnr01(samples_live[i], held_gt01[i]) for i in range(H)]
    ssim_tr = [ssim01(samples[i], held_gt01[i]) for i in range(H)]

    # cross-pose discrimination: sample(d_i) must be closest to GT(d_i).
    # score against the GT at EVERY held-out pose; hits = argmax on-diag
    cross = np.array([[psnr01(samples[i], held_gt01[j]) for j in range(H)]
                      for i in range(H)])
    pose_hits = int(np.sum(np.argmax(cross, axis=1) == np.arange(H)))
    off_diag = (cross.sum(axis=1) - np.diag(cross)) / (H - 1)
    pose_margin = float(np.mean(np.diag(cross) - off_diag))

    out = {
        "steps": steps, "res": res, "batch": batch, "n_train": n_train,
        "n_heldout": H, "sample_steps": sample_steps, "sampler": sampler,
        "cfg_scale": cfg_scale,
        "vae_steps": vae_steps, "vae_psnr": round(vae_psnr, 2),
        "latent_std": round(z_std, 3), "scale_factor": round(scale, 3),
        "eps_mse_first": round(losses[0], 4),
        "eps_mse_last": round(losses[-1], 4),
        "psnr_heldout": round(float(np.mean(psnr_tr)), 2),
        "psnr_heldout_min": round(float(np.min(psnr_tr)), 2),
        "psnr_heldout_untrained": round(float(np.mean(psnr_un)), 2),
        "psnr_heldout_live": round(float(np.mean(psnr_lv)), 2),
        "ssim_heldout": round(float(np.mean(ssim_tr)), 4),
        "pose_hits": pose_hits,
        "pose_margin_db": round(pose_margin, 2),
        "vae_secs": round(vae_secs, 1),
        "train_secs": round(train_secs, 1),
        "sec_per_step": round(train_secs / steps, 4),
        "sample_secs": round(sample_secs, 1),
        "total_secs": round(time.perf_counter() - t_all, 1),
    }

    # ---- optional fast-mode quality A/B: the SAME trained EMA weights
    # sampled through each opt-in serving variant (sampler/steps/int8 —
    # the docs/diffusion_profile.md fast stack), scored on the identical
    # held-out protocol.  This is the in-env quality validation the fast
    # modes couldn't have without real checkpoints (CLAUDE.md perf queue
    # 5b caveat).
    if eval_variants:
        from dataclasses import replace as _dc_replace

        out["variants"] = {}
        for v in eval_variants:
            cfg_v = cfg
            if v.get("quant"):
                cfg_v = _dc_replace(
                    cfg, unet=_dc_replace(cfg.unet, quant=v["quant"]))
            st_v = Zero123Stage(cfg_v, params=dict(params_ema))
            t0 = time.perf_counter()
            s_v = sample_held(st_v, steps_=v.get("sample_steps"),
                              sampler_=v.get("sampler"))
            secs_v = time.perf_counter() - t0
            psnr_v = [psnr01(s_v[i], held_gt01[i]) for i in range(H)]
            cross_v = np.array(
                [[psnr01(s_v[i], held_gt01[j]) for j in range(H)]
                 for i in range(H)])
            off_v = (cross_v.sum(axis=1) - np.diag(cross_v)) / (H - 1)
            res_v = {
                "sampler": v.get("sampler") or sampler,
                "sample_steps": v.get("sample_steps") or sample_steps,
                "quant": v.get("quant", "none"),
                "psnr_heldout": round(float(np.mean(psnr_v)), 2),
                "psnr_heldout_min": round(float(np.min(psnr_v)), 2),
                "ssim_heldout": round(float(np.mean(
                    [ssim01(s_v[i], held_gt01[i]) for i in range(H)])), 4),
                "pose_hits": int(np.sum(
                    np.argmax(cross_v, axis=1) == np.arange(H))),
                "pose_margin_db": round(
                    float(np.mean(np.diag(cross_v) - off_v)), 2),
                "sample_secs": round(secs_v, 1),
            }
            out["variants"][v["label"]] = res_v
            print(json.dumps({v["label"]: res_v}), flush=True)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--vae-steps", type=int, default=3000)
    p.add_argument("--sample-steps", type=int, default=25)
    p.add_argument("--sampler", default="ddim", choices=("ddim", "plms", "dpmpp"))
    p.add_argument("--json", default=None)
    p.add_argument("--png", default=None, help="save samples/GT/untrained grid")
    p.add_argument("--fast-variants", action="store_true",
                   help="also score the opt-in fast serving stack "
                        "(dpmpp / reduced steps / int8) on the same "
                        "held-out protocol")
    args = p.parse_args(argv)

    variants = ()
    if args.fast_variants:
        # mirrors the shipped fast stack (cli --sampler dpmpp --quant int8,
        # a ~2.5x step cut like 77/50 -> 30/25 at production scale)
        fast_steps = max(args.sample_steps * 2 // 5, 4)
        variants = (
            {"label": "dpmpp_same_steps", "sampler": "dpmpp"},
            {"label": "dpmpp_fast", "sampler": "dpmpp",
             "sample_steps": fast_steps},
            {"label": "int8", "quant": "int8"},
            {"label": "int8_dpmpp_fast", "sampler": "dpmpp",
             "sample_steps": fast_steps, "quant": "int8"},
        )

    out = run_benchmark(steps=args.steps, res=args.res, batch=args.batch,
                        vae_steps=args.vae_steps,
                        sample_steps=args.sample_steps, sampler=args.sampler,
                        out_png=args.png, eval_variants=variants)
    print(json.dumps(out), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    _sys.exit(main())
