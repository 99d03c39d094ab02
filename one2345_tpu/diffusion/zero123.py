"""Zero123 view-conditioned sampling — the multi-view hot loop, TPU-batched.

Parity targets:
- conditioning assembly (utils/zero123_utils.py:60-98 sample_model_batch):
  CLIP image token ++ (radians dx, sin dy, cos dy, 0) pose token ->
  cc_projection Linear(772->768); c_concat = VAE .mode() latent of the
  conditioning image (unscaled); CFG uses zero unconditional embeddings.
- DDIM loop (ldm/models/diffusion/ddim.py:129-243) as a `lax.scan` with the
  CFG double-batch folded into the batch axis.
- the stage-1 / stage-2 view sets (zero123_utils.py:109-120, 175-176).

The reference runs stage-2 as 8 sequential python loops of 4-view batches
(zero123_utils.py:136-160); here all 32 stage-2 views (each conditioned on
its own stage-1 image) sample in ONE jitted scan — the single biggest
wall-clock win of the rebuild.  The view batch is sharded over the device
mesh `data` axis by the caller.
"""

from __future__ import annotations

import functools
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from one2345_tpu.core.config import DiffusionConfig
from one2345_tpu.diffusion.clip import CLIPVisionTower, preprocess_for_clip
from one2345_tpu.diffusion.schedule import DDIMSchedule, make_ddim_schedule
from one2345_tpu.diffusion.unet import UNetModel
from one2345_tpu.diffusion.vae import Decoder, Encoder, moments_mode

# stage-1 view deltas (zero123_utils.py:109-110): 12 candidate views, of
# which [0:8] are used for low elevation and [0:4]+[8:12] for high.
STAGE1_DELTA_X = [0.0] * 4 + [30.0] * 4 + [-30.0] * 4
STAGE1_DELTA_Y = [0.0 + 90 * (i % 4) if i < 4 else 30.0 + 90 * (i % 4) for i in range(8)] + [
    30.0 + 90 * (i % 4) for i in range(4)
]
# stage-2 nearby-view deltas (zero123_utils.py:175-176)
STAGE2_DELTA_X = [-10.0, 10.0, 0.0, 0.0]
STAGE2_DELTA_Y = [0.0, 0.0, -10.0, 10.0]


def pose_tokens(delta_x_deg, delta_y_deg) -> np.ndarray:
    """[B, 1, 4] (radians dx, sin radians dy, cos radians dy, 0)."""
    dx = np.radians(np.asarray(delta_x_deg, np.float64))
    dy = np.radians(np.asarray(delta_y_deg, np.float64))
    T = np.stack([dx, np.sin(dy), np.cos(dy), np.zeros_like(dx)], axis=-1)
    return T[:, None, :].astype(np.float32)


class CCProjection(nn.Module):
    """Linear(772 -> 768), identity+zeros init (ddpm.py:525-529)."""

    @nn.compact
    def __call__(self, x):
        def init_w(key, shape):
            w = jnp.zeros(shape)
            return w.at[:768, :].set(jnp.eye(768))

        w = self.param("kernel", init_w, (772, 768))
        b = self.param("bias", nn.initializers.zeros, (768,))
        return x @ w + b


class Zero123Stage:
    """Holds the UNet/VAE/CLIP modules + params and the jitted samplers.

    Multi-chip: pass ``mesh`` (a `jax.sharding.Mesh` with a `data` axis) and
    the view x CFG batch of every sampler call shards across it — params
    replicate, XLA keeps the CFG pair of each view on the same shard
    (uncond/cond are concatenated along the batch axis in equal halves, so
    a `data`-sharded batch splits both halves identically).
    """

    def __init__(self, config: DiffusionConfig | None = None, params=None, seed: int = 0,
                 mesh=None):
        self.mesh = mesh
        self.config = config or DiffusionConfig()
        cfg = self.config
        dt = jnp.bfloat16 if cfg.unet.dtype == "bfloat16" else jnp.float32
        quant_mode = getattr(cfg.unet, "quant", "none")
        if quant_mode not in ("none", "int8"):
            # a typo ('INT8', 'w8a8') must not silently run the bf16 path
            raise ValueError(
                f"UNetConfig.quant must be 'none' or 'int8', got {quant_mode!r}"
            )
        self.quant = quant_mode == "int8"
        self.unet = UNetModel(
            in_channels=cfg.unet.in_channels,
            out_channels=cfg.unet.out_channels,
            model_channels=cfg.unet.model_channels,
            num_res_blocks=cfg.unet.num_res_blocks,
            attention_resolutions=tuple(cfg.unet.attention_resolutions),
            channel_mult=tuple(cfg.unet.channel_mult),
            num_heads=cfg.unet.num_heads,
            transformer_depth=cfg.unet.transformer_depth,
            context_dim=cfg.unet.context_dim,
            dtype=dt,
            quant=self.quant,
        )
        self.encoder = Encoder(
            base_channels=cfg.vae.base_channels,
            channel_mult=tuple(cfg.vae.channel_mult),
            num_res_blocks=cfg.vae.num_res_blocks,
            z_channels=cfg.vae.z_channels,
            dtype=dt,
        )
        self.decoder = Decoder(
            base_channels=cfg.vae.base_channels,
            channel_mult=tuple(cfg.vae.channel_mult),
            num_res_blocks=cfg.vae.num_res_blocks,
            z_channels=cfg.vae.z_channels,
            dtype=dt,
        )
        self.clip = CLIPVisionTower(
            image_size=cfg.clip.image_size,
            patch_size=cfg.clip.patch_size,
            width=cfg.clip.width,
            layers=cfg.clip.layers,
            heads=cfg.clip.heads,
            embed_dim=cfg.clip.embed_dim,
            dtype=dt,
        )
        self.cc_projection = CCProjection()
        self.scale_factor = cfg.vae.scale_factor
        self.params = params if params is not None else self.init_params(jax.random.key(seed))
        if self.quant:
            self.params = dict(self.params)
            self.params["unet"] = self._quantized_unet_vars(self.params["unet"])

    def _quantized_unet_vars(self, unet_vars: dict) -> dict:
        """f32 UNet variables -> int8 tree for the quant module (idempotent:
        an already-quantized tree — e.g. restored from a checkpoint saved by
        a quant-mode process — passes through unchanged)."""
        from flax import traverse_util

        from one2345_tpu.diffusion.quantize import quantize_unet_params

        flat = traverse_util.flatten_dict(unet_vars.get("params", {}))
        if any(path[-1] == "kernel_q" for path in flat):
            return unet_vars
        return quantize_unet_params(unet_vars)

    def init_params(self, key) -> dict:
        # jitted inits: flax init is otherwise eager op-by-op dispatch.
        # Always init the f32 structure — quant trees are DERIVED from it
        # in __init__ (inference-only; training/conversion stay f32).
        cfg = self.config
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        L = cfg.latent_size
        unet_f32 = self.unet.clone(quant=False) if self.quant else self.unet
        unet_vars = jax.jit(unet_f32.init)(
            k1,
            jnp.zeros((1, L, L, cfg.unet.in_channels)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 1, cfg.unet.context_dim)),
        )
        enc_vars = jax.jit(self.encoder.init)(
            k2, jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
        )
        dec_vars = jax.jit(self.decoder.init)(k3, jnp.zeros((1, L, L, cfg.vae.z_channels)))
        clip_vars = jax.jit(self.clip.init)(
            k4, jnp.zeros((1, cfg.clip.image_size, cfg.clip.image_size, 3))
        )
        cc_vars = jax.jit(self.cc_projection.init)(k5, jnp.zeros((1, 1, 772)))
        return {
            "unet": unet_vars,
            "encoder": enc_vars,
            "decoder": dec_vars,
            "clip": clip_vars,
            "cc_projection": cc_vars,
        }

    # ------------------------------------------------------------- sampling
    def _schedule(self, steps: int) -> DDIMSchedule:
        from one2345_tpu.diffusion.ddim import trim_for_sample

        cfg = self.config
        sched = make_ddim_schedule(
            steps, cfg.timesteps, cfg.ddim_eta, cfg.linear_start, cfg.linear_end
        )
        # DDIMSampler.sample drops the last ascending timestep (t_start=-1
        # slice, ddim.py:151) — S entries run S-1 steps; see trim_for_sample
        return trim_for_sample(sched)

    @functools.partial(jax.jit, static_argnums=(0,))
    def encode_conditioning(self, params, cond_images, T):
        """Conditioning pack for a batch of views.

        :param cond_images: [B, 256, 256, 3] in [-1, 1] — the image each view
            is conditioned on (the input image for stage 1; the parent
            stage-1 view for stage 2)
        :param T: [B, 1, 4] pose tokens
        :return: (context [B,1,768], concat_latent [B,32,32,4])
        """
        clip_in = preprocess_for_clip(cond_images, self.config.clip.image_size)
        emb = self.clip.apply(params["clip"], clip_in)[:, None, :]  # [B,1,768]
        ctx = self.cc_projection.apply(
            params["cc_projection"], jnp.concatenate([emb, T], axis=-1)
        )
        moments = self.encoder.apply(params["encoder"], cond_images)
        concat = moments_mode(moments)  # unscaled latent (zero123_utils.py:74)
        return ctx, concat

    def sample_views(
        self,
        cond_images: jnp.ndarray,
        delta_x_deg,
        delta_y_deg,
        key,
        steps: int | None = None,
        cfg_scale: float | None = None,
        sampler: str | None = None,
        noise_ids=None,
    ) -> jnp.ndarray:
        """Generate B novel views in one scan.  Returns [B, 256, 256, 3] in [0,1].

        :param sampler: 'ddim' (default, eta from config), 'plms'
            (eta=0 multistep — the reference's alternative sampler), or
            'dpmpp' (DPM-Solver++(2M) fast mode, diffusion/dpm_solver.py —
            pair with reduced step counts).  None -> config.sampler.
        :param noise_ids: optional int per view — every view's init/loop
            noise is `fold_in(key, id)`-derived, so the SAME (key, id)
            yields the SAME image regardless of batch position, batch size,
            or mesh topology (the 8-view both-rings plan on an 8-chip mesh
            reproduces the single-chip 4-view images exactly).  Default:
            batch position (arange)."""
        cfg_scale = self.config.cfg_scale if cfg_scale is None else cfg_scale
        steps = steps or self.config.ddim_steps_stage1
        T = jnp.asarray(pose_tokens(delta_x_deg, delta_y_deg))
        n_views = cond_images.shape[0]
        if noise_ids is None:
            noise_ids = np.arange(n_views)
        noise_ids = jnp.asarray(noise_ids, jnp.uint32)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # pad the view batch up to a multiple of the mesh so every
            # stage shards evenly (4 -> 8, 28 -> 32 on an 8-chip mesh; the
            # pad rows repeat the last view and are sliced off below) —
            # cheaper than replicating whenever B % n_dev != 0
            n_dev = self.mesh.devices.size
            pad = (-n_views) % n_dev
            cond_images = jnp.asarray(cond_images)
            if pad:
                cond_images = jnp.concatenate(
                    [cond_images, jnp.repeat(cond_images[-1:], pad, axis=0)], axis=0
                )
                T = jnp.concatenate([T, jnp.repeat(T[-1:], pad, axis=0)], axis=0)
                noise_ids = jnp.concatenate(
                    [noise_ids, jnp.repeat(noise_ids[-1:], pad, axis=0)], axis=0
                )
            data = NamedSharding(self.mesh, P("data"))
            cond_images = jax.device_put(cond_images, data)
            T = jax.device_put(T, data)
            noise_ids = jax.device_put(noise_ids, data)
        sampler = sampler or getattr(self.config, "sampler", "ddim")
        if sampler not in ("ddim", "plms", "dpmpp"):
            # same contract as UNetConfig.quant: a typo must not silently
            # run a different sampler (the old fallthrough ran eta-config
            # DDIM for ANY unknown string)
            raise ValueError(f"unknown sampler {sampler!r}: ddim|plms|dpmpp")
        if sampler in ("plms", "dpmpp"):
            sched = make_ddim_schedule(
                steps, self.config.timesteps, 0.0,
                self.config.linear_start, self.config.linear_end,
            )
            out = self._sample_views_multistep_jit(
                self.params, cond_images, T, key, noise_ids, sched,
                cfg_scale=cfg_scale, sampler=sampler,
            )
        else:
            sched = self._schedule(steps)
            out = self._sample_views_jit(
                self.params, cond_images, T, key, noise_ids, sched, cfg_scale
            )
        return out[:n_views]

    def _per_view_noise(self, key, noise_ids, draw: int, shape):
        """[B, *shape] gaussian noise keyed by (key, view id, draw index) —
        identical per view across any batch composition (see sample_views)."""

        def one(vid):
            k = jax.random.fold_in(key, vid)
            return jax.random.normal(jax.random.fold_in(k, draw), shape)

        return jax.vmap(one)(noise_ids)

    @functools.partial(
        jax.jit, static_argnums=(0,), static_argnames=("cfg_scale", "sampler")
    )
    def _sample_views_multistep_jit(
        self, params, cond_images, T, key, noise_ids, sched, cfg_scale,
        sampler: str = "plms",
    ):
        from one2345_tpu.diffusion.dpm_solver import dpmpp_sample
        from one2345_tpu.diffusion.plms import plms_sample

        B = cond_images.shape[0]
        L = self.config.latent_size
        zc = self.config.vae.z_channels
        ctx, concat = self.encode_conditioning(params, cond_images, T)
        ctx_in = jnp.concatenate([jnp.zeros_like(ctx), ctx], axis=0)
        concat_in = jnp.concatenate([jnp.zeros_like(concat), concat], axis=0)
        x = self._per_view_noise(key, noise_ids, 0, (L, L, zc))

        def eps_fn(x, t):
            x_in = jnp.concatenate([x, x], axis=0)
            ts = jnp.full((2 * B,), t, jnp.int32)
            unet_in = jnp.concatenate([x_in, concat_in], axis=-1)
            e = self.unet.apply(params["unet"], unet_in, ts, ctx_in)
            e_uc, e_c = jnp.split(e, 2, axis=0)
            return e_uc + cfg_scale * (e_c - e_uc)

        sample = plms_sample if sampler == "plms" else dpmpp_sample
        x = sample(eps_fn, x, sched)
        imgs = self.decoder.apply(params["decoder"], x / self.scale_factor)
        return jnp.clip((imgs + 1.0) / 2.0, 0.0, 1.0)

    @functools.partial(jax.jit, static_argnums=(0,), static_argnames=("cfg_scale",))
    def _sample_views_jit(self, params, cond_images, T, key, noise_ids, sched: DDIMSchedule, cfg_scale):
        from one2345_tpu.diffusion.ddim import ddim_sample

        B = cond_images.shape[0]
        L = self.config.latent_size
        zc = self.config.vae.z_channels

        ctx, concat = self.encode_conditioning(params, cond_images, T)
        # CFG double batch: [uncond ++ cond] (ddim.py:196-214 ordering)
        ctx_in = jnp.concatenate([jnp.zeros_like(ctx), ctx], axis=0)
        concat_in = jnp.concatenate([jnp.zeros_like(concat), concat], axis=0)

        x = self._per_view_noise(key, noise_ids, 0, (L, L, zc))

        def eps_fn(x, t):
            x_in = jnp.concatenate([x, x], axis=0)
            ts = jnp.full((2 * B,), t, jnp.int32)
            unet_in = jnp.concatenate([x_in, concat_in], axis=-1)
            e = self.unet.apply(params["unet"], unet_in, ts, ctx_in)
            e_uc, e_c = jnp.split(e, 2, axis=0)
            return e_uc + cfg_scale * (e_c - e_uc)

        def noise_fn(draw, shape):
            return self._per_view_noise(key, noise_ids, draw, shape[1:])

        x = ddim_sample(eps_fn, x, sched, noise_fn)

        imgs = self.decoder.apply(params["decoder"], x / self.scale_factor)
        return jnp.clip((imgs + 1.0) / 2.0, 0.0, 1.0)

    # --------------------------------------------------------- stage drivers
    def stage1(self, input_image: np.ndarray, key, indices=None, steps=None):
        """8/12-view stage-1 prediction (predict_stage1_gradio semantics).

        :param input_image: [256, 256, 3] in [0, 1] (preprocessed, white bg)
        :param indices: subset of the 12 candidate views (default all 12 —
            computing all avoids an elevation-dependent recompile; callers
            slice what they need)
        :return: [len(indices), 256, 256, 3] in [0, 1]
        """
        idx = list(indices) if indices is not None else list(range(12))
        img = jnp.asarray(input_image, jnp.float32) * 2.0 - 1.0
        cond = jnp.tile(img[None], (len(idx), 1, 1, 1))
        dx = [STAGE1_DELTA_X[i] for i in idx]
        dy = [STAGE1_DELTA_Y[i] for i in idx]
        # noise keyed by the GLOBAL candidate-view id, so any index subset
        # (e.g. the 8-view both-rings plan on an 8-chip mesh vs the
        # single-chip 4-view ring) yields identical per-view images
        return self.sample_views(
            cond, dx, dy, key, steps=steps or self.config.ddim_steps_stage1,
            noise_ids=idx,
        )

    def stage2(self, stage1_images: np.ndarray, key, steps=None, view_ids=None):
        """All nearby views for each stage-1 view in ONE batch.

        :param stage1_images: [N, 256, 256, 3] in [0, 1]
        :param view_ids: optional per-parent-view int ids (default arange) —
            keys the noise so a view's 4 nearby images are reproducible
            regardless of how the parent batch is split across calls
        :return: [N, 4, 256, 256, 3] in [0, 1]
        """
        n = stage1_images.shape[0]
        imgs = jnp.asarray(stage1_images, jnp.float32)
        # the reference re-reads its own PNGs and snaps near-white to white
        # (zero123_utils.py:145-147) — replicate the >=253/255 snap
        imgs = jnp.where(imgs >= 253.0 / 255.0, 1.0, imgs)
        cond = jnp.repeat(imgs, 4, axis=0) * 2.0 - 1.0  # [4N, ...]
        dx = STAGE2_DELTA_X * n
        dy = STAGE2_DELTA_Y * n
        if view_ids is None:
            view_ids = list(range(n))
        ids = [12 + int(v) * 4 + j for v in view_ids for j in range(4)]
        out = self.sample_views(
            cond, dx, dy, key, steps=steps or self.config.ddim_steps_stage2,
            noise_ids=ids,
        )
        return out.reshape(n, 4, *out.shape[1:])
