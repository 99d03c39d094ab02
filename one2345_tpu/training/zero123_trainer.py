"""Zero123 finetune trainer (the Lightning `main.py` the reference omits).

The reference ships only the training *config* (configs/sd-objaverse-
finetune-c_concat-256.yaml) — the Lightning trainer itself is not in the
repo.  This module reconstructs the training contract from that yaml +
LatentDiffusion (ddpm.py):

- eps-parameterization MSE (p_losses, ddpm.py:1004-1037)
- hybrid conditioning with 5%/5%/5% CFG dropout (get_input, ddpm.py:741-753)
- z = sample(VAE posterior) * 0.18215; c_concat = mode(VAE posterior)
- AdamW, base lr 1e-4, 10x lr on cc_projection (ddpm.py:1411-1416)
- LambdaLinear warmup 100 steps (yaml scheduler_config)
- frozen VAE + CLIP; EMA of UNet weights (LitEma, ddpm.py:180-193)

TPU parallelism: data-parallel over the `data` mesh axis with parameters
replicated (the 860M-param UNet fits per chip in bf16); gradients are
psum-reduced by XLA from the sharding annotations.  `make_sharded_train_step`
additionally shards large parameters over the `model` axis (FSDP-style) for
memory-constrained configs.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from one2345_tpu.diffusion.schedule import training_schedule
from one2345_tpu.diffusion.vae import moments_mode, moments_sample


class TrainState(NamedTuple):
    params: Any  # trainable: {'unet':…, 'cc_projection':…}
    ema_params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(base_lr: float = 1e-4, warmup_steps: int = 100):
    """AdamW with linear warmup (f_start 1e-6 -> 1.0) and 10x lr on
    cc_projection."""

    def schedule(step):
        warm = jnp.minimum(step / warmup_steps, 1.0)
        return base_lr * (1e-6 + (1.0 - 1e-6) * warm)

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "cc" if "cc_projection" in jax.tree_util.keystr(path) else "unet",
            params,
        )

    tx = optax.multi_transform(
        {
            "unet": optax.adamw(schedule),
            "cc": optax.adamw(lambda s: 10.0 * schedule(s)),
        },
        label_fn,
    )
    return tx


class Zero123Trainer:
    def __init__(self, stage, ema_decay: float = 0.9999, base_lr: float = 1e-4,
                 remat: bool = True):
        """:param stage: diffusion.zero123.Zero123Stage (modules + params)
        :param remat: rematerialize UNet blocks in the backward pass
            (identical gradients, ~half the activation memory — needed for
            the 860M-param UNet at 256^2 on per-chip HBM)"""
        if getattr(stage, "quant", False):
            raise ValueError(
                "Zero123Trainer needs an f32 param tree — construct the stage "
                "with UNetConfig.quant='none' (int8 is an inference-only "
                "fast mode, diffusion/quantize.py)"
            )
        self.stage = stage
        self.unet_train = stage.unet.clone(remat=True) if remat else stage.unet
        self.sched = jax.tree_util.tree_map(jnp.asarray, training_schedule(
            stage.config.timesteps, stage.config.linear_start, stage.config.linear_end
        ))
        self.ema_decay = ema_decay
        self.tx = make_optimizer(base_lr)

    def init_state(self) -> TrainState:
        trainable = {
            "unet": self.stage.params["unet"],
            "cc_projection": self.stage.params["cc_projection"],
        }
        return TrainState(
            params=trainable,
            ema_params=jax.tree_util.tree_map(jnp.array, trainable),
            opt_state=self.tx.init(trainable),
            step=jnp.zeros((), jnp.int32),
        )

    def loss_fn(self, trainable, frozen, batch, key):
        """eps-MSE over one batch.

        batch: {'image_target' [B,256,256,3] in [-1,1],
                'image_cond'   [B,256,256,3] in [-1,1],
                'T'            [B,1,4]}
        """
        st = self.stage
        k_t, k_noise, k_z, k_drop1, k_drop2 = jax.random.split(key, 5)
        B = batch["image_target"].shape[0]

        # frozen first/cond stages
        moments = st.encoder.apply(frozen["encoder"], batch["image_target"])
        z = moments_sample(moments, k_z) * st.scale_factor
        cond_moments = st.encoder.apply(frozen["encoder"], batch["image_cond"])
        concat = moments_mode(cond_moments)
        from one2345_tpu.diffusion.clip import preprocess_for_clip

        emb = st.clip.apply(
            frozen["clip"],
            preprocess_for_clip(batch["image_cond"], st.config.clip.image_size),
        )[:, None, :]
        ctx = st.cc_projection.apply(
            trainable["cc_projection"], jnp.concatenate([emb, batch["T"]], axis=-1)
        )

        # 5%/5%/5% conditioning dropout (ddpm.py:741-753): with p=.05 drop
        # crossattn only, p=.05 drop concat only, p=.05 drop both
        u = jax.random.uniform(k_drop1, (B,))
        drop_ctx = (u < 0.10)[:, None, None]
        drop_cat = ((u >= 0.05) & (u < 0.15))[:, None, None, None]
        ctx = jnp.where(drop_ctx, 0.0, ctx)
        concat = jnp.where(drop_cat, 0.0, concat)

        t = jax.random.randint(k_t, (B,), 0, st.config.timesteps)
        noise = jax.random.normal(k_noise, z.shape)
        sqrt_ac = self.sched["sqrt_alphas_cumprod"][t][:, None, None, None]
        sqrt_1m = self.sched["sqrt_one_minus_alphas_cumprod"][t][:, None, None, None]
        z_noisy = sqrt_ac * z + sqrt_1m * noise

        unet_in = jnp.concatenate([z_noisy, concat], axis=-1)
        eps = self.unet_train.apply(trainable["unet"], unet_in, t, ctx)
        loss = jnp.mean((eps - noise) ** 2)
        return loss

    def _train_step(self, state: TrainState, frozen, batch, key):
        loss, grads = jax.value_and_grad(self.loss_fn)(state.params, frozen, batch, key)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # LitEma decay warmup (ldm/modules/ema.py:26-30): decay ramps as
        # (1+n)/(10+n) toward the configured value, so the early EMA tracks
        # the live weights instead of retaining the random init — with a
        # FIXED 0.9999 the shadow still holds 0.9999^6000 = 55% of the
        # initial weights after 6k steps (measured: garbage EMA samples
        # from a fully converged trainer in examples/diffusion_quality.py)
        n = (state.step + 1).astype(jnp.float32)
        d = jnp.minimum(self.ema_decay, (1.0 + n) / (10.0 + n))
        ema = jax.tree_util.tree_map(
            lambda e, p: d * e + (1.0 - d) * p, state.ema_params, params
        )
        return TrainState(params, ema, opt_state, state.step + 1), loss

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: TrainState, frozen, batch, key):
        return self._train_step(state, frozen, batch, key)

    # ------------------------------------------------------------- sharding
    def make_sharded_train_step(self, mesh: Mesh, shard_params: bool = True):
        """jit the train step with batch sharded over `data` and (optionally)
        parameters sharded over `model` along their largest axis."""

        def param_spec(x):
            if not shard_params or x.ndim == 0:
                return P()
            model_size = mesh.shape.get("model", 1)
            ax = int(np.argmax(x.shape))
            if x.shape[ax] % model_size == 0 and x.shape[ax] >= model_size:
                spec = [None] * x.ndim
                spec[ax] = "model"
                return P(*spec)
            return P()

        def shard_tree(tree, spec_fn):
            return jax.tree_util.tree_map(
                lambda x: NamedSharding(mesh, spec_fn(x)), tree
            )

        state = self.init_state()
        state_sh = TrainState(
            params=shard_tree(state.params, param_spec),
            ema_params=shard_tree(state.ema_params, param_spec),
            opt_state=shard_tree(state.opt_state, param_spec),
            step=NamedSharding(mesh, P()),
        )
        frozen_sh = shard_tree(
            {k: self.stage.params[k] for k in ("encoder", "clip")}, lambda x: P()
        )
        batch_sh = {
            "image_target": NamedSharding(mesh, P("data")),
            "image_cond": NamedSharding(mesh, P("data")),
            "T": NamedSharding(mesh, P("data")),
        }
        key_sh = NamedSharding(mesh, P())

        step = jax.jit(
            self._train_step,
            in_shardings=(state_sh, frozen_sh, batch_sh, key_sh),
            out_shardings=(state_sh, NamedSharding(mesh, P())),
        )
        return step, state_sh, frozen_sh
