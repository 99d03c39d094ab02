"""Generalizable-SparseNeuS reconstruction trainer.

Parity targets: exp_runner_generic_blender_train.py (cosine lr with 0.1
floor :400-405, alpha-ratio warmup :407-413, grad-clip 1.0, Adam 2e-4,
200k iters) + GenericTrainer.train_step / cal_losses_sdf
(trainer_generic.py:158-357, 1127-1269).

TPU parallelism replaces `torch.nn.DataParallel(trainer)` (batch = #GPUs,
one scene per replica): scenes are sharded over the `data` mesh axis via a
leading scene axis and `jax.vmap`; XLA psum-reduces the gradients.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from one2345_tpu.core.config import ReconConfig
from one2345_tpu.recon.renderer import RenderParams, render_rays
from one2345_tpu.recon.sdf_network import SdfVolumeNetwork


class ReconTrainState(NamedTuple):
    params: Any       # trainable parameters only (per-network trees)
    batch_stats: Any  # BN running statistics (updated, never differentiated)
    opt_state: Any
    step: jnp.ndarray


def cosine_lr(base_lr: float, end_iter: int):
    def schedule(step):
        f = (jnp.cos(jnp.pi * step / end_iter) + 1.0) * 0.5 * 0.9 + 0.1
        return base_lr * f

    return schedule


class ReconTrainer:
    def __init__(self, stage, config: ReconConfig | None = None):
        """:param stage: recon.pipeline.ReconStage"""
        self.stage = stage
        self.cfg = config or stage.config
        self.tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adam(cosine_lr(self.cfg.learning_rate, self.cfg.end_iter)),
        )

    def init_state(self) -> ReconTrainState:
        """Split the stage variables into trainable params and BN running
        stats: the reference trains on batch statistics (InPlaceABN /
        spnn.BatchNorm, featurenet.py:11-37) and running stats are buffers,
        not parameters — the optimizer must never touch them."""
        variables = self.stage.params
        params = {k: v["params"] for k, v in variables.items()}
        stats = {k: v.get("batch_stats", {}) for k, v in variables.items()}
        return ReconTrainState(
            params, stats, self.tx.init(params), jnp.zeros((), jnp.int32)
        )

    def stage_variables(self, state: ReconTrainState) -> dict:
        """Reassemble per-network flax variable dicts (for ReconStage use)."""
        out = {}
        for k, p in state.params.items():
            v = {"params": p}
            if state.batch_stats.get(k):
                v["batch_stats"] = state.batch_stats[k]
            out[k] = v
        return out

    def alpha_inter_ratio(self, step, lod: int = 0):
        """get_alpha_inter_ratio (train runner :412-418), per-lod schedule."""
        start = self.cfg.anneal_start if lod == 0 else self.cfg.anneal_start_lod1
        end = self.cfg.anneal_end if lod == 0 else self.cfg.anneal_end_lod1
        if end == 0:
            return jnp.asarray(1.0)
        if end <= start:
            # collapsed window (the reference's lod1 start == end quirk):
            # a step function, not (step - start) / 0 = NaN at step == start
            return jnp.where(step < start, 0.0, 1.0)
        return jnp.clip((step - start) / (end - start), 0.0, 1.0)

    # ------------------------------------------------------------- forward
    def _lod_fns(self, params, batch_stats, volume, lod: int):
        """SDF/render/variance closures for one lod (separate parameter
        trees, identical module defs — see ReconStage.init_params)."""
        st = self.stage
        if lod == 0:
            net, pkey, rkey, vkey = st.sdf_net, "sdf", "render", "variance"
        else:
            net, pkey, rkey, vkey = (
                st.sdf_net_lod1, "sdf_lod1", "render_lod1", "variance_lod1"
            )
        sdf_vars = {"params": params[pkey], "batch_stats": batch_stats[pkey]}

        def sdf_fn(pts):
            return net.apply(sdf_vars, pts, volume, method=SdfVolumeNetwork.sdf)

        def sdf_grad_fn(pts):
            return net.apply(
                sdf_vars, pts, volume, method=SdfVolumeNetwork.sdf_and_gradient
            )

        def render_net_fn(geo, rgb, rd, m):
            return st.render_net.apply({"params": params[rkey]}, geo, rgb, rd, m)

        inv_variance = st.variance_net.apply({"params": params[vkey]})
        return sdf_fn, sdf_grad_fn, render_net_fn, inv_variance

    def _render_lod(self, fns, scene, feats, volume, mask_volume, step, key, lod):
        """One lod's 512-ray training render (train_step:243-260,305-321).

        Rendering uses ALL views with the reference view as query; the
        projector excludes the query view from the support set
        (projector.py:141-149) — view 0 here.
        """
        cfg = self.cfg
        imgs = scene["images"]
        H, W = imgs.shape[1], imgs.shape[2]
        sdf_fn, sdf_grad_fn, render_net_fn, inv_variance = fns
        return render_rays(
            sdf_fn,
            sdf_grad_fn,
            render_net_fn,
            inv_variance,
            scene["rays_o"],
            scene["rays_v"],
            scene["near_far"][0],
            scene["near_far"][1],
            volume,
            mask_volume,
            feats[1:],
            imgs[1:],
            scene["w2cs"][1:],
            scene["intrinsics"][1:],
            (H, W),
            query_cam_center=jnp.linalg.inv(scene["w2cs"][0])[:3, 3],
            params=RenderParams(
                n_samples=cfg.n_samples,
                n_importance=cfg.n_importance,
                perturb=True,
                alpha_inter_ratio=self.alpha_inter_ratio(step, lod),
                background_rgb=1.0 if cfg.use_white_bkgd else None,
                normal_query_prob=cfg.normal_query_prob,
            ),
            key=key,
        )

    def _assemble_losses(self, out, scene, step, sdf_fn, key, lod: int = 0):
        """cal_losses_sdf (trainer_generic.py:1127-1269) for one lod."""
        cfg = self.cfg
        true_rgb = scene["rays_color"]
        mask = scene["rays_mask"][:, 0]
        color = out["color_fine"]
        cmask = out["color_fine_mask"][:, 0].astype(jnp.float32)
        err = jnp.abs(color - true_rgb).mean(axis=-1) * cmask
        color_loss = jnp.sum(err) / (jnp.sum(cmask) + 1e-8)
        psnr = 20.0 * jnp.log10(
            1.0
            / jnp.sqrt(
                jnp.sum(((color - true_rgb) ** 2).mean(-1) * cmask)
                / (jnp.sum(cmask) + 1e-8)
                / 3.0
                + 1e-12
            )
        )

        pts_random = jax.random.uniform(key, (1024, 3), minval=-1.0, maxval=1.0)
        sdf_random, _ = sdf_fn(pts_random)
        sparse_1 = jnp.mean(jnp.exp(-cfg.sdf_decay_param * jnp.abs(sdf_random)))
        sparse_2 = jnp.mean(jnp.exp(-cfg.sdf_decay_param * jnp.abs(out["sdf"])))
        sparse_loss = 0.5 * (sparse_1 + sparse_2)

        eikonal = out["gradient_error_fine"]

        # fg/bg mask loss, gated after 50k iters and only when the batch has
        # background rays (trainer_generic.py:1227-1248)
        fg_bg_weight = jnp.where(
            step < cfg.fg_bg_gate_iter,
            0.0,
            self._anneal_weight(step, cfg.fg_bg_weight, lod),
        )
        has_bg = jnp.mean((mask < 0.5).astype(jnp.float32)) > 0.02
        fg_bg_loss = jnp.where(
            has_bg, jnp.mean(jnp.abs(out["weights_sum"][:, 0] - mask)), 0.0
        )

        sparse_w = self._anneal_weight(step, cfg.sdf_sparse_weight, lod)
        loss = (
            color_loss
            + sparse_loss * sparse_w
            + fg_bg_loss * fg_bg_weight
            + eikonal * cfg.sdf_igr_weight
        )
        metrics = {
            "color_loss": color_loss,
            "psnr": psnr,
            "eikonal": eikonal,
            "sparse_loss": sparse_loss,
            "fg_bg_loss": fg_bg_loss,
            "variance": out["variance"],
        }
        return loss, metrics

    def scene_loss(self, params, batch_stats, scene, step, key):
        """Loss for ONE scene (train_step, trainer_generic.py:158-357).

        scene: {'images' [V,H,W,3] (view 0 = reference), 'affines' [V,4,4],
                'w2cs' [V,4,4], 'intrinsics' [V,3,3], 'near_far' [2],
                'rays_o'/'rays_v' [N,3], 'rays_color' [N,3], 'rays_mask' [N,1]}

        Runs the BN-bearing networks in TRAIN mode (batch statistics, as
        InPlaceABN/spnn.BatchNorm do in the reference trainer) and returns
        the updated running stats in the aux output.

        With cfg.num_lods > 1 the lod1 branch runs too (train_step:269-319):
        prune the coarse near-surface occupancy, build the fine conditional
        volume on the lod1 networks, render/score with the lod1 anneal
        schedule, and sum the lod losses (train runner :252-258).  With
        cfg.fix_lod0_networks the lod0 networks are frozen (stop-gradient)
        and only the lod1 loss trains (trainer_generic.py:191-215).
        """
        st = self.stage
        cfg = self.cfg
        imgs = scene["images"]
        H, W = imgs.shape[1], imgs.shape[2]
        fix0 = cfg.num_lods > 1 and cfg.fix_lod0_networks

        feats, fus_upd = st.fusion.apply(
            {"params": params["fusion"], "batch_stats": batch_stats["fusion"]},
            imgs, True, mutable=["batch_stats"],
        )
        # conditional volume from the source views only (trainer_generic:192-200)
        vol_out, sdf_upd = st.sdf_net.apply(
            {"params": params["sdf"], "batch_stats": batch_stats["sdf"]},
            feats[1:], scene["affines"][1:], (H, W), True,
            method=SdfVolumeNetwork.build_volume, mutable=["batch_stats"],
        )
        volume, mask_volume = vol_out["volume"], vol_out["mask"]
        new_stats = {
            **batch_stats,
            "fusion": fus_upd["batch_stats"],
            "sdf": sdf_upd["batch_stats"],
        }
        if fix0:
            # frozen lod0: forward still runs (and BN stats still update,
            # as torch train() mode does under no_grad) but no gradients
            feats = jax.lax.stop_gradient(feats)
            volume = jax.lax.stop_gradient(volume)

        loss = jnp.zeros(())
        metrics = {}
        if not fix0:
            fns0 = self._lod_fns(params, batch_stats, volume, 0)
            out0 = self._render_lod(
                fns0, scene, feats, volume, mask_volume, step, key, 0
            )
            loss0, m0 = self._assemble_losses(
                out0, scene, step, fns0[0], jax.random.fold_in(key, 1), 0
            )
            loss = loss + loss0
            metrics.update(m0)

        if cfg.num_lods > 1 and st.sdf_net_lod1 is not None:
            # near-surface pruning of the coarse lod (train_step:269-287);
            # the mask is index selection — gradients flow to lod0 only
            # through pre_feats (the lod0 conditional volume)
            stage_vars = {
                "sdf": {"params": params["sdf"], "batch_stats": batch_stats["sdf"]}
            }
            if cfg.lod1_prune_depth_filter:
                c2ws = jax.vmap(jnp.linalg.inv)(scene["w2cs"][1:])
                pre_mask = st.prune_occupancy_depth_filter(
                    stage_vars, volume, mask_volume,
                    scene["affines"][1:], scene["intrinsics"][1:], c2ws,
                    scene["near_far"], (H, W),
                )
            else:
                pre_mask = st.prune_occupancy(stage_vars, volume, mask_volume)
            pre_mask = jax.lax.stop_gradient(pre_mask)

            # the fine lod has its OWN pyramid feature network
            # (obtain_pyramid_feature_maps lod=1, trainer_generic.py:275)
            feats1, fus1_upd = st.fusion.apply(
                {
                    "params": params["fusion_lod1"],
                    "batch_stats": batch_stats["fusion_lod1"],
                },
                imgs, True, mutable=["batch_stats"],
            )
            vol1_out, sdf1_upd = st.sdf_net_lod1.apply(
                {
                    "params": params["sdf_lod1"],
                    "batch_stats": batch_stats["sdf_lod1"],
                },
                feats1[1:], scene["affines"][1:], (H, W), True, pre_mask, volume,
                method=SdfVolumeNetwork.build_volume, mutable=["batch_stats"],
            )
            new_stats["fusion_lod1"] = fus1_upd["batch_stats"]
            new_stats["sdf_lod1"] = sdf1_upd["batch_stats"]
            volume1, mask1 = vol1_out["volume"], vol1_out["mask"]

            fns1 = self._lod_fns(params, batch_stats, volume1, 1)
            out1 = self._render_lod(
                fns1, scene, feats1, volume1, mask1, step,
                jax.random.fold_in(key, 2), 1,
            )
            loss1, m1 = self._assemble_losses(
                out1, scene, step, fns1[0], jax.random.fold_in(key, 3), 1
            )
            loss = loss + loss1
            metrics.update({f"{k}_lod1": v for k, v in m1.items()})

        metrics["loss"] = loss
        return loss, (metrics, new_stats)

    def _anneal_weight(self, step, weight, lod: int = 0):
        """get_weight (trainer_generic.py:1130-1150): lod0 ramps from
        anneal_start to 2*anneal_end; lod1 ramps from anneal_end_lod1 to
        2*anneal_end_lod1 (the reference sets lod1's START to its END
        value — trainer_generic.py:1131-1134)."""
        cfg = self.cfg
        if lod == 0:
            start, end = cfg.anneal_start, cfg.anneal_end * 2
        else:
            start, end = cfg.anneal_end_lod1, cfg.anneal_end_lod1 * 2
        if end == 0:
            return jnp.asarray(weight)
        ramp = jnp.clip((step - start) / (end - start), 0.0, 1.0)
        return ramp * weight

    def _train_step(self, state: ReconTrainState, scenes, key):
        """scenes: pytree with a leading scene axis (sharded over `data`)."""

        def batch_loss(params):
            n = jax.tree_util.tree_leaves(scenes)[0].shape[0]
            keys = jax.random.split(key, n)
            losses, (metrics, stats) = jax.vmap(
                lambda sc, k: self.scene_loss(params, state.batch_stats, sc,
                                              state.step, k)
            )(scenes, keys)
            # average the per-scene BN stat updates (the XLA analogue of
            # cross-replica buffer sync DataParallel never does)
            stats = jax.tree_util.tree_map(lambda x: x.mean(axis=0), stats)
            return jnp.mean(losses), (jax.tree_util.tree_map(jnp.mean, metrics), stats)

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            batch_loss, has_aux=True
        )(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            ReconTrainState(params, new_stats, opt_state, state.step + 1),
            metrics,
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state, scenes, key):
        return self._train_step(state, scenes, key)

    def make_sharded_train_step(self, mesh: Mesh):
        """Scenes sharded over `data` (the DataParallel equivalent)."""
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        state_sh = jax.tree_util.tree_map(lambda _: repl, self.init_state())
        scene_sh = jax.tree_util.tree_map(lambda _: data, self._scene_template())
        return (
            jax.jit(
                self._train_step,
                in_shardings=(state_sh, scene_sh, repl),
                out_shardings=(state_sh, repl),
            ),
            state_sh,
        )

    def _scene_template(self):
        cfg = self.cfg
        V = 3
        H, W = cfg.image_hw
        N = cfg.n_rays
        return {
            "images": np.zeros((1, V, H, W, 3)),
            "affines": np.zeros((1, V, 4, 4)),
            "w2cs": np.zeros((1, V, 4, 4)),
            "intrinsics": np.zeros((1, V, 3, 3)),
            "near_far": np.zeros((1, 2)),
            "rays_o": np.zeros((1, N, 3)),
            "rays_v": np.zeros((1, N, 3)),
            "rays_color": np.zeros((1, N, 3)),
            "rays_mask": np.zeros((1, N, 1)),
        }
