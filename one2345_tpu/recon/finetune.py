"""Per-shape finetuning of the reconstruction (the reference's `-ft` mode).

Parity targets:
- FinetuneOctreeSdfNetwork (sparse_sdf_network.py:548-781): the conditional
  volume itself becomes the optimized parameter (+ TV regularizer), the SDF
  MLP warm-starts from the generic network;
- BlendingRenderingNetwork (:784-907): IDR-style MLP predicting per-view
  blending logits (d_out 50 = max source images), pixel + patch blending;
- PatchProjector (models/patch_projector.py): homography patch warping for
  the NCC patch loss.

TPU design: the "sparse octree volume" is a dense masked volume parameter —
gradients flow only into masked voxels (the mask multiplies the volume), so
optimizing the dense tensor is equivalent to the reference's sparse
parameterization with far simpler bookkeeping.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from one2345_tpu.geometry.projection import sample_features_from_maps
from one2345_tpu.nn.layers import WNDense, positional_encoding


class BlendingRenderingNetwork(nn.Module):
    d_feature: int = 127  # hidden_dim - 1
    d_hidden: int = 128
    n_layers: int = 3
    d_out: int = 50  # max source images
    multires_view: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, position, normals, view_dirs, feature_vectors,
                 pixel_colors, pixel_mask, patch_colors=None, patch_mask=None):
        """
        :param position: [N, 3]; :param normals/view_dirs: [N, 3]
        :param feature_vectors: [N, d_feature]
        :param pixel_colors: [N, V, 3]; :param pixel_mask: [N, V]
        :param patch_colors: [N, V, P, 3]; :param patch_mask: [N, V, P]
        :return: (pixel_color [N,3], pixel_ok [N,1], patch_color, patch_ok)
        """
        v_emb = positional_encoding(view_dirs, self.multires_view)
        x = jnp.concatenate([position, v_emb, normals, feature_vectors], axis=-1)
        for l in range(self.n_layers):
            x = WNDense(self.d_hidden, dtype=self.dtype, name=f"lin{l}")(x)
            x = nn.relu(x)
        x = WNDense(self.d_out, dtype=self.dtype, name=f"lin{self.n_layers}")(x)

        V = pixel_colors.shape[1]
        logits = x[:, :V]
        w = jax.nn.softmax(logits, axis=1) * pixel_mask
        w = w / (jnp.sum(w, axis=1, keepdims=True) + 1e-8)
        pixel_color = jnp.sum(pixel_colors * w[:, :, None], axis=1)
        pixel_ok = jnp.sum(pixel_mask, axis=1, keepdims=True) > 0

        patch_color, patch_ok = None, None
        if patch_colors is not None:
            P = patch_colors.shape[2]
            pm = jnp.sum(patch_mask, axis=-1) > P - 1  # whole patch visible
            wp = jax.nn.softmax(logits, axis=1) * pm
            wp = wp / (jnp.sum(wp, axis=1, keepdims=True) + 1e-8)
            patch_color = jnp.sum(patch_colors * wp[:, :, None, None], axis=1)
            patch_ok = jnp.sum(pm, axis=1, keepdims=True) > 0
        return pixel_color, pixel_ok, patch_color, patch_ok


def build_patch_offsets(h: int) -> np.ndarray:
    """[(2h+1)^2, 2] (dx, dy) pixel offsets (models/rays.py build_patch_offset)."""
    r = np.arange(-h, h + 1)
    gy, gx = np.meshgrid(r, r, indexing="ij")
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1).astype(np.float32)


def patch_warp(
    pts: jnp.ndarray,
    uv: jnp.ndarray,
    normals: jnp.ndarray,
    src_images: jnp.ndarray,
    ref_K: jnp.ndarray,
    src_Ks: jnp.ndarray,
    ref_c2w: jnp.ndarray,
    src_c2ws: jnp.ndarray,
    h_patch_size: int = 3,
    plane_dist_thresh: float = 0.001,
):
    """Homography-warp ref-view patches into the source views
    (PatchProjector.patch_warp, patch_projector.py:45-208).

    :param pts: [N, 3] surface points (world); :param uv: [N, 2] their ref-
        view pixel coords; :param normals: [N, 3] world normals
    :param src_images: [V, H, W, 3]
    :return: (patch_colors [N, V, P, 3], patch_mask [N, V, P])
    """
    N = pts.shape[0]
    V = src_images.shape[0]
    offsets = jnp.asarray(build_patch_offsets(h_patch_size))  # [P, 2]
    P = offsets.shape[0]
    Himg, Wimg = src_images.shape[1], src_images.shape[2]

    inv_ref_K = jnp.linalg.inv(ref_K[:3, :3])
    inv_ref_pose = jnp.linalg.inv(ref_c2w)
    R_ref = inv_ref_pose[:3, :3]
    t_ref = inv_ref_pose[:3, 3:]

    rot_normals = (R_ref @ normals.T).T  # [N, 3]
    pts_ref = (R_ref @ pts.T + t_ref).T  # [N, 3]
    d1 = jnp.sum(rot_normals * pts_ref, axis=-1)  # [N]
    sign = jnp.where(d1 >= 0, 1.0, -1.0)
    d = jnp.maximum(jnp.abs(d1), 1e-8) * sign

    def per_view(img, K, c2w):
        rel = jnp.linalg.inv(c2w) @ ref_c2w
        R_rel = rel[:3, :3]
        t_rel = rel[:3, 3:]
        # plane-to-src-camera distance for validity
        cam_off = (-R_rel.T @ t_rel)[:, 0]  # src cam center in ref frame
        d2 = rot_normals @ cam_off  # [N]
        valid = (
            (jnp.abs(d1) > plane_dist_thresh)
            & (jnp.abs(d1 - d2) > plane_dist_thresh)
            & ((d2 / d) < 1.0)
        )
        # H = K_src (R_rel + t_rel n^T / d) K_ref^-1  per point
        outer = t_rel[None, :, :] * rot_normals[:, None, :] / d[:, None, None]
        H = K[:3, :3] @ (R_rel[None] + outer) @ inv_ref_K  # [N, 3, 3]
        # fronto-parallel fallback for invalid homographies
        H = jnp.where(valid[:, None, None], H, (K[:3, :3] @ R_rel @ inv_ref_K)[None])

        pix = uv[:, None, :] + offsets[None]  # [N, P, 2]
        ph = jnp.concatenate([pix, jnp.ones((N, P, 1))], axis=-1)
        warped = jnp.einsum("nij,npj->npi", H, ph)
        w_uv = warped[..., :2] / jnp.maximum(jnp.abs(warped[..., 2:]), 1e-8) * jnp.sign(
            warped[..., 2:]
        )
        in_img = (
            (w_uv[..., 0] >= 0) & (w_uv[..., 0] <= Wimg - 1)
            & (w_uv[..., 1] >= 0) & (w_uv[..., 1] <= Himg - 1)
            & (warped[..., 2] > 0)
        )
        from one2345_tpu.geometry.sampling import bilinear_sample

        colors = bilinear_sample(img, w_uv[..., 0], w_uv[..., 1], padding="zeros")
        return colors, in_img & valid[:, None]

    colors, mask = jax.vmap(per_view)(src_images, src_Ks, src_c2ws)
    return jnp.swapaxes(colors, 0, 1), jnp.swapaxes(mask, 0, 1)


def pixel_warp(pts, images, w2cs, intrinsics, size_hw):
    """Per-point pixel colors in every view (PatchProjector.pixel_warp)."""
    colors, mask = sample_features_from_maps(pts, images, w2cs, intrinsics, size_hw)
    return jnp.swapaxes(colors, 0, 1), jnp.swapaxes(mask, 0, 1)  # [N,V,3],[N,V]


class FinetuneState(NamedTuple):
    volume: jnp.ndarray  # [X, Y, Z, C] optimized conditional volume
    sdf_params: Any  # LatentSDFLayer params
    blend_params: Any  # BlendingRenderingNetwork params
    opt_state: Any
    step: jnp.ndarray


class FinetuneTrainer:
    """Optimize (volume, sdf MLP, blending net) on one shape.

    Losses: ref-view color L1 + eikonal + sparse + TV on the volume
    (tv_regularizer, sparse_sdf_network.py:658-678) + optional NCC patch
    loss (cal_losses_sdf finetune branch).
    """

    def __init__(self, stage, lr: float = 5e-4, tv_weight: float = 1e-4,
                 igr_weight: float = 0.1, sparse_weight: float = 0.02):
        import optax

        self.stage = stage
        # the SDF layer emits hidden_dim outputs: channel 0 is the sdf, the
        # remaining hidden_dim-1 are geometry features (matching the
        # reference's d_feature=hidden_dim-1, sparse_sdf_network.py:606)
        self.blend_net = BlendingRenderingNetwork(
            d_feature=stage.config.hidden_dim - 1, d_hidden=stage.config.hidden_dim
        )
        self.tx = optax.adam(lr)
        self.tv_weight = tv_weight
        self.igr_weight = igr_weight
        self.sparse_weight = sparse_weight

    def init_state(self, volume, mask_volume, key) -> FinetuneState:
        volume = jnp.asarray(volume) * mask_volume
        blend_params = self.blend_net.init(
            key,
            jnp.zeros((4, 3)), jnp.zeros((4, 3)), jnp.zeros((4, 3)),
            jnp.zeros((4, self.blend_net.d_feature)),
            jnp.zeros((4, 2, 3)), jnp.ones((4, 2)),
        )
        # COPY the warm-start weights: train_step donates the state, and
        # donated leaves that alias stage.params would delete the stage's
        # own buffers after the first step (breaking any later stage use)
        sdf_params = jax.tree_util.tree_map(
            jnp.array, self.stage.params["sdf"]["params"]["sdf_layer"]
        )
        trainable = (volume, {"params": sdf_params}, blend_params)
        return FinetuneState(
            volume=volume,
            sdf_params={"params": sdf_params},
            blend_params=blend_params,
            opt_state=self.tx.init(trainable),
            step=jnp.zeros((), jnp.int32),
        )

    def tv_regularizer(self, volume, mask):
        dx = (volume[1:] - volume[:-1]) ** 2
        dy = (volume[:, 1:] - volume[:, :-1]) ** 2
        dz = (volume[:, :, 1:] - volume[:, :, :-1]) ** 2
        tv = dx[:, :-1, :-1] + dy[:-1, :, :-1] + dz[:-1, :-1, :]
        m = (
            mask[:-1, :-1, :-1]
            * mask[1:, :-1, :-1]
            * mask[:-1, 1:, :-1]
            * mask[:-1, :-1, 1:]
        )
        tv = jnp.sqrt(jnp.mean(tv, axis=-1, keepdims=True) + 1e-6) * m
        return jnp.mean(tv)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: FinetuneState, mask_volume, scene, key):
        """One finetune step on a batch of rays of the reference view.

        scene: {'rays_o','rays_v' [N,3], 'rays_color' [N,3], 'near_far' [2],
                'images' [V,H,W,3], 'w2cs' [V,4,4], 'intrinsics' [V,3,3]}
        """
        from one2345_tpu.recon.renderer import RenderParams, render_rays
        from one2345_tpu.recon.sdf_network import SdfVolumeNetwork

        st = self.stage
        cfg = st.config

        def loss_fn(trainable):
            volume, sdf_params, blend_params = trainable
            volume = volume * mask_volume

            def full_params():
                return {
                    "params": {
                        **st.params["sdf"]["params"],
                        "sdf_layer": sdf_params["params"],
                    }
                }

            def sdf_fn(pts):
                return st.sdf_net.apply(full_params(), pts, volume, method=SdfVolumeNetwork.sdf)

            def sdf_grad_fn(pts):
                return st.sdf_net.apply(
                    full_params(), pts, volume, method=SdfVolumeNetwork.sdf_and_gradient
                )

            H, W = scene["images"].shape[1:3]

            def fitted_color_fn(flat_pts, dirs, feat, grads):
                # eps INSIDE the sqrt: mask-gated samples carry exactly-zero
                # gradients and d||x||/dx at 0 is NaN — it would poison the
                # whole backward pass through the SDF MLP (same hazard the
                # renderer guards at its grad_norm; renderer.py:285)
                norm = jnp.sqrt(jnp.sum(grads**2, axis=-1, keepdims=True) + 1e-12)
                normals = grads / (norm + 1e-6)
                pix_c, pix_m = pixel_warp(
                    flat_pts, scene["images"], scene["w2cs"], scene["intrinsics"], (H, W)
                )
                color, ok, _, _ = self.blend_net.apply(
                    blend_params, flat_pts, normals, dirs, feat,
                    pix_c, pix_m.astype(jnp.float32),
                )
                return color

            inv_var = st.variance_net.apply(st.params["variance"])
            out = render_rays(
                sdf_fn,
                sdf_grad_fn,
                None,
                inv_var,
                scene["rays_o"], scene["rays_v"],
                scene["near_far"][0], scene["near_far"][1],
                volume, mask_volume,
                scene["images"][..., :1],  # unused on the fitted path
                scene["images"], scene["w2cs"], scene["intrinsics"], (H, W),
                scene["rays_o"][0],
                RenderParams(
                    n_samples=cfg.n_samples, n_importance=cfg.n_importance,
                    background_rgb=1.0 if cfg.use_white_bkgd else None,
                ),
                key=key,
                fitted_color_fn=fitted_color_fn,
            )

            color = out["color_fine"]
            cl = jnp.mean(jnp.abs(color - scene["rays_color"]))
            eik = out["gradient_error_fine"]
            sparse = jnp.mean(jnp.exp(-cfg.sdf_decay_param * jnp.abs(out["sdf"])))
            tv = self.tv_regularizer(volume, mask_volume)
            loss = cl + self.igr_weight * eik + self.sparse_weight * sparse + self.tv_weight * tv
            return loss, {"color": cl, "eikonal": eik, "tv": tv}

        trainable = (state.volume, state.sdf_params, state.blend_params)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        import optax

        updates, opt_state = self.tx.update(grads, state.opt_state, trainable)
        volume, sdf_params, blend_params = optax.apply_updates(trainable, updates)
        return (
            FinetuneState(volume, sdf_params, blend_params, opt_state, state.step + 1),
            {"loss": loss, **metrics},
        )
