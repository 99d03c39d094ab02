"""Full-image validation rendering (val_step parity).

Parity target: GenericTrainer.val_step (trainer_generic.py:359-622) — render
the reference view in 512-ray chunks, assemble color/depth/normal panels,
compute PSNR.  Artifact dumps go through core.logging.MetricsLogger.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from one2345_tpu.geometry.rays import rays_from_camera
from one2345_tpu.recon.renderer import RenderParams, render_rays
from one2345_tpu.recon.sdf_network import SdfVolumeNetwork


class Validator:
    """Chunked full-image renders against a ReconStage."""

    def __init__(self, stage, n_rays_chunk: int = 1024):
        self.stage = stage
        self.chunk = n_rays_chunk

    @functools.partial(jax.jit, static_argnums=(0, 13))
    def _render_chunk(
        self, params, rays_o, rays_d, near, far, volume, mask_volume,
        feats, colors, w2cs, intrinsics, query_cam_center, lod: int = 0,
    ):
        st = self.stage
        cfg = st.config
        net, pkey = st._net(lod)
        rkey = "render_lod1" if lod == 1 and "render_lod1" in params else "render"
        vkey = "variance_lod1" if lod == 1 and "variance_lod1" in params else "variance"

        def sdf_fn(pts):
            return net.apply(params[pkey], pts, volume, method=SdfVolumeNetwork.sdf)

        def sdf_grad_fn(pts):
            return net.apply(
                params[pkey], pts, volume, method=SdfVolumeNetwork.sdf_and_gradient
            )

        def render_net_fn(geo, rgb, rd, m):
            return st.render_net.apply(params[rkey], geo, rgb, rd, m)

        inv_var = st.variance_net.apply(params[vkey])
        out = render_rays(
            sdf_fn, sdf_grad_fn, render_net_fn, inv_var,
            rays_o, rays_d, near, far, volume, mask_volume,
            feats, colors, w2cs, intrinsics, tuple(cfg.image_hw),
            query_cam_center,
            RenderParams(
                n_samples=cfg.n_samples, n_importance=cfg.n_importance,
                background_rgb=1.0 if cfg.use_white_bkgd else None,
            ),
        )
        normals = out["gradients"] * out["weights"][..., None]
        return {
            "color": out["color_fine"],
            "depth": out["depth"][:, 0],
            "normal": jnp.sum(normals, axis=1),
        }

    def render_view(
        self, images, cameras, view_idx: int = 0, H: int = 256, W: int = 256,
        lod: int = 0,
    ) -> dict:
        """Render the query view of a scene -> color/depth/normal images +
        PSNR vs the reference image.

        :param images: [V_src, H, W, 3] source views (cameras index 1..V)
        :param cameras: build_recon_cameras pack
        :param lod: 1 renders the fine lod (coarse-pruned 192^3 volume on
            the separate lod1 networks — val_step's num_lods=2 path)
        """
        st = self.stage
        params = st.params
        src = slice(1, images.shape[0] + 1)
        feats = st.feature_maps(params, jnp.asarray(images))
        vol = st.conditional_volume(params, feats, jnp.asarray(cameras["affines"][src]))
        volume, mask_volume = vol["volume"], vol["mask"]
        if lod == 1:
            assert st.sdf_net_lod1 is not None, "stage built with num_lods=1"
            # same prune path as scene_loss/reconstruct — a depth-filter
            # config must validate the occupancy mask it actually trains
            if st.config.lod1_prune_depth_filter:
                pre_mask = st.prune_occupancy_depth_filter(
                    params, volume, mask_volume,
                    jnp.asarray(cameras["affines"][src]),
                    jnp.asarray(cameras["intrinsics"][src]),
                    jnp.asarray(cameras["c2ws"][src]),
                    jnp.asarray(cameras["near_fars"][1]),
                    tuple(st.config.image_hw),
                )
            else:
                pre_mask = st.prune_occupancy(params, volume, mask_volume)
            if "fusion_lod1" in params:
                feats = st.feature_maps_lod1(params, jnp.asarray(images))
            out1 = st.conditional_volume_lod1(
                params, feats, jnp.asarray(cameras["affines"][src]), pre_mask, volume
            )
            volume, mask_volume = out1["volume"], out1["mask"]

        K = jnp.asarray(cameras["intrinsics"][view_idx])
        c2w = jnp.asarray(cameras["c2ws"][view_idx])
        rays_o, rays_d = rays_from_camera(H, W, K, c2w)
        near, far = cameras["near_fars"][view_idx]

        outs = {"color": [], "depth": [], "normal": []}
        n = H * W
        pad = (-n) % self.chunk
        ro = jnp.concatenate([rays_o, jnp.zeros((pad, 3))])
        rd = jnp.concatenate([rays_d, jnp.ones((pad, 3))])
        for i in range(0, n + pad, self.chunk):
            out = self._render_chunk(
                params, ro[i : i + self.chunk], rd[i : i + self.chunk],
                jnp.asarray(near), jnp.asarray(far), volume, mask_volume,
                feats, jnp.asarray(images), jnp.asarray(cameras["w2cs"][src]),
                jnp.asarray(cameras["intrinsics"][src]), c2w[:3, 3], lod,
            )
            # keep chunk outputs ON DEVICE — a per-chunk np.asarray is a
            # host round-trip over the ~20 MB/s tunnel for every 1024 rays
            for k in outs:
                outs[k].append(out[k])
        # one concatenate per key on device, ONE host fetch for the panel
        fetched = jax.device_get(
            {k: jnp.concatenate(v).astype(jnp.float32) for k, v in outs.items()}
        )
        color = fetched["color"][:n].reshape(H, W, 3)
        depth = fetched["depth"][:n].reshape(H, W)
        normal = fetched["normal"][:n].reshape(H, W, 3)
        return {"color": color, "depth": depth, "normal": normal}

    @staticmethod
    def psnr(pred: np.ndarray, gt: np.ndarray) -> float:
        mse = float(np.mean((pred - gt) ** 2))
        return float(20.0 * np.log10(1.0 / np.sqrt(mse + 1e-12)))

    @staticmethod
    def panel(result: dict, gt: np.ndarray | None = None) -> np.ndarray:
        """[H, n*W, 3] side-by-side color/depth/normal(+gt) panel
        (save_visualization, trainer_generic.py:984-1050)."""
        H, W = result["depth"].shape
        d = result["depth"]
        dmin, dmax = float(d.min()), float(d.max() + 1e-9)
        depth_vis = np.repeat(((d - dmin) / (dmax - dmin))[..., None], 3, -1)
        normal_vis = np.clip(result["normal"] * 0.5 + 0.5, 0, 1)
        panels = [result["color"], depth_vis, normal_vis]
        if gt is not None:
            panels.insert(0, gt)
        return np.concatenate(panels, axis=1)
