"""End-to-end reconstruction stage: 32 posed views -> vertex-colored mesh.

Replaces the reference's subprocess boundary (`os.system("python
exp_runner_generic_blender_val.py --mode export_mesh ...")`, run.py:61-67) —
the whole stage is an in-process object holding jitted functions, so model
init/compile happens once per process instead of once per mesh.

Mirrors Runner.export_mesh -> GenericTrainer.export_mesh_step ->
validate_colored_mesh (exp_runner_generic_blender_val.py:553-587,
trainer_generic.py:827-979,1309-1380).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from one2345_tpu.core.config import ReconConfig
from one2345_tpu.recon import mesh_extract
from one2345_tpu.recon.featurenet import PyramidFeatureFusion
from one2345_tpu.recon.rendering_network import GeneralRenderingNetwork
from one2345_tpu.recon.renderer import compute_ray_diff, projector_features
from one2345_tpu.recon.sdf_network import SdfVolumeNetwork, SingleVarianceNetwork

_VERT_BUCKET = 65536  # vertex-count padding bucket (avoids recompiles)


def _dtype_of(cfg: ReconConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


class ReconStage:
    """Holds module defs + params and exposes jitted stage functions."""

    def __init__(self, config: ReconConfig | None = None, params: Any = None, seed: int = 0):
        self.config = config or ReconConfig()
        cfg = self.config
        dt = _dtype_of(cfg)
        self.fusion = PyramidFeatureFusion(dtype=dt)
        self.sdf_net = SdfVolumeNetwork(
            vol_dims=tuple(cfg.vol_dims),
            voxel_size=cfg.voxel_size,
            origin=tuple(cfg.partial_vol_origin),
            d_compress=cfg.d_pyramid_feature_compress,
            regnet_d_out=cfg.regnet_d_out,
            hidden_dim=cfg.hidden_dim,
            num_sdf_layers=cfg.num_sdf_layers,
            multires=cfg.multires,
            dtype=dt,
        )
        self.render_net = GeneralRenderingNetwork(
            in_geometry_feat_ch=cfg.in_geometry_feat_ch,
            in_rendering_feat_ch=cfg.in_rendering_feat_ch,
            anti_alias_pooling=cfg.anti_alias_pooling,
            dtype=dt,
        )
        self.variance_net = SingleVarianceNetwork(init_val=cfg.variance_init_val)
        self.params = params if params is not None else self.init_params(jax.random.key(seed))

    # ------------------------------------------------------------------ init
    def init_params(self, key) -> dict:
        # every init is jitted: flax init otherwise runs op-by-op (minutes
        # of eager dispatch for the 3D U-Net on CPU backends)
        kf, ks, kr, kv = jax.random.split(key, 4)
        V, H, W = 2, 64, 64
        imgs = jnp.zeros((V, H, W, 3))
        fusion_vars = jax.jit(self.fusion.init)(kf, imgs)

        feats = jnp.zeros((V, H, W, self.config.ch_in))
        projs = jnp.tile(jnp.eye(4)[None], (V, 1, 1))
        sdf_vars = jax.jit(self.sdf_net.init, static_argnums=3)(ks, feats, projs, (H, W))

        G = self.config.regnet_d_out
        F = self.config.in_rendering_feat_ch
        render_vars = jax.jit(self.render_net.init)(
            kr,
            jnp.zeros((4, 8, G)),
            jnp.zeros((V, 4, 8, 3 + F)),
            jnp.zeros((V, 4, 8, 4)),
            jnp.ones((V, 4, 8)),
        )
        var_vars = self.variance_net.init(kv)
        return {
            "fusion": fusion_vars,
            "sdf": sdf_vars,
            "render": render_vars,
            "variance": var_vars,
        }

    # ----------------------------------------------------------- jitted fns
    @functools.partial(jax.jit, static_argnums=0)
    def feature_maps(self, params, images):
        """[V, H, W, 3] -> [V, H, W, 56] fused pyramid features."""
        return self.fusion.apply(params["fusion"], images)

    @functools.partial(jax.jit, static_argnums=0)
    def conditional_volume(self, params, feature_maps, projs):
        """Fused features + projections -> conditional volume dict."""
        return self.sdf_net.apply(
            params["sdf"],
            feature_maps,
            projs,
            tuple(self.config.image_hw),
            method=SdfVolumeNetwork.build_volume,
        )

    @functools.partial(jax.jit, static_argnums=0)
    def sdf_chunk(self, params, pts, volume):
        """[N,3] normalized pts -> [N] sdf."""
        sdf, _ = self.sdf_net.apply(
            params["sdf"], pts, volume, method=SdfVolumeNetwork.sdf
        )
        return sdf[:, 0]

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def field_grid(self, params, volume, resolution: int):
        """Dense -sdf field over [-1,1]^3, computed in ONE device program.

        The grid coordinates are generated on device (nothing is uploaded),
        x-slabs stream through a `lax.map` so peak activation memory stays
        bounded, and the result returns as f16 — the device->host tunnel of
        this environment moves ~20 MB/s, so halving the 256^3 field payload
        matters more than f32 precision (marching cubes only needs signs +
        a lerp).
        """
        lin = jnp.linspace(-1.0, 1.0, resolution, dtype=jnp.float32)
        slab = max(1, (64 * 64 * 64) // (resolution * resolution))
        n_slabs = (resolution + slab - 1) // slab
        yy, zz = jnp.meshgrid(lin, lin, indexing="ij")

        def do_slab(i):
            xs = jax.lax.dynamic_slice(lin, (i * slab,), (slab,))
            pts = jnp.stack(
                [
                    jnp.broadcast_to(xs[:, None, None], (slab, resolution, resolution)),
                    jnp.broadcast_to(yy[None], (slab, resolution, resolution)),
                    jnp.broadcast_to(zz[None], (slab, resolution, resolution)),
                ],
                axis=-1,
            ).reshape(-1, 3)
            sdf, _ = self.sdf_net.apply(
                params["sdf"], pts, volume, method=SdfVolumeNetwork.sdf
            )
            return (-sdf[:, 0]).reshape(slab, resolution, resolution)

        u = jax.lax.map(do_slab, jnp.arange(n_slabs))
        return u.reshape(-1, resolution, resolution)[:resolution].astype(jnp.float16)

    @functools.partial(jax.jit, static_argnums=0)
    def color_chunk(
        self, params, verts, volume, mask_volume, feature_maps, color_maps,
        w2cs, intrinsics,
    ):
        """Vertex colors via the view-independent projector + blending net
        (projector.py:231-425 + validate_colored_mesh)."""
        sdf, feat, grads = self.sdf_net.apply(
            params["sdf"], verts, volume, method=SdfVolumeNetwork.sdf_and_gradient
        )
        normals = grads / (jnp.linalg.norm(grads, axis=-1, keepdims=True) + 1e-6)
        geo_feat, rgb_feat, ray_diff, mask = projector_features(
            verts[None],  # [1, N, 3]
            volume,
            mask_volume,
            feature_maps,
            color_maps,
            w2cs,
            intrinsics,
            tuple(self.config.image_hw),
            normals,
        )
        colors, _ = self.render_net.apply(
            params["render"], geo_feat, rgb_feat, ray_diff, mask
        )
        return colors[0]  # [N, 3]

    # --------------------------------------------------------------- driver
    def extract_field(self, volume, resolution: int) -> np.ndarray:
        """Dense -sdf field on the [-1,1]^3 cube (extract_fields,
        sparse_neus_renderer.py:881-905): one device program + one f16 fetch."""
        u = self.field_grid(self.params, volume, resolution)
        return np.asarray(u, dtype=np.float32)

    def reconstruct(
        self,
        images: np.ndarray,
        cameras: dict,
        resolution: int | None = None,
        out_path: str | None = None,
    ) -> dict:
        """32 posed RGB views -> vertex-colored mesh.

        :param images: [32, 256, 256, 3] float in [0,1] (white-composited)
        :param cameras: pack from geometry.cameras.build_recon_cameras —
            index 0 is the reference view (not an input image), 1..32 the
            source views
        :return: dict(vertices [N,3] world space, faces [M,3], colors [N,3])
        """
        cfg = self.config
        resolution = resolution or cfg.mesh_resolution
        V = images.shape[0]
        assert cameras["w2cs"].shape[0] == V + 1, "cameras = ref + source views"

        src = slice(1, V + 1)
        feats = self.feature_maps(self.params, jnp.asarray(images))
        vol_out = self.conditional_volume(
            self.params, feats, jnp.asarray(cameras["affines"][src])
        )
        volume, mask_volume = vol_out["volume"], vol_out["mask"]

        u = self.extract_field(volume, resolution)
        # cull voxels outside the valid mask (occupancy gating of
        # extract_geometry's empty_mask path keeps spurious far-field
        # crossings out of the mesh)
        occ = np.asarray(mask_volume[..., 0]) > 0
        idx = (np.arange(resolution) * (occ.shape[0] / resolution)).astype(int)
        u = np.where(occ[np.ix_(idx, idx, idx)], u, -100.0)

        verts_grid, faces = mesh_extract.marching_tetrahedra(u, cfg.mesh_threshold)
        verts_n = mesh_extract.grid_to_world(verts_grid, (-1, -1, -1), (1, 1, 1), resolution)

        # vertex colors in padded buckets
        n = len(verts_n)
        colors = np.zeros((n, 3), np.float32)
        if n:
            padded = int(np.ceil(n / _VERT_BUCKET) * _VERT_BUCKET)
            vpad = np.zeros((padded, 3), np.float32)
            vpad[:n] = verts_n
            out = []
            for i in range(0, padded, _VERT_BUCKET):
                c = self.color_chunk(
                    self.params,
                    jnp.asarray(vpad[i : i + _VERT_BUCKET]),
                    volume,
                    mask_volume,
                    feats,
                    jnp.asarray(images),
                    jnp.asarray(cameras["w2cs"][src]),
                    jnp.asarray(cameras["intrinsics"][src]),
                )
                out.append(np.asarray(c, np.float32))
            colors = np.concatenate(out)[:n]

        verts_world = mesh_extract.apply_mesh_transforms(
            verts_n, cameras.get("scale_mat"), cameras.get("trans_mat")
        )
        result = {
            "vertices": verts_world,
            "faces": faces,
            "colors": np.clip(colors, 0, 1),
        }
        if out_path:
            mesh_extract.save_ply(
                out_path, verts_world, faces, (np.clip(colors, 0, 1) * 255).astype(np.uint8)
            )
            result["path"] = out_path
        return result
