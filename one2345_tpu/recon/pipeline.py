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
import threading
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from one2345_tpu.core.config import ReconConfig
from one2345_tpu.recon import mesh_extract
from one2345_tpu.recon.featurenet import PyramidFeatureFusion
from one2345_tpu.recon.rendering_network import GeneralRenderingNetwork
from one2345_tpu.recon.renderer import projector_features
from one2345_tpu.recon.sdf_network import SdfVolumeNetwork, SingleVarianceNetwork

_VERT_BUCKET = 65536  # vertex-count padding bucket (avoids recompiles)


def _dtype_of(cfg: ReconConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


class ReconStage:
    """Holds module defs + params and exposes jitted stage functions."""

    def __init__(self, config: ReconConfig | None = None, params: Any = None, seed: int = 0):
        self.config = config or ReconConfig()
        # guards the shared _field_buf across the sparse-fetch -> marching
        # tets window when run_many overlaps requests (pipeline/runner.py)
        self._field_lock = threading.Lock()
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
        self.sdf_net_lod1 = None
        if cfg.num_lods > 1:
            self.sdf_net_lod1 = SdfVolumeNetwork(
                vol_dims=tuple(cfg.lod1_vol_dims),
                voxel_size=cfg.lod1_voxel_size,
                origin=tuple(cfg.partial_vol_origin),
                d_compress=cfg.lod1_d_compress,
                regnet_d_out=cfg.regnet_d_out,
                hidden_dim=cfg.hidden_dim,
                num_sdf_layers=cfg.num_sdf_layers,
                multires=cfg.multires,
                dtype=dt,
            )
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
        out = {
            "fusion": fusion_vars,
            "sdf": sdf_vars,
            "render": render_vars,
            "variance": var_vars,
        }
        if self.sdf_net_lod1 is not None:
            k5 = jax.random.fold_in(key, 5)
            prev_c = self.config.regnet_d_out
            hx, hy, hz = (d // 2 for d in self.sdf_net_lod1.vol_dims)
            out["sdf_lod1"] = jax.jit(self.sdf_net_lod1.init, static_argnums=(3, 4))(
                k5, feats, projs, (H, W), False,
                jnp.ones((hx, hy, hz, 1), bool),
                jnp.zeros((hx, hy, hz, prev_c)),
            )
            # the reference defines SEPARATE lod1 feature/rendering/variance
            # networks with identical architecture (one2345_lod_train.conf
            # rendering_network_lod1 / variance_network_lod1;
            # pyramid_feature_network_lod1 at trainer_generic.py:63) —
            # extra parameter trees applied through the same module defs
            out["fusion_lod1"] = jax.jit(self.fusion.init)(
                jax.random.fold_in(key, 8), imgs
            )
            out["render_lod1"] = jax.jit(self.render_net.init)(
                jax.random.fold_in(key, 6),
                jnp.zeros((4, 8, G)),
                jnp.zeros((V, 4, 8, 3 + F)),
                jnp.zeros((V, 4, 8, 4)),
                jnp.ones((V, 4, 8)),
            )
            out["variance_lod1"] = self.variance_net.init(jax.random.fold_in(key, 7))
        return out

    def _net(self, lod: int):
        return (self.sdf_net, "sdf") if lod == 0 else (self.sdf_net_lod1, "sdf_lod1")

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

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def sdf_chunk(self, params, pts, volume, lod: int = 0):
        """[N,3] normalized pts -> [N] sdf."""
        net, pkey = self._net(lod)
        sdf, _ = net.apply(params[pkey], pts, volume, method=SdfVolumeNetwork.sdf)
        return sdf[:, 0]

    @functools.partial(jax.jit, static_argnums=0)
    def feature_maps_lod1(self, params, images):
        """Separate lod1 pyramid features (obtain_pyramid_feature_maps
        lod=1, trainer_generic.py:1104-1125)."""
        return self.fusion.apply(params["fusion_lod1"], images)

    @functools.partial(jax.jit, static_argnums=0)
    def conditional_volume_lod1(self, params, feature_maps, projs, pre_mask, pre_feats):
        """Fine-lod (192^3) conditional volume conditioned on the pruned
        lod0 occupancy + features (get_conditional_volume lod>0 path)."""
        return self.sdf_net_lod1.apply(
            params["sdf_lod1"], feature_maps, projs,
            tuple(self.config.image_hw), False, pre_mask, pre_feats,
            method=SdfVolumeNetwork.build_volume,
        )

    @functools.partial(jax.jit, static_argnums=0)
    def prune_occupancy(self, params, volume_lod0, mask_lod0):
        """Near-surface voxel pruning of the coarse lod
        (get_valid_sparse_coords_by_sdf, sparse_neus_renderer.py:822-879):
        |sdf| < threshold, dilated 7^3, ANDed with the valid mask."""
        R = self.config.vol_dims[0]
        u = self.field_grid(params, volume_lod0, R).astype(jnp.float32)
        occ = (jnp.abs(u) < self.config.lod1_prune_threshold).astype(jnp.float32)
        occ = jax.lax.reduce_window(
            occ, -jnp.inf, jax.lax.max, (7, 7, 7), (1, 1, 1), "SAME"
        )
        return ((occ > 0)[..., None] & (mask_lod0 > 0))

    @functools.partial(jax.jit, static_argnums=(0, 8))
    def prune_occupancy_depth_filter(
        self, params, volume_lod0, mask_lod0, affines, intrinsics, c2ws,
        near_far, size_hw=(256, 256),
    ):
        """Depth-map-filtered near-surface pruning (the reference's
        prune_depth_filter path): sphere-trace lod0 depth maps at size/4
        (trainer_generic.py:443-449, near*1.5), then keep an |sdf| < tau
        voxel only if >=1 source view sees it within +-d_plane_nums voxels
        of its predicted depth — this drops the SDF's useless back-side
        shell (filter_pts_by_depthmaps, sparse_neus_renderer.py:687-743).

        :param affines: [V, 4, 4] K @ w2c in the normalized volume space
        :param intrinsics: [V, 4, 4] (or [V, 3, 3]) per-view K
        :param c2ws: [V, 4, 4] normalized-space camera-to-world
        :param near_far: [2]
        """
        from one2345_tpu.geometry.projection import project_points
        from one2345_tpu.geometry.sampling import bilinear_sample
        from one2345_tpu.recon.fast_renderer import extract_depth_maps

        cfg = self.config
        X = cfg.vol_dims[0]
        u = self.field_grid(params, volume_lod0, X).astype(jnp.float32)
        occ_sdf = jnp.abs(u) < cfg.lod1_prune_threshold

        H, W = size_hw
        h, w = H // 4, W // 4
        K = intrinsics[:, :3, :3]
        K_l4 = K.at[:, :2, :].multiply(0.25)  # intrinsics_l_4x
        near, far = near_far[0], near_far[1]
        sdf_vol = (-u)[..., None]  # field_grid returns -sdf (mc convention)
        depth, hit = extract_depth_maps(
            sdf_vol, K_l4, c2ws, h, w, near * 1.5, far
        )  # [V, h, w] ray-distance depth
        depth = (depth * hit)[..., None]  # zero where no surface was hit

        pts = self.sdf_net.voxel_world_coords().reshape(-1, 3)
        band = cfg.lod1_depth_plane_nums * cfg.voxel_size

        def view_ok(dmap, proj, c2w):
            x, y, z = project_points(pts, proj)
            gx = 2.0 * x / (W - 1) - 1.0
            gy = 2.0 * y / (H - 1) - 1.0
            inside = (jnp.abs(gx) <= 1.0) & (jnp.abs(gy) <= 1.0) & (z > 0)
            # x*(w-1)/(W-1) reproduces the reference chain exactly: it
            # renders at quarter res, F.interpolates to full size with
            # align_corners=True, then grid_samples align_corners=True
            # (trainer_generic.py:447-449 + filter_pts_by_depthmaps) —
            # i.e. corner-to-corner mapping, NOT the x/4 center mapping.
            px = (gx + 1.0) * 0.5 * (w - 1)
            py = (gy + 1.0) * 0.5 * (h - 1)
            d = bilinear_sample(dmap, px, py, padding="zeros")[:, 0]
            dist = jnp.linalg.norm(pts - c2w[:3, 3], axis=-1)
            valid_d = d > 0.5 * near
            lo = jnp.clip(d - band, near, far)
            hi = jnp.clip(d + band, near, far)
            return inside & valid_d & (dist > lo) & (dist < hi)

        ok = jax.vmap(view_ok)(depth, affines, c2ws).any(axis=0)  # [X^3]
        occ = (occ_sdf & ok.reshape(occ_sdf.shape)).astype(jnp.float32)
        occ = jax.lax.reduce_window(
            occ, -jnp.inf, jax.lax.max, (7, 7, 7), (1, 1, 1), "SAME"
        )
        return (occ > 0)[..., None] & (mask_lod0 > 0)

    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def field_grid(self, params, volume, resolution: int, lod: int = 0):
        """Dense -sdf field over [-1,1]^3, computed in ONE device program.

        TPU design: for the *regular* marching-cubes grid, trilinear
        sampling is separable — three [R, 96] interpolation matmuls resize
        the latent volume on the MXU (zero gathers; the gather formulation
        measured ~1s, this ~0.1s), then the SDF MLP streams over x-slabs
        via `lax.map`.  Exactly the same math as point-wise
        trilinear_sample + sdf_layer.

        Returns f16 (halves the ~20 MB/s device->host tunnel payload;
        marching cubes only needs signs + a lerp).
        """
        X = volume.shape[0]
        C = volume.shape[-1]
        R = resolution
        lin = jnp.linspace(-1.0, 1.0, R, dtype=jnp.float32)

        # [R, X] linear-interpolation matrix (align_corners grid)
        pos = (lin + 1.0) * 0.5 * (X - 1)
        i0 = jnp.clip(jnp.floor(pos), 0, X - 1).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, X - 1)
        t = (pos - i0.astype(jnp.float32))[:, None]
        eye = jnp.eye(X, dtype=jnp.float32)
        W = eye[i0] * (1.0 - t) + eye[i1] * t  # [R, X]

        vol = volume.astype(jnp.float32)
        vol = jnp.einsum("Xa,aYZC->XYZC", W, vol)  # [R, 96, 96, C]
        vol = jnp.einsum("Yb,XbZC->XYZC", W, vol)  # [R, R, 96, C]

        slab = max(1, (64 * 64 * 64) // (R * R))
        n_slabs = (R + slab - 1) // slab
        pad = n_slabs * slab - R
        vol = jnp.pad(vol, ((0, pad), (0, 0), (0, 0), (0, 0)))
        vol = vol.reshape(n_slabs, slab, R, X, C)
        lin_pad = jnp.pad(lin, (0, pad))
        xs_all = lin_pad.reshape(n_slabs, slab)
        yy, zz = jnp.meshgrid(lin, lin, indexing="ij")

        def do_slab(args):
            vslab, xs = args  # [slab, R, X, C], [slab]
            latent = jnp.einsum("Zc,SYcC->SYZC", W, vslab)  # [slab, R, R, C]
            pts = jnp.stack(
                [
                    jnp.broadcast_to(xs[:, None, None], (slab, R, R)),
                    jnp.broadcast_to(yy[None], (slab, R, R)),
                    jnp.broadcast_to(zz[None], (slab, R, R)),
                ],
                axis=-1,
            ).reshape(-1, 3)
            net, pkey = self._net(lod)
            out = net.apply(
                params[pkey], pts, latent.reshape(-1, C),
                method=SdfVolumeNetwork.sdf_from_latent,
            )
            return (-out[:, 0]).reshape(slab, R, R)

        u = jax.lax.map(do_slab, (vol, xs_all))
        return u.reshape(-1, R, R)[:R].astype(jnp.float16)

    @functools.partial(jax.jit, static_argnums=(0, 4, 5))
    def field_grid_i8(self, params, volume, mask_volume, resolution: int, lod: int = 0):
        """field_grid + on-device occupancy gating + int8 quantization.

        The far field is clipped to +-0.12 (only the zero crossing matters
        for marching cubes; i8 resolution 1e-3 is far below the voxel
        size), masked-out voxels go to -127 — the 256^3 payload drops to
        16 MB over the ~20 MB/s device->host tunnel."""
        R = resolution
        u = self.field_grid(params, volume, R, lod).astype(jnp.float32)
        occ = mask_volume[..., 0] > 0
        idx = (jnp.arange(R) * (occ.shape[0] / R)).astype(jnp.int32)
        occ_up = occ[idx][:, idx][:, :, idx]
        q = jnp.round(jnp.clip(u, -0.12, 0.12) * 1000.0)
        return jnp.where(occ_up, q, -127.0).astype(jnp.int8)

    @functools.partial(jax.jit, static_argnums=0)
    def pack_signs(self, q, threshold):
        """int8 field -> packed sign bits, 1 bit/voxel (bit i of byte j =
        voxel 8j+i > threshold; little-endian, np.unpackbits-compatible).
        8x smaller than the int8 grid over the slow device->host tunnel."""
        flat = q.reshape(-1)
        pad = (-flat.size) % 8
        if pad:
            flat = jnp.pad(flat, (0, pad), constant_values=-127)
        bits = (flat.reshape(-1, 8) > threshold).astype(jnp.uint8)
        weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
        return jnp.sum(bits * weights[None, :], axis=1, dtype=jnp.uint8)

    @functools.partial(jax.jit, static_argnums=0)
    def gather_field(self, q, idx):
        """Row-gather of int8 field values at flat indices (the TPU-safe
        gather form — see CLAUDE.md on multi-axis gathers)."""
        return jnp.take(q.reshape(-1), idx, axis=0)

    _IDX_BUCKET = 1 << 18  # index-count padding bucket (avoids recompiles)

    def _fetch_field_sparse(
        self, q, resolution: int, threshold: float
    ) -> tuple[np.ndarray, np.ndarray]:
        """Fetch the int8 field grid with ~6x less tunnel traffic.
        Returns (field, active_cube_ids): the sign-crossing cube set falls
        out of the fetch for free, letting marching tetrahedra skip its
        full-lattice scan (16.6M cubes at 256^3 vs ~100-200k active).

        Marching tetrahedra needs (a) the inside/outside sign of EVERY
        voxel and (b) exact values only at corners of sign-crossing cubes
        (for the edge lerp).  So: fetch the 1-bit sign plane (R^3/8 bytes),
        find crossing cubes on host, gather exact i8 values for just their
        corners, and fill everything else with the sign-correct clip value
        (+-120 — identical to the on-device far-field clip, so gradients
        used for face orientation keep their sign).  Vertices and triangles
        are bit-exact vs the dense fetch (crossing detection uses the same
        `> threshold` bits, and every lerped edge endpoint has its exact
        value); face WINDING may differ on knife-edge faces, because the
        central-difference orientation stencil can read +-120 fill values
        at neighbors of crossing-cube corners (<2% of faces in the
        identical-mesh test, which tolerates exactly that).
        """
        from one2345_tpu.native.build import sign_plane_analyze_native

        R = resolution
        bits = np.asarray(self.pack_signs(q, threshold))
        out = sign_plane_analyze_native(bits, R)
        if out is not None:
            inside, active_cubes, idx = out
        else:  # numpy fallback (no compiler) — same semantics, tested equal
            inside = (
                np.unpackbits(bits, bitorder="little")[: R * R * R]
                .reshape(R, R, R)
                .astype(bool)
            )
            shifts = [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]
            cnt = np.zeros((R - 1, R - 1, R - 1), np.uint8)
            for dx, dy, dz in shifts:
                cnt += inside[dx : R - 1 + dx, dy : R - 1 + dy, dz : R - 1 + dz]
            active = (0 < cnt) & (cnt < 8)
            needed = np.zeros((R, R, R), bool)
            for dx, dy, dz in shifts:
                needed[dx : R - 1 + dx, dy : R - 1 + dy, dz : R - 1 + dz] |= active
            active_cubes = np.flatnonzero(active)
            idx = np.flatnonzero(needed)

        # reuse the fill buffer across calls: a fresh 67 MB float32 alloc
        # page-faults for ~0.5 s on first touch (measured); the buffer is
        # consumed by marching_tetrahedra before the next reconstruct call
        f = getattr(self, "_field_buf", None)
        if f is None or f.shape != (R, R, R):
            f = np.empty((R, R, R), np.float32)
            self._field_buf = f
        np.copyto(f, np.float32(threshold - 120.0))
        np.copyto(f, np.float32(threshold + 120.0), where=inside)
        if idx.size:
            n = int(np.ceil(idx.size / self._IDX_BUCKET) * self._IDX_BUCKET)
            pad = np.zeros(n, np.int32)
            pad[: idx.size] = idx
            vals = np.asarray(self.gather_field(q, jnp.asarray(pad)))[: idx.size]
            f.reshape(-1)[idx] = vals.astype(np.float32)
        return f, active_cubes

    @functools.partial(jax.jit, static_argnums=(0, 9))
    def color_chunk(
        self, params, verts, volume, mask_volume, feature_maps, color_maps,
        w2cs, intrinsics, lod: int = 0,
    ):
        """Vertex colors via the view-independent projector + blending net
        (projector.py:231-425 + validate_colored_mesh)."""
        net, pkey = self._net(lod)
        sdf, feat, grads = net.apply(
            params[pkey], verts, volume, method=SdfVolumeNetwork.sdf_and_gradient
        )
        normals = grads / (jnp.linalg.norm(grads, axis=-1, keepdims=True) + 1e-6)
        # sample the per-view maps in the stage compute dtype: concatenating
        # f32 color maps onto bf16 fusion features would silently upcast the
        # whole [V, N, 59] gather to f32, doubling its bandwidth — and the
        # gather traffic (32 views x 4 taps x 59 ch per vertex) dominates
        # this pass; bf16 color error is ~0.4%, below one uint8 LSB
        dt = _dtype_of(self.config)
        geo_feat, rgb_feat, ray_diff, mask = projector_features(
            verts[None],  # [1, N, 3]
            volume,
            mask_volume,
            feature_maps.astype(dt),
            color_maps.astype(dt),
            w2cs,
            intrinsics,
            tuple(self.config.image_hw),
            normals,
        )
        # lod1 meshes are colored by the SEPARATE lod1 blending net when its
        # weights exist (validate_colored_mesh uses the lod-matched
        # rendering_network); converted lod0-only checkpoints fall back to
        # the shared net (dict structure is static under jit)
        rkey = "render_lod1" if lod == 1 and "render_lod1" in params else "render"
        colors, _ = self.render_net.apply(
            params[rkey], geo_feat, rgb_feat, ray_diff, mask
        )
        return colors[0]  # [N, 3]

    # --------------------------------------------------------------- driver
    def extract_field(self, volume, resolution: int, lod: int = 0) -> np.ndarray:
        """Dense -sdf field on the [-1,1]^3 cube (extract_fields,
        sparse_neus_renderer.py:881-905): one device program + one f16 fetch."""
        u = self.field_grid(self.params, volume, resolution, lod)
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
        lod = 0
        if cfg.num_lods > 1 and self.sdf_net_lod1 is not None:
            # coarse-to-fine: prune near-surface lod0 voxels, build the
            # 192^3 fine volume conditioned on them (export_mesh_step lod1
            # path, trainer_generic.py:903-934)
            if cfg.lod1_prune_depth_filter:
                pre_mask = self.prune_occupancy_depth_filter(
                    self.params, volume, mask_volume,
                    jnp.asarray(cameras["affines"][src]),
                    jnp.asarray(cameras["intrinsics"][src]),
                    jnp.asarray(cameras["c2ws"][src]),
                    jnp.asarray(cameras["near_fars"][1]),
                    tuple(cfg.image_hw),
                )
            else:
                pre_mask = self.prune_occupancy(self.params, volume, mask_volume)
            # the fine lod has its OWN pyramid feature network; converted
            # lod0-only checkpoints fall back to the shared one
            if "fusion_lod1" in self.params:
                feats = self.feature_maps_lod1(self.params, jnp.asarray(images))
            out1 = self.conditional_volume_lod1(
                self.params, feats, jnp.asarray(cameras["affines"][src]),
                pre_mask, volume,
            )
            volume, mask_volume = out1["volume"], out1["mask"]
            lod = 1

        # occupancy-gated int8 field: gating on device
        # (extract_geometry's empty_mask culling, renderer:923-930);
        # the int8 field is the sdf scaled by 1000 — scale the threshold too
        q = self.field_grid_i8(self.params, volume, mask_volume, resolution, lod)
        thr = cfg.mesh_threshold * 1000.0
        if cfg.sparse_field_fetch:
            # 2 MB sign plane + sparse refinement instead of the 16 MB grid.
            # The fetch fills the stage-shared _field_buf and marching tets
            # reads it, so the whole window holds the lock: overlapped
            # run_many requests must not rewrite the buffer mid-read.
            with self._field_lock:
                u, active_cubes = self._fetch_field_sparse(q, resolution, thr)
                verts_grid, faces = mesh_extract.marching_tetrahedra(
                    u, thr, active_cubes=active_cubes
                )
        else:
            u, active_cubes = np.asarray(q, np.float32), None
            verts_grid, faces = mesh_extract.marching_tetrahedra(
                u, thr, active_cubes=active_cubes
            )
        verts_n = mesh_extract.grid_to_world(verts_grid, (-1, -1, -1), (1, 1, 1), resolution)

        # vertex colors in padded buckets.  Device conversions hoisted out
        # of the chunk loop: a host-side image stack re-uploaded per chunk
        # is 25 MB x chunks over the ~20 MB/s tunnel (measured as the
        # dominant "colors" cost when reconstruct is fed numpy arrays)
        n = len(verts_n)
        colors = np.zeros((n, 3), np.float32)
        if n:
            imgs_dev = jnp.asarray(images)
            w2cs_dev = jnp.asarray(cameras["w2cs"][src])
            intr_dev = jnp.asarray(cameras["intrinsics"][src])
            padded = int(np.ceil(n / _VERT_BUCKET) * _VERT_BUCKET)
            vpad = np.zeros((padded, 3), np.float32)
            vpad[:n] = verts_n
            out = []
            for i in range(0, padded, _VERT_BUCKET):
                out.append(self.color_chunk(
                    self.params,
                    jnp.asarray(vpad[i : i + _VERT_BUCKET]),
                    volume,
                    mask_volume,
                    feats,
                    imgs_dev,
                    w2cs_dev,
                    intr_dev,
                    lod,
                ))
            # one device concat + one fetch instead of a fetch per chunk
            colors = np.asarray(
                out[0] if len(out) == 1 else jnp.concatenate(out), np.float32
            )[:n]

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
