"""Cost-volume conditioned SDF network (generalizable SparseNeuS, lod0).

Parity target: reconstruction/models/sparse_sdf_network.py —
`SparseSdfNetwork` (:139-540) and `LatentSDFLayer` (:35-136), re-designed
dense/fixed-shape for TPU:

- the frustum-culled sparse voxel list becomes a dense 96^3 lattice with an
  occupancy mask (no dynamic shapes);
- the per-view feature fetch accumulates sum / sum-of-squares over a
  `lax.scan` across views instead of materializing the [N_vox, V, C] tensor
  (HBM-bandwidth-friendly: keeps the working set at ~100MB instead of ~2GB);
- torchsparse SparseCostRegNet -> dense masked CostRegNet (costreg.py);
- autograd.grad eikonal normals -> `jax.grad` of the (natively
  twice-differentiable) sdf function.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from one2345_tpu.geometry.projection import project_points
from one2345_tpu.geometry.sampling import bilinear_sample, trilinear_sample
from one2345_tpu.nn.layers import ConvBnAct, WNDense, positional_encoding


def softplus100(x):
    """Softplus with beta=100 (sparse_sdf_network.py:106-107), numerically
    stable: softplus(100x)/100."""
    return jax.nn.softplus(100.0 * x) / 100.0


class LatentSDFLayer(nn.Module):
    """SDF MLP conditioned on a per-point latent code.

    4 layers (3 linears), hidden 128, positional encoding multires 6
    (in 3 -> 39), latent (16ch) concatenated to every hidden layer input,
    geometric (IDR) initialization, weight norm, softplus(beta=100).
    Output: [.., hidden] = (sdf, geometry features) — channel 0 is the sdf,
    the remaining hidden-1 are features (reference sdf() slicing,
    sparse_sdf_network.py:416-417).
    """

    d_hidden: int = 128
    n_layers: int = 4
    multires: int = 6
    d_latent: int = 16
    bias: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts, latent):
        # pts: [..., 3] in the normalized volume space; latent: [..., d_latent]
        emb = positional_encoding(pts, self.multires)
        d_in = emb.shape[-1]
        h = self.d_hidden

        def init_first(key, shape):
            # weight[:, :3] ~ N(0, sqrt(2)/sqrt(out)); positional-encoding
            # columns zeroed (sparse_sdf_network.py:83-88). shape=(in, out)
            w = jnp.zeros(shape)
            std = np.sqrt(2) / np.sqrt(shape[1])
            w = w.at[:3, :].set(jax.random.normal(key, (3, shape[1])) * std)
            return w

        def init_mid(key, shape):
            # N(0, sqrt(2)/sqrt(out)) with latent columns zeroed (:94-98)
            std = np.sqrt(2) / np.sqrt(shape[1])
            w = jax.random.normal(key, shape) * std
            return w.at[-self.d_latent:, :].set(0.0)

        def init_last(key, shape):
            # N(mean=sqrt(pi)/sqrt(in), std=1e-4), latent columns zeroed (:76-81)
            mean = np.sqrt(np.pi) / np.sqrt(shape[0])
            w = mean + jax.random.normal(key, shape) * 1e-4
            return w.at[-self.d_latent:, :].set(0.0)

        def init_last_bias(key, shape):
            b = jnp.full(shape, -self.bias)
            return b.at[-self.d_latent:].set(0.0)

        x = emb
        # l = 0
        x = WNDense(h, kernel_init=init_first, dtype=self.dtype, name="lin0")(x)
        x = softplus100(x)
        # middle layers l = 1 .. n_layers-3 (latent concat, activated)
        for l in range(1, self.n_layers - 2):
            x = jnp.concatenate([x, latent], axis=-1)
            x = WNDense(h, kernel_init=init_mid, dtype=self.dtype, name=f"lin{l}")(x)
            x = softplus100(x)
        # last layer l = n_layers-2 (latent concat, no activation).
        # Width is d_hidden, NOT d_hidden+1: the reference constructor's
        # dims_out = [d_hidden]*(n_layers-1) + [d_out] only ever indexes
        # dims_out[0..n_layers-2], so its d_out=hidden+1 argument is dead
        # and ckpt_215000's lin2 is 128-wide (sparse_sdf_network.py:54,73;
        # proven by tests/test_torch_parity.py::test_latent_sdf_layer_parity).
        x = jnp.concatenate([x, latent], axis=-1)
        x = WNDense(
            h,
            kernel_init=init_last,
            bias_init=init_last_bias,
            dtype=self.dtype,
            name=f"lin{self.n_layers - 2}",
        )(x)
        return x


class SingleVarianceNetwork(nn.Module):
    """Learnable scalar s; inv_variance = exp(10 s) (models/fields.py:179-185)."""

    init_val: float = 0.2

    @nn.compact
    def __call__(self):
        s = self.param("variance", lambda k: jnp.asarray(self.init_val, jnp.float32))
        return jnp.exp(10.0 * s)


class SdfVolumeNetwork(nn.Module):
    """Feature compression + cost volume + regularization + SDF MLP.

    ``build_volume`` produces the conditional feature volume from per-view
    fused pyramid features; ``sdf`` evaluates (sdf, features) at points.
    """

    vol_dims: tuple = (96, 96, 96)
    voxel_size: float = 2.0 / 95.0
    origin: tuple = (-1.0, -1.0, -1.0)
    d_compress: int = 16
    regnet_d_out: int = 16
    hidden_dim: int = 128
    num_sdf_layers: int = 4
    multires: int = 6
    dtype: Any = jnp.float32
    # the SDF MLP stays f32 even when the conv feature path (compress +
    # cost-volume U-Net) runs bf16: its output's zero crossing IS the
    # surface, and the softplus/weight-norm chain loses visible precision
    # in half floats, while the conv path feeds a learned latent where
    # bf16 noise is far below the feature variance
    mlp_dtype: Any = jnp.float32

    def setup(self):
        from one2345_tpu.recon.costreg import CostRegNet

        self.compress = ConvBnAct(self.d_compress, (3, 3), dtype=self.dtype, name="compress")
        self.costreg = CostRegNet(d_out=self.regnet_d_out, dtype=self.dtype, name="costreg")
        self.sdf_layer = LatentSDFLayer(
            d_hidden=self.hidden_dim,
            n_layers=self.num_sdf_layers,
            multires=self.multires,
            d_latent=self.regnet_d_out,
            dtype=self.mlp_dtype,
            name="sdf_layer",
        )

    def __call__(self, feature_maps, projs, size_hw=(256, 256), train=False,
                 pre_mask=None, pre_feats=None):
        """Init helper: traces every submodule (build_volume + sdf_layer)."""
        out = self.build_volume(feature_maps, projs, size_hw, train, pre_mask, pre_feats)
        sdf, _ = self.sdf(jnp.zeros((8, 3)), out["volume"])
        return out, sdf

    def voxel_world_coords(self) -> jnp.ndarray:
        """[X,Y,Z,3] world coordinates of voxel centers."""
        X, Y, Z = self.vol_dims
        gx, gy, gz = jnp.meshgrid(
            jnp.arange(X, dtype=jnp.float32),
            jnp.arange(Y, dtype=jnp.float32),
            jnp.arange(Z, dtype=jnp.float32),
            indexing="ij",
        )
        coords = jnp.stack([gx, gy, gz], axis=-1)
        return coords * self.voxel_size + jnp.asarray(self.origin)

    def build_volume(
        self,
        feature_maps: jnp.ndarray,
        projs: jnp.ndarray,
        size_hw: tuple[int, int] = (256, 256),
        train: bool = False,
        pre_mask: jnp.ndarray | None = None,
        pre_feats: jnp.ndarray | None = None,
    ) -> dict:
        """Conditional volume from fused pyramid features.

        :param feature_maps: [V, H, W, 56] fused pyramid features
        :param projs: [V, 4, 4] affine projection mats (K @ w2c, normalized space)
        :param pre_mask: lod-1 only — [X/2, Y/2, Z/2, 1] pruned occupancy
            from the previous lod (coords upsampled 1->8 children,
            sparse_sdf_network.py upsample:198-219)
        :param pre_feats: lod-1 only — [X/2, Y/2, Z/2, C_prev] parent
            features concatenated into the cost volume
        :return: dict with 'volume' [X,Y,Z,regnet_d_out], 'mask' [X,Y,Z,1]

        Mirrors get_conditional_volume (sparse_sdf_network.py:286-400): 2D
        compression, frustum culling (>=2 views), variance+mean aggregation,
        sparse U-Net regularization.
        """
        feats = self.compress(feature_maps, train)  # [V, H, W, C]
        V = feats.shape[0]
        C = feats.shape[-1]
        pts = self.voxel_world_coords()  # [X,Y,Z,3]
        X, Y, Z = pts.shape[:3]
        pts_flat = pts.reshape(-1, 3)
        sH, sW = size_hw
        fH, fW = feats.shape[1], feats.shape[2]

        def view_step(carry, inp):
            s, ss, cnt = carry
            feat, proj = inp
            x, y, z = project_points(pts_flat, proj)
            gx = 2.0 * x / (sW - 1) - 1.0
            gy = 2.0 * y / (sH - 1) - 1.0
            mask = (jnp.abs(gx) <= 1.0) & (jnp.abs(gy) <= 1.0) & (z > 0)
            px = (gx + 1.0) * 0.5 * (fW - 1)
            py = (gy + 1.0) * 0.5 * (fH - 1)
            f = bilinear_sample(feat, px, py, padding="zeros")  # [N, C]
            # accumulate in f32 even when the feature path runs bf16: the
            # variance below is E[x^2] - E[x]^2, which cancels
            # catastrophically in half-precision sums over 32 views
            f = f.astype(jnp.float32)
            return (s + f, ss + f * f, cnt + mask.astype(jnp.float32)), None

        init = (
            jnp.zeros((pts_flat.shape[0], C), jnp.float32),
            jnp.zeros((pts_flat.shape[0], C), jnp.float32),
            jnp.zeros((pts_flat.shape[0],), jnp.float32),
        )
        # remat the per-view body: reverse-mode through the scan otherwise
        # saves the bilinear-gather residuals for EVERY view (measured:
        # ~20 x 108 MB f32/s32 [V, N_vox] buffers at the production
        # 96^3 x 32-view contract — OOMs a 16 GB v5e chip).  Recomputing
        # the projection+gather in the backward pass costs one extra scan
        # forward and is invisible to inference (checkpoint is a no-op
        # without differentiation).
        (vol_sum, vol_sq, counts), _ = jax.lax.scan(
            jax.checkpoint(view_step), init, (feats, projs)
        )

        valid = counts >= 2.0  # minimum_visible_views culling (:330-334)
        if pre_mask is not None:
            # children inherit the pruned parents' occupancy (lod1 path)
            up = jnp.repeat(jnp.repeat(jnp.repeat(pre_mask, 2, 0), 2, 1), 2, 2)
            valid = valid & (up.reshape(-1) > 0)
        inv = (1.0 / (counts + 1e-5))[:, None]
        mean = vol_sum * inv
        var = vol_sq * inv - mean * mean
        cost = jnp.concatenate([var, mean], axis=-1)  # [N, 2C]
        if pre_feats is not None:
            upf = jnp.repeat(jnp.repeat(jnp.repeat(pre_feats, 2, 0), 2, 1), 2, 2)
            cost = jnp.concatenate([cost, upf.reshape(cost.shape[0], -1)], axis=-1)
        cost = cost * valid[:, None].astype(cost.dtype)

        volume = cost.reshape(X, Y, Z, cost.shape[-1])
        mask = valid.reshape(X, Y, Z, 1)
        out = self.costreg(volume, mask, train)  # [X,Y,Z,d_out]
        return {"volume": out, "mask": mask.astype(jnp.float32)}

    def sdf(self, pts: jnp.ndarray, volume: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Evaluate the SDF at normalized points.

        :param pts: [..., 3] in [-1, 1] (the normalized volume spans the
            unit cube exactly: origin -1, extent 95 * 2/95 = 2)
        :param volume: [X, Y, Z, C] conditional volume
        :return: (sdf [..., 1], features [..., hidden])
        """
        latent = trilinear_sample(volume, pts, padding="zeros")
        out = self.sdf_layer(pts, latent)
        return out[..., :1], out[..., 1:]

    def sdf_from_latent(self, pts: jnp.ndarray, latent: jnp.ndarray) -> jnp.ndarray:
        """SDF MLP on pre-fetched latents (used by the separable field-grid
        path where the trilinear fetch is done with interpolation matmuls)."""
        return self.sdf_layer(pts, latent)

    def sdf_and_gradient(
        self, pts: jnp.ndarray, volume: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(sdf, features, d sdf / d pts) — replaces the reference's
        autograd.grad(create_graph=True) (sparse_sdf_network.py:476-499).

        Computed with THREE forward-mode JVPs (one per coordinate) instead
        of reverse-mode: points are independent, so basis-tangent JVPs give
        the per-point spatial gradient exactly, the result stays
        differentiable for the eikonal loss (reverse-over-forward), and —
        critically — no backward-through-gather graph is built, which the
        TPU compiler handled pathologically (fusion-pass crash observed
        with the jax.grad formulation)."""

        def f(p):
            return self.sdf(p, volume)

        (s, feat) = f(pts)
        grads = []
        for ax in range(3):
            tangent = jnp.zeros_like(pts).at[..., ax].set(1.0)
            _, (ds, _) = jax.jvp(f, (pts,), (tangent,))
            grads.append(ds[..., 0])
        return s, feat, jnp.stack(grads, axis=-1)
