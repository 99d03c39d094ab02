"""Unit tests for the reconstruction networks (shapes, masking, init)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from one2345_tpu.recon.costreg import CostRegNet, _mask_down, _upsample2x_zero
from one2345_tpu.recon.featurenet import PyramidFeatureFusion
from one2345_tpu.recon.rendering_network import GeneralRenderingNetwork
from one2345_tpu.recon.sdf_network import LatentSDFLayer, SingleVarianceNetwork


def test_feature_fusion_shapes():
    mod = PyramidFeatureFusion()
    imgs = jnp.zeros((2, 64, 64, 3))
    vars_ = jax.jit(mod.init)(jax.random.key(0), imgs)
    out = jax.jit(mod.apply)(vars_, imgs)
    assert out.shape == (2, 64, 64, 56)


def test_mask_helpers():
    m = jnp.zeros((4, 4, 4, 1)).at[0, 0, 0, 0].set(1.0)
    md = _mask_down(m)
    assert md.shape == (2, 2, 2, 1)
    assert md[0, 0, 0, 0] == 1.0 and md.sum() == 1.0
    x = jnp.arange(8.0).reshape(2, 2, 2, 1)
    up = _upsample2x_zero(x)
    assert up.shape == (4, 4, 4, 1)
    assert up[0, 0, 0, 0] == 0.0 and up[2, 2, 2, 0] == 7.0
    assert up[1, 0, 0, 0] == 0.0


def test_costreg_masked_outputs():
    mod = CostRegNet(d_out=8)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(16, 16, 16, 4)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(16, 16, 16, 1)) > 0.5).astype(np.float32))
    vars_ = jax.jit(mod.init)(jax.random.key(0), vol, mask)
    apply = jax.jit(mod.apply)
    out = apply(vars_, vol, mask)
    assert out.shape == (16, 16, 16, 8)
    # inactive voxels are exactly zero
    assert np.abs(np.asarray(out) * (1 - np.asarray(mask))).max() == 0.0
    # changing features at inactive voxels does not change the output
    vol2 = vol + 100.0 * (1 - mask)
    out2 = apply(vars_, vol2, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-4)


def test_latent_sdf_geometric_init():
    """With geometric init the initial SDF approximates |x| - bias (sphere)."""
    mod = LatentSDFLayer()
    pts = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, size=(256, 3)).astype(np.float32)
    )
    latent = jnp.zeros((256, 16))
    vars_ = jax.jit(mod.init)(jax.random.key(0), pts, latent)
    out = jax.jit(mod.apply)(vars_, pts, latent)
    # last layer is d_hidden wide (reference dims_out never reaches its
    # d_out=hidden+1 entry with n_layers=4; ch 0 = sdf, 1: = features)
    assert out.shape == (256, 128)
    sdf = np.asarray(out[:, 0])
    r = np.asarray(jnp.linalg.norm(pts, axis=-1))
    # the IDR init yields approx c*(|x| - 0.5): check sign agreement away from 0.5
    far = np.abs(r - 0.5) > 0.15
    agree = np.sign(sdf[far]) == np.sign(r[far] - 0.5)
    assert agree.mean() > 0.95
    # latent code columns are zero-initialized: latent has no initial effect
    out2 = jax.jit(mod.apply)(vars_, pts, jnp.ones_like(latent))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_variance_network():
    mod = SingleVarianceNetwork(init_val=0.2)
    vars_ = mod.init(jax.random.key(0))
    inv_var = mod.apply(vars_)
    np.testing.assert_allclose(float(inv_var), np.exp(2.0), rtol=1e-5)


def test_rendering_network_blend():
    mod = GeneralRenderingNetwork(in_geometry_feat_ch=16, in_rendering_feat_ch=56)
    # >8 valid samples per ray required for ray validity (rendering_network.py:124-128)
    V, Nr, Ns = 3, 4, 12
    rng = np.random.default_rng(2)
    geo = jnp.asarray(rng.normal(size=(Nr, Ns, 16)).astype(np.float32))
    rgb = jnp.asarray(rng.uniform(size=(V, Nr, Ns, 59)).astype(np.float32))
    rd = jnp.asarray(rng.normal(size=(V, Nr, Ns, 4)).astype(np.float32))
    mask = jnp.ones((V, Nr, Ns))
    vars_ = jax.jit(mod.init)(jax.random.key(0), geo, rgb, rd, mask)
    apply = jax.jit(mod.apply)
    out, valid = apply(vars_, geo, rgb, rd, mask)
    assert out.shape == (Nr, Ns, 3)
    # blended color is a convex combination of per-view input colors
    cmin = np.asarray(rgb[..., :3]).min(axis=0)
    cmax = np.asarray(rgb[..., :3]).max(axis=0)
    o = np.asarray(out)
    assert (o >= cmin - 1e-4).all() and (o <= cmax + 1e-4).all()
    assert np.asarray(valid).all()
    # fully-masked rays are invalid
    _, valid0 = apply(vars_, geo, rgb, rd, jnp.zeros((V, Nr, Ns)))
    assert not np.asarray(valid0).any()


def test_sdf_volume_mixed_precision_fidelity():
    """bf16 feature path (compress + costreg) with the f32 SDF MLP tracks
    the all-f32 stage: same params, near-identical sdf field.  Guards the
    production ReconConfig(dtype='bfloat16') setting."""
    from one2345_tpu.recon.sdf_network import SdfVolumeNetwork

    kw = dict(vol_dims=(16, 16, 16), voxel_size=2.0 / 15.0, d_compress=8,
              regnet_d_out=8, hidden_dim=32)
    net32 = SdfVolumeNetwork(dtype=jnp.float32, **kw)
    net16 = SdfVolumeNetwork(dtype=jnp.bfloat16, **kw)

    rng = np.random.default_rng(0)
    V, H, W = 3, 32, 32
    feats = jnp.asarray(rng.normal(size=(V, H, W, 56)).astype(np.float32))
    # cameras looking at the volume center from ~2 units out
    projs = []
    for i in range(V):
        K = np.array([[20.0, 0, W / 2, 0], [0, 20.0, H / 2, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]])
        w2c = np.eye(4)
        w2c[2, 3] = 2.5 + 0.1 * i
        projs.append(K @ w2c)
    projs = jnp.asarray(np.stack(projs).astype(np.float32))

    vars_ = jax.jit(net32.init, static_argnums=3)(jax.random.key(0), feats, projs, (H, W))
    pts = jnp.asarray(rng.uniform(-0.8, 0.8, size=(128, 3)).astype(np.float32))

    def field(net):
        out = jax.jit(
            lambda v, f, p: net.apply(v, f, p, (H, W), method=SdfVolumeNetwork.build_volume)
        )(vars_, feats, projs)
        sdf, _ = jax.jit(lambda v, q, vol: net.apply(v, q, vol, method=SdfVolumeNetwork.sdf))(
            vars_, pts, out["volume"].astype(jnp.float32)
        )
        return np.asarray(out["volume"], np.float32), np.asarray(sdf[:, 0])

    vol32, sdf32 = field(net32)
    vol16, sdf16 = field(net16)
    # latent volume: bf16 noise well below the feature scale
    scale = np.abs(vol32).mean() + 1e-6
    assert np.abs(vol32 - vol16).mean() / scale < 0.05
    # sdf evaluated by the (always f32) MLP on the two volumes stays close
    # relative to its dynamic range
    rng_sdf = sdf32.max() - sdf32.min() + 1e-6
    assert np.abs(sdf32 - sdf16).max() / rng_sdf < 0.05
