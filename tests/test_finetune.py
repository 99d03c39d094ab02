"""Per-shape finetune path: patch warping geometry + one train step."""

import jax
import jax.numpy as jnp
import numpy as np

from one2345_tpu.core.config import ReconConfig
from one2345_tpu.recon.finetune import (
    BlendingRenderingNetwork,
    FinetuneTrainer,
    build_patch_offsets,
    patch_warp,
    pixel_warp,
)
from one2345_tpu.recon.pipeline import ReconStage


def test_patch_offsets():
    off = build_patch_offsets(3)
    assert off.shape == (49, 2)
    assert (off[24] == [0, 0]).all()


def _lookat(pos, target=np.zeros(3)):
    z = target - pos
    z = z / np.linalg.norm(z)
    x = np.cross([0, 0, 1.0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, :3] = np.stack([x, y, z], axis=-1)
    c2w[:3, 3] = pos
    return c2w


def test_patch_warp_plane_consistency():
    """Points on a fronto-parallel textured plane: warped patches must pick
    up the same texture as direct projection."""
    H = W = 64
    K = np.array([[80.0, 0, 32], [0, 80.0, 32], [0, 0, 1]], np.float32)
    # slightly off the z axis: _lookat degenerates when viewing || up
    ref_c2w = _lookat(np.array([0.1, 0.05, 2.0]))
    src_c2w = _lookat(np.array([0.6, 0, 1.9]))
    rng = np.random.default_rng(0)
    tex = rng.uniform(size=(H, W, 3)).astype(np.float32)

    # plane z=0, normal +z; sample points near center
    pts = np.stack(
        [rng.uniform(-0.2, 0.2, 8), rng.uniform(-0.2, 0.2, 8), np.zeros(8)], -1
    ).astype(np.float32)
    normals = np.tile(np.array([[0, 0, 1.0]], np.float32), (8, 1))
    # ref-view pixel coords of the points
    w2c = np.linalg.inv(ref_c2w)
    pc = pts @ w2c[:3, :3].T + w2c[:3, 3]
    uv = (pc @ K.T)[:, :2] / (pc @ K.T)[:, 2:]

    colors, mask = patch_warp(
        jnp.asarray(pts), jnp.asarray(uv.astype(np.float32)), jnp.asarray(normals),
        jnp.asarray(tex[None]), jnp.asarray(K), jnp.asarray(K[None]),
        jnp.asarray(ref_c2w.astype(np.float32)),
        jnp.asarray(src_c2w.astype(np.float32)[None]), h_patch_size=1,
    )
    assert colors.shape == (8, 1, 9, 3)
    assert np.asarray(mask).mean() > 0.8

    # center of patch == direct projection of the 3D point into src view
    w2c_s = np.linalg.inv(src_c2w)
    pcs = pts @ w2c_s[:3, :3].T + w2c_s[:3, 3]
    uv_s = (pcs @ K.T)[:, :2] / (pcs @ K.T)[:, 2:]
    from one2345_tpu.geometry.sampling import bilinear_sample

    direct = np.asarray(
        bilinear_sample(jnp.asarray(tex), jnp.asarray(uv_s[:, 0]), jnp.asarray(uv_s[:, 1]))
    )
    center = np.asarray(colors[:, 0, 4])
    valid = np.asarray(mask[:, 0, 4])
    np.testing.assert_allclose(center[valid], direct[valid], atol=2e-2)


def test_blending_network_convexity():
    net = BlendingRenderingNetwork(d_feature=16, d_hidden=32, d_out=8)
    rng = np.random.default_rng(1)
    N, V = 6, 3
    args = (
        jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32)),
        jnp.asarray(rng.uniform(size=(N, V, 3)).astype(np.float32)),
        jnp.ones((N, V)),
    )
    params = net.init(jax.random.key(0), *args)
    color, ok, _, _ = net.apply(params, *args)
    pix = np.asarray(args[4])
    c = np.asarray(color)
    assert (c >= pix.min(1) - 1e-5).all() and (c <= pix.max(1) + 1e-5).all()
    assert np.asarray(ok).all()


def test_finetune_steps_decrease_loss():
    """N steps on one fixed scene must DECREASE the loss (the octree
    finetune contract, sparse_sdf_network.py:548-781) — not merely keep
    it finite."""
    cfg = ReconConfig(
        image_hw=(32, 32), vol_dims=(16, 16, 16), voxel_size=2.0 / 15.0,
        n_samples=8, n_importance=8,
    )
    stage = ReconStage(cfg, seed=0)
    trainer = FinetuneTrainer(stage, lr=2e-3)
    rng = np.random.default_rng(2)
    vol = jnp.asarray(rng.normal(size=(16, 16, 16, 16)).astype(np.float32) * 0.01)
    mask = jnp.ones((16, 16, 16, 1))
    state = trainer.init_state(vol, mask, jax.random.key(0))

    V, H, W, N = 2, 32, 32, 8
    c2ws = np.stack([_lookat(np.array([0.1, 0.05, 1.8])), _lookat(np.array([1.8, 0, 0.2]))])
    K = np.array([[35.0, 0, 16], [0, 35.0, 16], [0, 0, 1]], np.float32)
    scene = {
        "rays_o": jnp.asarray(np.tile(c2ws[0, :3, 3], (N, 1)).astype(np.float32)),
        "rays_v": jnp.asarray(
            (-c2ws[0, :3, 3] / np.linalg.norm(c2ws[0, :3, 3]) + rng.normal(0, 0.01, (N, 3))).astype(np.float32)
        ),
        # target colors CONSISTENT with the source images (one constant):
        # the blend net outputs convex combinations of warped pixel colors,
        # so random per-ray targets would leave an unfittable floor and
        # mask whether optimization works at all
        "rays_color": jnp.tile(jnp.asarray([0.6, 0.3, 0.2]), (N, 1)),
        "near_far": jnp.asarray([0.8, 2.8], jnp.float32),
        "images": jnp.tile(jnp.asarray([0.6, 0.3, 0.2]), (V, H, W, 1)),
        "w2cs": jnp.asarray(np.linalg.inv(c2ws).astype(np.float32)),
        "intrinsics": jnp.asarray(np.tile(K[None], (V, 1, 1))),
    }
    losses = []
    for i in range(30):
        state, metrics = trainer.train_step(state, mask, scene, jax.random.key(1))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (i, k)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 30
    assert min(losses[-5:]) < 0.7 * losses[0], (losses[0], losses[-5:])
