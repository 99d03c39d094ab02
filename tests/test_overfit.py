"""Learning-curve tests: both trainers must actually LEARN, not just step.

The reference's contracts are 200k-iteration training runs
(reconstruction/models/trainer_generic.py:158-357 and the Lightning yaml
for Zero123, ddpm.py:1004-1037); finite-metrics tests alone can't tell a
learning trainer from a broken one.  These overfit a tiny fixed problem
for N steps and assert the loss actually falls by a margin.
"""

import jax
import jax.numpy as jnp
import numpy as np

from one2345_tpu.core.config import ReconConfig


def _one_scene(n_rays=16, hw=16, color=(0.8, 0.2, 0.1)):
    """One fixed synthetic scene: 3 cameras on a sphere, all supervised
    rays through the volume center carrying one constant color."""
    from one2345_tpu.geometry.cameras import BLENDER2OPENCV, spherical_look_at_poses

    rng = np.random.default_rng(0)
    V, H, W, N = 3, hw, hw, n_rays
    poses = spherical_look_at_poses(
        np.radians([60.0, 70, 80]), np.radians([0.0, 120, 240]), radius=1.8
    )
    c2ws = poses @ BLENDER2OPENCV
    w2cs = np.linalg.inv(c2ws)
    K = np.array([[hw * 1.1, 0, hw / 2], [0, hw * 1.1, hw / 2], [0, 0, 1.0]])
    affines = np.tile(np.eye(4)[None], (V, 1, 1))
    affines[:, :3, :4] = np.einsum("ij,vjk->vik", K, w2cs[:, :3, :4])

    rays_o = np.tile(c2ws[0, :3, 3][None], (N, 1))
    dirs = -c2ws[0, :3, 3]
    dirs = dirs / np.linalg.norm(dirs)
    rays_v = np.tile(dirs[None], (N, 1)) + rng.normal(0, 0.02, (N, 3))
    rays_v /= np.linalg.norm(rays_v, axis=-1, keepdims=True)

    img = np.tile(np.asarray(color, np.float32), (V, H, W, 1))
    scenes = {
        "images": img,
        "affines": affines[None].astype(np.float32),
        "w2cs": w2cs[None].astype(np.float32),
        "intrinsics": np.tile(K[None, None], (1, V, 1, 1)).astype(np.float32),
        "near_far": np.array([[0.8, 2.8]], np.float32),
        "rays_o": rays_o[None].astype(np.float32),
        "rays_v": rays_v[None].astype(np.float32),
        "rays_color": np.tile(np.asarray(color, np.float32), (1, N, 1)),
        "rays_mask": np.ones((1, N, 1), np.float32),
    }
    scenes["images"] = scenes["images"][None]
    return {k: jnp.asarray(v) for k, v in scenes.items()}


def test_recon_trainer_overfits_one_scene():
    """~60 steps on one constant-color scene: color loss falls by >2x and
    PSNR rises (trainer_generic.py:158-357 train contract).

    n_samples + n_importance must EXCEED 8: the rendering validity rule
    (>8 valid samples/ray, rendering_network.py:124-128) can never pass
    otherwise and every ray's color supervision silently masks to zero —
    which is exactly the failure mode this test exists to catch, hence
    the `first > 0` assertion."""
    from one2345_tpu.recon.pipeline import ReconStage
    from one2345_tpu.training.recon_trainer import ReconTrainer

    cfg = ReconConfig(
        image_hw=(16, 16), vol_dims=(8, 8, 8), voxel_size=2.0 / 7.0,
        n_samples=12, n_importance=12, n_rays=32, anneal_end=10,
        learning_rate=1e-3,
    )
    stage = ReconStage(cfg, seed=0)
    trainer = ReconTrainer(stage, cfg)
    state = trainer.init_state()
    scenes = _one_scene(n_rays=32)

    first = last = None
    psnrs = []
    for i in range(60):
        state, metrics = trainer.train_step(state, scenes, jax.random.key(i))
        c = float(metrics["color_loss"])
        psnrs.append(float(metrics["psnr"]))
        assert np.isfinite(c), i
        if first is None:
            first = c
        last = c
    assert first > 1e-4, "no ray got color supervision — scene/config broken"
    assert last < 0.5 * first, (first, last)
    assert max(psnrs[-10:]) > psnrs[0] + 3.0, (psnrs[0], psnrs[-10:])


def test_zero123_trainer_overfits_fixed_batch():
    """Fixed batch + fixed key: the eps-MSE must fall well below its
    step-0 value (~1.0 for the zero-init output conv; ddpm.py p_losses)."""
    from tests.test_diffusion import tiny_config
    from one2345_tpu.diffusion.zero123 import Zero123Stage
    from one2345_tpu.training.zero123_trainer import Zero123Trainer

    stage = Zero123Stage(tiny_config(), seed=0)
    trainer = Zero123Trainer(stage, base_lr=2e-3)
    state = trainer.init_state()
    frozen = {k: stage.params[k] for k in ("encoder", "clip")}
    rng = np.random.default_rng(3)
    batch = {
        "image_target": jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32),
        "image_cond": jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32),
        "T": jnp.asarray(rng.normal(size=(2, 1, 4)), jnp.float32),
    }
    key = jax.random.key(9)  # SAME key every step -> fixed (t, noise) task

    losses = []
    for _ in range(80):
        state, loss = trainer.train_step(state, frozen, batch, key)
        losses.append(float(loss))
        assert np.isfinite(losses[-1])
    assert losses[0] > 0.5  # zero-init UNet output -> E||eps||^2 ~ 1
    assert min(losses[-10:]) < 0.3 * losses[0], (losses[0], losses[-10:])
