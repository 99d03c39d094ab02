"""Training-step tests: tiny zero123 + recon steps, multichip dry run."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute: trainer + dryrun_multichip compiles


def test_zero123_train_step():
    import jax
    import jax.numpy as jnp

    from tests.test_diffusion import tiny_config
    from one2345_tpu.diffusion.zero123 import Zero123Stage
    from one2345_tpu.training.zero123_trainer import Zero123Trainer

    stage = Zero123Stage(tiny_config(), seed=0)
    trainer = Zero123Trainer(stage)
    state = trainer.init_state()
    frozen = {k: stage.params[k] for k in ("encoder", "clip")}
    batch = {
        "image_target": jnp.zeros((2, 32, 32, 3)),
        "image_cond": jnp.zeros((2, 32, 32, 3)),
        "T": jnp.zeros((2, 1, 4)),
    }
    state2, loss = trainer.train_step(state, frozen, batch, jax.random.key(0))
    assert np.isfinite(float(loss))
    assert int(state2.step) == 1
    # UNet output starts at 0 (zero-init conv) -> loss ~ E||noise||^2 ~ 1
    assert 0.5 < float(loss) < 2.0


def test_remat_gradients_match():
    """nn.remat'd UNet blocks produce the same loss/grads as the plain
    module (memory-only transform; openaimodel checkpoint() parity)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tests.test_diffusion import tiny_config
    from one2345_tpu.diffusion.zero123 import Zero123Stage
    from one2345_tpu.training.zero123_trainer import Zero123Trainer

    stage = Zero123Stage(tiny_config(), seed=0)
    frozen = {k: stage.params[k] for k in ("encoder", "clip")}
    batch = {
        "image_target": jnp.full((2, 32, 32, 3), 0.1),
        "image_cond": jnp.full((2, 32, 32, 3), -0.2),
        "T": jnp.ones((2, 1, 4)) * 0.3,
    }
    key = jax.random.key(5)
    outs = []
    for remat in (False, True):
        tr = Zero123Trainer(stage, remat=remat)
        trainable = {"unet": stage.params["unet"],
                     "cc_projection": stage.params["cc_projection"]}
        loss, grads = jax.value_and_grad(tr.loss_fn)(trainable, frozen, batch, key)
        outs.append((float(loss), grads))
    assert np.isclose(outs[0][0], outs[1][0], rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves(outs[0][1])
    flat1 = jax.tree_util.tree_leaves(outs[1][1])
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_multichip_dryrun():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU backend")
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(len(jax.devices()))


def test_recon_scene_loss_tiny():
    import jax
    import jax.numpy as jnp

    from one2345_tpu.core.config import ReconConfig
    from one2345_tpu.recon.pipeline import ReconStage
    from one2345_tpu.training.recon_trainer import ReconTrainer

    cfg = ReconConfig(
        image_hw=(32, 32),
        vol_dims=(16, 16, 16),
        voxel_size=2.0 / 15.0,
        n_samples=8,
        n_importance=8,
        n_rays=8,
        anneal_end=100,
    )
    stage = ReconStage(cfg, seed=0)
    trainer = ReconTrainer(stage, cfg)
    state = trainer.init_state()

    rng = np.random.default_rng(0)
    V, H, W, N = 3, 32, 32, 8
    # cameras looking at the origin from distance 1.8
    from one2345_tpu.geometry.cameras import BLENDER2OPENCV, spherical_look_at_poses

    poses = spherical_look_at_poses(
        np.radians([60.0, 70, 80]), np.radians([0.0, 120, 240]), radius=1.8
    )
    c2ws = poses @ BLENDER2OPENCV
    w2cs = np.linalg.inv(c2ws)
    K = np.array([[35.0, 0, 16.0], [0, 35.0, 16.0], [0, 0, 1.0]])
    affines = np.tile(np.eye(4)[None], (V, 1, 1))
    affines[:, :3, :4] = np.einsum("ij,vjk->vik", K, w2cs[:, :3, :4])

    rays_o = np.tile(c2ws[0, :3, 3][None], (N, 1))
    dirs = -c2ws[0, :3, 3]
    dirs = dirs / np.linalg.norm(dirs)
    rays_v = np.tile(dirs[None], (N, 1)) + rng.normal(0, 0.01, (N, 3))
    rays_v /= np.linalg.norm(rays_v, axis=-1, keepdims=True)

    scenes = {
        "images": rng.uniform(size=(1, V, H, W, 3)).astype(np.float32),
        "affines": affines[None].astype(np.float32),
        "w2cs": w2cs[None].astype(np.float32),
        "intrinsics": np.tile(K[None, None], (1, V, 1, 1)).astype(np.float32),
        "near_far": np.array([[0.8, 2.8]], np.float32),
        "rays_o": rays_o[None].astype(np.float32),
        "rays_v": rays_v[None].astype(np.float32),
        "rays_color": rng.uniform(size=(1, N, 3)).astype(np.float32),
        "rays_mask": np.ones((1, N, 1), np.float32),
    }
    scenes = {k: jnp.asarray(v) for k, v in scenes.items()}
    # train_step donates the state; snapshot params before stepping
    before = jax.tree_util.tree_map(np.asarray, state.params)
    before_stats = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    state2, metrics = trainer.train_step(state, scenes, jax.random.key(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # params actually moved
    d = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - np.asarray(b)).max()), before, state2.params
    )
    assert max(jax.tree_util.tree_leaves(d)) > 0
    # BN running statistics moved too (train-mode BN, reference
    # featurenet.py:11-37 — InPlaceABN/spnn.BatchNorm train on batch stats)
    for key in ("fusion", "sdf"):
        ds = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(a - np.asarray(b)).max()),
            before_stats[key], state2.batch_stats[key],
        )
        assert max(jax.tree_util.tree_leaves(ds)) > 0, key


def test_recon_sharded_train_step():
    """DataParallel equivalent: scenes sharded over the 8-device mesh."""
    import jax
    import numpy as np

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU backend")

    import jax.numpy as jnp

    from one2345_tpu.core.config import ReconConfig
    from one2345_tpu.core.meshes import create_mesh
    from one2345_tpu.recon.pipeline import ReconStage
    from one2345_tpu.training.recon_trainer import ReconTrainer

    cfg = ReconConfig(
        image_hw=(16, 16), vol_dims=(8, 8, 8), voxel_size=2.0 / 7.0,
        n_samples=4, n_importance=4, n_rays=4, anneal_end=10,
    )
    stage = ReconStage(cfg, seed=0)
    trainer = ReconTrainer(stage, cfg)
    mesh = create_mesh(("data",))
    step_fn, state_sh = trainer.make_sharded_train_step(mesh)

    state = jax.device_put(trainer.init_state(), state_sh)
    n = len(jax.devices())
    rng = np.random.default_rng(0)
    V, H, W, N = 3, 16, 16, 4
    scenes = {
        "images": rng.uniform(size=(n, V, H, W, 3)),
        "affines": np.tile(np.eye(4), (n, V, 1, 1)),
        "w2cs": np.tile(np.eye(4), (n, V, 1, 1)),
        "intrinsics": np.tile(np.eye(3), (n, V, 1, 1)),
        "near_far": np.tile(np.array([0.5, 1.5]), (n, 1)),
        "rays_o": np.tile(np.array([0, 0, 1.2]), (n, N, 1)),
        "rays_v": np.tile(np.array([0, 0, -1.0]), (n, N, 1)),
        "rays_color": rng.uniform(size=(n, N, 3)),
        "rays_mask": np.ones((n, N, 1)),
    }
    from jax.sharding import NamedSharding, PartitionSpec as P

    scenes = {
        k: jax.device_put(jnp.asarray(v, jnp.float32), NamedSharding(mesh, P("data")))
        for k, v in scenes.items()
    }
    state2, metrics = step_fn(state, scenes, jax.random.key(0))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def _tiny_lod1_setup(fix_lod0: bool = False):
    """Tiny two-lod trainer + one synthetic scene (coarse 8^3, fine 16^3)."""
    import jax.numpy as jnp

    from one2345_tpu.core.config import ReconConfig
    from one2345_tpu.geometry.cameras import BLENDER2OPENCV, spherical_look_at_poses
    from one2345_tpu.recon.pipeline import ReconStage
    from one2345_tpu.training.recon_trainer import ReconTrainer

    cfg = ReconConfig(
        image_hw=(32, 32),
        vol_dims=(8, 8, 8),
        voxel_size=2.0 / 7.0,
        num_lods=2,
        lod1_vol_dims=(16, 16, 16),
        lod1_voxel_size=2.0 / 15.0,
        lod1_d_compress=8,
        # random-init SDF has no tight surface shell; a loose threshold
        # keeps the pruned occupancy nonempty on the 8^3 coarse grid
        lod1_prune_threshold=0.5,
        n_samples=8,
        n_importance=8,
        n_rays=8,
        anneal_end=100,
        anneal_end_lod1=50,
        fix_lod0_networks=fix_lod0,
    )
    stage = ReconStage(cfg, seed=0)
    trainer = ReconTrainer(stage, cfg)
    state = trainer.init_state()

    rng = np.random.default_rng(0)
    V, H, W, N = 3, 32, 32, 8
    poses = spherical_look_at_poses(
        np.radians([60.0, 70, 80]), np.radians([0.0, 120, 240]), radius=1.8
    )
    c2ws = poses @ BLENDER2OPENCV
    w2cs = np.linalg.inv(c2ws)
    K = np.array([[35.0, 0, 16.0], [0, 35.0, 16.0], [0, 0, 1.0]])
    affines = np.tile(np.eye(4)[None], (V, 1, 1))
    affines[:, :3, :4] = np.einsum("ij,vjk->vik", K, w2cs[:, :3, :4])

    rays_o = np.tile(c2ws[0, :3, 3][None], (N, 1))
    dirs = -c2ws[0, :3, 3]
    dirs = dirs / np.linalg.norm(dirs)
    rays_v = np.tile(dirs[None], (N, 1)) + rng.normal(0, 0.01, (N, 3))
    rays_v /= np.linalg.norm(rays_v, axis=-1, keepdims=True)

    scenes = {
        "images": rng.uniform(size=(1, V, H, W, 3)).astype(np.float32),
        "affines": affines[None].astype(np.float32),
        "w2cs": w2cs[None].astype(np.float32),
        "intrinsics": np.tile(K[None, None], (1, V, 1, 1)).astype(np.float32),
        "near_far": np.array([[0.8, 2.8]], np.float32),
        "rays_o": rays_o[None].astype(np.float32),
        "rays_v": rays_v[None].astype(np.float32),
        "rays_color": rng.uniform(size=(1, N, 3)).astype(np.float32),
        "rays_mask": np.ones((1, N, 1), np.float32),
    }
    scenes = {k: jnp.asarray(v) for k, v in scenes.items()}
    return trainer, state, scenes


def test_recon_lod1_train_step():
    """Two-lod training (trainer_generic.py train_step:269-319): the lod1
    branch prunes the coarse occupancy, builds the fine volume on the
    SEPARATE lod1 networks, and its loss trains their parameters."""
    import jax

    trainer, state, scenes = _tiny_lod1_setup()
    for k in ("sdf_lod1", "fusion_lod1", "render_lod1", "variance_lod1"):
        assert k in state.params, k

    before = jax.tree_util.tree_map(np.asarray, state.params)
    before_stats = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    state2, metrics = trainer.train_step(state, scenes, jax.random.key(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # both lod losses are reported and the total is their sum
    for k in ("color_loss", "color_loss_lod1", "psnr_lod1", "eikonal_lod1"):
        assert k in metrics, k
    # every lod1 network moved
    for k in ("sdf_lod1", "fusion_lod1", "render_lod1", "variance_lod1"):
        d = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(a - np.asarray(b)).max()),
            before[k], state2.params[k],
        )
        assert max(jax.tree_util.tree_leaves(d)) > 0, k
    # lod1 BN running stats moved (separate fusion/costreg nets)
    for k in ("sdf_lod1", "fusion_lod1"):
        ds = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(a - np.asarray(b)).max()),
            before_stats[k], state2.batch_stats[k],
        )
        assert max(jax.tree_util.tree_leaves(ds)) > 0, k


def test_recon_lod1_fix_lod0():
    """fix_lod0_networks freezes the coarse lod (trainer_generic.py:191-215):
    lod0 parameters stay bit-identical while lod1 still trains, and no lod0
    loss is reported."""
    import jax

    trainer, state, scenes = _tiny_lod1_setup(fix_lod0=True)
    before = jax.tree_util.tree_map(np.asarray, state.params)
    state2, metrics = trainer.train_step(state, scenes, jax.random.key(1))
    assert "color_loss" not in metrics  # lod0 loss skipped
    assert "color_loss_lod1" in metrics
    for k in ("fusion", "sdf", "render", "variance"):
        d = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(a - np.asarray(b)).max()),
            before[k], state2.params[k],
        )
        assert max(jax.tree_util.tree_leaves(d)) == 0, k
    d = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - np.asarray(b)).max()),
        before["sdf_lod1"], state2.params["sdf_lod1"],
    )
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_alpha_inter_ratio_collapsed_window():
    """anneal_start == anneal_end (the reference's lod1 quirk) must be a
    step function, not (step - start) / 0 = NaN at step == start."""
    from one2345_tpu.core.config import ReconConfig
    from one2345_tpu.training.recon_trainer import ReconTrainer

    tr = ReconTrainer(None, config=ReconConfig(anneal_start=25000, anneal_end=25000))
    for step, want in ((0, 0.0), (24999, 0.0), (25000, 1.0), (30000, 1.0)):
        v = float(tr.alpha_inter_ratio(step))
        assert np.isfinite(v) and v == want, (step, v)
    # the ordinary ramp is unchanged
    tr2 = ReconTrainer(None, config=ReconConfig(anneal_start=100, anneal_end=200))
    assert float(tr2.alpha_inter_ratio(150)) == 0.5
    assert float(tr2.alpha_inter_ratio(0)) == 0.0
    # end == 0 disables annealing entirely (train runner :412-418)
    tr3 = ReconTrainer(None, config=ReconConfig(anneal_start=0, anneal_end=0))
    assert float(tr3.alpha_inter_ratio(0)) == 1.0
