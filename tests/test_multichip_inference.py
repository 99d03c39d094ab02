"""View-batch sharding of the diffusion sampler over a virtual 8-chip mesh."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute: 8-device sharded sampling compiles


def test_sharded_sampler_matches_single_device():
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU backend")

    from tests.test_diffusion import tiny_config
    from one2345_tpu.core.meshes import create_mesh
    from one2345_tpu.diffusion.zero123 import Zero123Stage

    cfg = tiny_config()
    stage = Zero123Stage(cfg, seed=0)
    img = np.random.default_rng(0).uniform(size=(32, 32, 3)).astype(np.float32)
    ref = np.asarray(stage.stage1(img, jax.random.key(1), indices=list(range(8)), steps=2))

    mesh = create_mesh(("data",))
    stage_sh = Zero123Stage(cfg, params=stage.params, mesh=mesh)
    out = stage_sh.stage1(img, jax.random.key(1), indices=list(range(8)), steps=2)
    # every shard holds a slice of the view batch
    assert len(out.sharding.device_set) == len(jax.devices())
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4)


def test_sharded_sampler_pads_uneven_batches():
    """B=4 views on an 8-chip mesh: the batch pads to 8, shards, and the
    pad rows are sliced off (the runner's stage-1 half-ring batches)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU backend")

    from tests.test_diffusion import tiny_config
    from one2345_tpu.core.meshes import create_mesh
    from one2345_tpu.diffusion.zero123 import Zero123Stage

    cfg = tiny_config()
    stage = Zero123Stage(cfg, seed=0)
    img = np.random.default_rng(0).uniform(size=(32, 32, 3)).astype(np.float32)
    idx = [0, 1, 2, 3]
    ref = np.asarray(stage.stage1(img, jax.random.key(1), indices=idx, steps=2))

    mesh = create_mesh(("data",))
    stage_sh = Zero123Stage(cfg, params=stage.params, mesh=mesh)
    out = np.asarray(stage_sh.stage1(img, jax.random.key(1), indices=idx, steps=2))
    assert out.shape == ref.shape  # pad rows removed


def test_sharded_sampler_dpmpp_matches_single_device():
    """The fast-mode sampler goes through the same mesh pad/shard path."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU backend")

    from tests.test_diffusion import tiny_config
    from one2345_tpu.core.meshes import create_mesh
    from one2345_tpu.diffusion.zero123 import Zero123Stage

    cfg = tiny_config().replace(sampler="dpmpp")
    stage = Zero123Stage(cfg, seed=0)
    img = np.random.default_rng(0).uniform(size=(32, 32, 3)).astype(np.float32)
    idx = [0, 1, 2, 3]  # uneven on the 8-mesh -> exercises padding too
    ref = np.asarray(stage.stage1(img, jax.random.key(1), indices=idx, steps=3))

    mesh = create_mesh(("data",))
    stage_sh = Zero123Stage(cfg, params=stage.params, mesh=mesh)
    out = np.asarray(stage_sh.stage1(img, jax.random.key(1), indices=idx, steps=3))
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_select_stage1b_plan():
    """On an 8-chip mesh the 4-view second ring pads to 8 anyway — the plan
    samples BOTH rings (views 4..11) for the same cost and slices the
    needed one; small/single meshes sample only the needed ring."""
    from one2345_tpu.pipeline.runner import select_stage1b_plan

    # single chip / even-dividing meshes: just the needed ring
    for n in (1, 2, 4):
        sample, ring, second = select_stage1b_plan(30.0, n)
        assert sample == [4, 5, 6, 7] and sample[ring] == second
        sample, ring, second = select_stage1b_plan(80.0, n)
        assert sample == [8, 9, 10, 11] and sample[ring] == second

    # 8-chip mesh: both rings in one batch, slice low or high
    sample, ring, second = select_stage1b_plan(30.0, 8)
    assert sample == list(range(4, 12))
    assert sample[ring] == [4, 5, 6, 7] == second
    sample, ring, second = select_stage1b_plan(80.0, 8)
    assert sample == list(range(4, 12))
    assert sample[ring] == [8, 9, 10, 11] == second
