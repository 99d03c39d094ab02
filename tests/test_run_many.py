"""run_many (overlapped serving throughput mode) — correctness.

Concurrent runs share the jitted stage programs; the test asserts a
run_many batch reproduces a sequential `run` result exactly (same seed),
i.e. overlap changes scheduling, never outputs.  auto_mesh=False keeps
the single-device path (the conftest's 8 virtual devices would otherwise
trigger the sharded both-rings plan, tested elsewhere).
"""

import numpy as np

from tests.test_diffusion import tiny_config
from one2345_tpu.core.config import PipelineConfig, ReconConfig
from one2345_tpu.pipeline.runner import One2345Pipeline


def test_run_many_matches_sequential():
    cfg = PipelineConfig(
        diffusion=tiny_config(),
        recon=ReconConfig(),
        mesh_resolution=32,
    )
    pipe = One2345Pipeline(cfg, use_sam=False, auto_mesh=False)
    rng = np.random.default_rng(0)
    imgs = []
    for i in range(2):
        img = np.full((200, 200, 4), 255, np.uint8)
        img[50:150, 50:150, :3] = rng.uniform(
            30, 220, (100, 100, 3)
        ).astype(np.uint8)
        imgs.append(img)

    seq0 = pipe.run(imgs[0], seed=5, mesh_resolution=32)
    par = pipe.run_many(imgs, seeds=[5, 6], mesh_resolution=32)

    assert seq0.elevation == par[0].elevation
    np.testing.assert_array_equal(seq0.vertices, par[0].vertices)
    np.testing.assert_array_equal(seq0.faces, par[0].faces)
    np.testing.assert_array_equal(
        np.asarray(seq0.colors), np.asarray(par[0].colors)
    )
    # the second (different-seed) request produced a real mesh too
    assert len(par[1].vertices) > 0 and np.isfinite(par[1].vertices).all()
