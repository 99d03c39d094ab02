"""Service API surface (the demo endpoint contract) on tiny models."""

import numpy as np
import pytest

from tests.test_diffusion import tiny_config
from one2345_tpu.core.config import PipelineConfig, ReconConfig
from one2345_tpu.pipeline.api import One2345Service
from one2345_tpu.pipeline.runner import One2345Pipeline


@pytest.fixture(scope="module")
def service():
    cfg = PipelineConfig(
        diffusion=tiny_config(),
        recon=ReconConfig(mesh_resolution=24),
    )
    return One2345Service(One2345Pipeline(cfg, use_sam=False))


def test_preprocess_endpoint(service):
    rng = np.random.default_rng(0)
    img = np.zeros((100, 120, 4), np.uint8)
    img[30:70, 40:90, :3] = rng.integers(20, 200, (40, 50, 3))
    img[30:70, 40:90, 3] = 255
    out = service.preprocess(img)
    assert out.shape == (32, 32, 3)  # tiny-config image size
    assert out.max() <= 1.0


def test_estimate_elevation_and_mesh(service, tmp_path):
    elev = service.estimate_elevation(seed=0)
    assert -90.0 <= elev <= 90.0
    assert service._session["stage1_all"].shape == (12, 32, 32, 3)

    # per-view retry (demo stage1_run is_rerun semantics)
    before = np.asarray(service._session["stage1_all"][2]).copy()
    new = service.regenerate_view(2, seed=7)
    assert new.shape == (32, 32, 3)
    assert not np.allclose(np.asarray(service._session["stage1_all"][2]), before)

    mesh = service.generate_mesh(out_dir=str(tmp_path), mesh_resolution=24, seed=0)
    assert len(mesh["vertices"]) > 0
    assert (tmp_path / "mesh.ply").exists()
