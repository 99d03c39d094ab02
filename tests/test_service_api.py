"""Service API surface (the demo endpoint contract) on tiny models."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute: full service pipeline on CPU

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

    # multi-view retry + regenerate-mesh chaining (app.py:276-322,622-626)
    before = np.asarray(service._session["stage1_all"][[1, 3]]).copy()
    new = service.regenerate_views([1, 3], seed=11)
    assert new.shape[0] == 2
    assert not np.allclose(np.asarray(service._session["stage1_all"][[1, 3]]), before)
    mesh2 = service.regenerate_mesh(mesh_resolution=24, seed=1)
    assert len(mesh2["vertices"]) > 0


def test_high_elevation_branch(service, tmp_path):
    """polar > 75 selects stage-1 views [0..3, 8..11] (run.py:41-54)."""
    if "stage1_all" not in service._session:
        service.estimate_elevation(seed=0)
    service._session["polar"] = 80.0
    mesh = service.generate_mesh(out_dir=str(tmp_path / "hi"), mesh_resolution=24, seed=2)
    assert len(mesh["vertices"]) > 0


def test_run_high_elevation_branch(service, tmp_path, monkeypatch):
    """Full runner path through the polar>75 branch: second-ring indices
    8..11 are sampled/exported and the jit shapes match the low branch."""
    pipe = service.pipeline
    monkeypatch.setattr(pipe, "estimate_elevation", lambda views: 80.0)
    rng = np.random.default_rng(5)
    rgba = np.zeros((64, 64, 4), np.uint8)
    rgba[16:48, 16:48, :3] = rng.integers(30, 220, (32, 32, 3), dtype=np.uint8)
    rgba[16:48, 16:48, 3] = 255
    out_dir = str(tmp_path / "run_hi")
    result = pipe.run(rgba, out_dir=out_dir, mesh_resolution=24, seed=3)
    assert result.elevation == 10.0  # 90 - polar
    import os

    # the exported stage-1 set is the high ring (ids 8..11), not 4..7
    assert os.path.exists(os.path.join(out_dir, "stage1_8", "8.png"))
    assert not os.path.exists(os.path.join(out_dir, "stage1_8", "4.png"))
    assert len(result.vertices) > 0


def test_safety_gate(service):
    """NSFW gate wiring (demo/app.py:376-391): flagged input returns the
    placeholder and sets the unsafe flag; clean checker passes through."""
    from one2345_tpu.segmentation.safety import SafetyChecker

    pipe = service.pipeline
    rng = np.random.default_rng(7)
    img = np.zeros((80, 80, 4), np.uint8)
    img[20:60, 20:60, :3] = rng.integers(20, 230, (40, 40, 3), dtype=np.uint8)
    img[20:60, 20:60, 3] = 255

    # always-flagging checker: negative thresholds < any cosine similarity
    pipe._safety = SafetyChecker(
        concept_embeds=rng.normal(size=(2, 768)).astype(np.float32),
        concept_thresholds=np.full(2, -1.0, np.float32),
    )
    size = pipe.config.diffusion.image_size
    out = service.preprocess(img)
    assert service.last_input_unsafe
    assert out.shape == (size, size, 3)
    assert np.allclose(out, 0.5)  # placeholder, not the real preprocess

    # no-weights checker -> gate is a no-op
    pipe._safety = SafetyChecker()
    out2 = service.preprocess(img)
    assert not service.last_input_unsafe
    assert not np.allclose(out2, 0.5)


def test_init_bbox(service):
    img = np.full((100, 120, 3), 255, np.uint8)
    img[30:70, 40:90] = 40  # dark square on white
    out = service.init_bbox(img)
    x0, y0, x1, y1 = out["bbox"]
    assert 30 <= x0 <= 45 and 25 <= y0 <= 35
    assert 85 <= x1 <= 95 and 65 <= y1 <= 75
    assert out["preview"].shape == img.shape


def test_camera_visualization(service):
    viz = service.camera_visualization(polar=60.0)
    assert viz["input_cone"].shape == (16, 3)
    assert viz["view_cones"].shape == (8, 16, 3)
    # cones sit on the camera sphere, not at the origin
    assert np.linalg.norm(viz["view_cones"][:, 0, :], axis=-1).min() > 0.3
