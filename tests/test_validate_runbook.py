"""No-egress path of the real-weights runbook's fast-mode A/B phase.

The phase must run end-to-end on random weights (protocol/wiring check),
produce the report file with both modes scored against the baseline, and
label the weights as random so nobody mistakes the numbers for quality.
"""

import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # three tiny-pipeline compiles

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def _tiny_config():
    from one2345_tpu.core.config import (
        CLIPVisionConfig, DiffusionConfig, PipelineConfig, ReconConfig,
        UNetConfig, VAEConfig,
    )

    return PipelineConfig(
        diffusion=DiffusionConfig(
            ddim_steps_stage1=3, ddim_steps_stage2=2,
            image_size=32, latent_size=4,
            unet=UNetConfig(model_channels=32, channel_mult=(1, 2),
                            attention_resolutions=(1,), num_heads=4,
                            dtype="float32"),
            vae=VAEConfig(base_channels=16, channel_mult=(1, 2, 2, 2),
                          dtype="float32"),
            clip=CLIPVisionConfig(image_size=28, patch_size=14, width=32,
                                  layers=2, heads=2, dtype="float32"),
        ),
        # tiny conditional volume: the phase runs THREE full pipelines
        # (baseline + 2 fast modes) — at the default 96^3 that is ~25 min
        # on the CPU backend
        recon=ReconConfig(vol_dims=(16, 16, 16), voxel_size=2.0 / 15.0,
                          mesh_resolution=24),
    )


def test_fast_mode_ab_phase_random_weights(tmp_path):
    import validate_real_weights as rb

    from one2345_tpu.eval.clip_metric import ClipScorer
    from one2345_tpu.pipeline.runner import One2345Pipeline

    cfg = _tiny_config()
    pipe = One2345Pipeline(cfg, use_sam=False)
    rng = np.random.default_rng(0)
    pre = np.ones((32, 32, 3), np.float32)
    pre[8:24, 8:24] = rng.uniform(0.2, 0.8, (16, 16, 3)).astype(np.float32)
    baseline = pipe.run(pre, skip_preprocess=True, seed=0)

    scorer = ClipScorer(config=cfg.diffusion.clip)
    ok = rb.phase_fast_mode_ab(
        None, str(tmp_path), pre, baseline,
        make_config=_tiny_config, scorer=scorer,
    )
    assert ok

    with open(tmp_path / "fast_mode_ab.json") as f:
        report = json.load(f)
    assert report["weights"] == "random"
    assert set(report["modes"]) == {"dpmpp", "dpmpp_int8"}
    for mode, row in report["modes"].items():
        assert row["secs"] > 0
        assert -1.0 <= row["clip_sim_stage1_vs_baseline"] <= 1.0
        assert np.isfinite(row["chamfer_l2"]) and np.isfinite(row["f_score"])
        # artifacts written per mode
        assert os.path.isfile(tmp_path / "ab" / mode / "mesh.ply")
