"""Mechanical CI instance of examples/generative_e2e.py.

At CI step counts nothing converges, so this gates the MECHANICS of the
fully generative composition — a trained-in-process tiny Zero123Stage
sampling BOTH cascade hops inside the production ``One2345Pipeline.run``
(stage-2 conditioned on its own stage-1 samples), into a trained
ReconStage, out to a scored world-frame mesh plus an untrained control
through the identical path.  The QUALITY claims live in the TPU-scale run
(docs/generative_e2e.md); the convergence claims for the two stages live
in tests/test_diffusion_quality.py and tests/test_recon_quality.py.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_generative_pipeline_mechanics():
    from examples.generative_e2e import run_benchmark

    out = run_benchmark(
        size=32, batch=4, diff_steps=12, vae_steps=12, recon_steps=12,
        n_rays=64, vol=16, sample_steps=4, mesh_resolution=32,
        model_channels=32, log_every=6, n_samples=16, n_importance=16,
    )
    # both runs completed through the production runner and were scored
    for label in ("e2e", "e2e_untrained"):
        score = out[label]
        assert "stage2_psnr_mean" in score and "pred_verts" in score, out
        assert np.isfinite(score["stage2_psnr_mean"]), out
    # losses stayed finite through both trainers
    assert np.isfinite(out["eps_mse_last"]), out
    # the two-hop pair set covers the runner's conditioning graph
    # (12 stage-1 + 8x4 stage-2 — build_training_set contract)
    from examples.generative_e2e import build_training_set

    images, pairs = build_training_set(75.0, 32)
    assert images.shape[0] == 45 and len(pairs) == 44
    conds = {c for c, *_ in pairs}
    assert conds == {0, *range(1, 9)}, conds  # input view + stage-1 parents
