"""End-to-end geometric-quality gate: train -> reconstruct -> score vs GT.

The one test that separates "the trainer's loss falls" from "the framework
produces correct 3D geometry": render a known colored sphere to the recon
camera rig, train `ReconStage` from scratch on those posed views, run the
production `reconstruct()`, and assert Chamfer/F-score against the ground
truth plus color agreement with the analytic color field.

CI-sized instance of examples/recon_quality.py (the committed TPU-scale
numbers live in docs/recon_quality.md).  Thresholds carry ~2x margin over
the measured CI-config result (TPU, seed 0 — see docs/recon_quality.md's
CI row) so numerics drift fails loudly without flaking on RNG/backend.

Geometry is asserted on the OBSERVABLE region (|p| < 0.8): the rig's
cameras sit at radius ~0.86 in the normalized frame, so the shell beyond
them is unreachable by any training ray and is constrained only by the
SDF prior, which a 300-step schedule hasn't settled (junk_frac tracks it;
the full-scale run carves it clean with NO filtering — f_score_10 0.995).
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # a real (tiny) training run

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_train_reconstruct_quality():
    import recon_quality as rq

    out = rq.run_benchmark(
        steps=300, res=32, vol=16, n_rays=128,
        n_samples=24, n_importance=24,
        mesh_resolution=64, seed=0, log_every=100,
    )
    # training must actually learn the scene, not just stay finite
    # (measured: 13.5 -> 30.2)
    assert out["psnr_last"] > out["psnr_first"] + 10.0, out
    assert out["pred_verts"] > 500, out
    # the GT sphere surface (radius 0.45) must be present and accurate:
    # the 10th-percentile vertex radius sits on it (measured 0.46)
    assert 0.35 < out["pred_radius_p10"] < 0.55, out
    # observable-region geometry: a sphere, not noise — random weights
    # score f_score_10_obs ~0.17 / chamfer_l1_obs ~0.3 here
    assert out["chamfer_l1_obs"] < 0.25, out
    assert out["f_score_10_obs"] > 0.3, out
    # unobservable-shell junk is bounded (measured 0.63 at 300 steps,
    # 0.37 at 600, ~0 at the full-scale 1500)
    assert out["junk_frac"] < 0.85, out
    # the predicted surface must carry the GT texture: best-view projection
    # of the source images onto it matches the analytic color field
    # c = 0.5 + 0.5*p/|p| (measured 0.016; geometry/projection gate)
    assert out.get("color_mae_bestview", 1.0) < 0.1, out
    # production color path (learned blending fed normals) stays bounded —
    # at toy scale it saturates near the 0.25 gray floor (see
    # examples/recon_quality.py for why); with real weights it is tight
    assert out.get("color_mae", 1.0) < 0.35, out
    # novel-view generalization, OBJECT-MASKED and RELATIVE: the trained
    # net's render of a pose outside the training rig must clearly beat the
    # untrained net's render of the same pose on the pixels where the GT
    # object projects.  Full-frame dB is not a stable toy-scale signal —
    # it is backend-dependent (16.1 TPU vs 8.8 CPU, same config/seed;
    # unobservable-shell junk occludes the background from novel poses)
    # and the untrained geometric-init SDF is already a sphere that scores
    # 12.0 full-frame.  The masked object region is ray-covered at any
    # scale, so learning must show up there.
    assert out["psnr_heldout_masked"] > out["psnr_heldout_masked_random"] + 2.0, out
    # and the full-frame render is at least not garbage (white frame = 3.1)
    assert out["psnr_heldout"] > 5.0, out
