"""CI gate: the diffusion stage learns view-conditioned generation.

Reduced-config instance of examples/diffusion_quality.py (see
docs/diffusion_quality.md for the TPU-scale protocol + numbers): train a
tiny zero123 through the production Zero123Trainer on rasterized rig
views, sample HELD-OUT pose tokens through the production DDIM+CFG scan,
and gate on (a) the trained model beating the untrained baseline and
(b) cross-pose discrimination — generated content must move with the
pose token.

Thresholds are calibrated IN THIS pytest environment (8 virtual CPU
devices — CLAUDE.md: trained-metric gates must be measured under the
exact test backend, not a 1-device probe).  Calibration run (seed 0,
round 5, /tmp/diffq_ci_calib.json): vae_psnr 28.03, eps_mse 1.032→0.039,
psnr_heldout 13.92 dB vs untrained 7.57 dB (margin +6.35 dB),
pose_hits 3/6, pose_margin +3.06 dB.  Gates sit at ~half the measured
margins so reduction-order noise cannot flip them; pose_hits is gated
loosely (>=2) with the continuous pose_margin carrying the
discrimination requirement — at this reduced scale individual hits can
flip while the margin stays clearly positive (the TPU-scale run in
docs/diffusion_quality.md hits 6/6 at +6.74 dB).
"""

import pytest

pytestmark = pytest.mark.slow


def test_diffusion_learns_view_conditioning():
    from examples.diffusion_quality import run_benchmark

    out = run_benchmark(
        steps=1200, res=32, batch=8, vae_steps=600, sample_steps=8,
        n_azim=6, model_channels=32, log_every=300, seed=0,
    )
    # the first stage must be healthy enough to carry the signal
    assert out["vae_psnr"] > 24.0, out  # measured 28.03
    # training must have converged (eps-MSE falls by >5x; measured 26x)
    assert out["eps_mse_last"] < out["eps_mse_first"] / 5.0, out
    # trained beats untrained on held-out poses (measured +6.35 dB)
    margin = out["psnr_heldout"] - out["psnr_heldout_untrained"]
    assert margin > 3.0, out
    # pose discrimination: content must move with the pose token.
    # Continuous margin is the primary gate (measured +3.06 dB); the
    # discrete hit count is gated loosely (measured 3/6 at this scale).
    assert out["pose_margin_db"] > 1.5, out
    assert out["pose_hits"] >= 2, out
