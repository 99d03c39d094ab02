"""Inter-stage contract test: oracle diffusion through the production runner.

CI instance of examples/pipeline_wiring.py tier A (VERDICT r4 #2): the
production `One2345Pipeline.run` path with the diffusion stage replaced by
an oracle that rasterizes a known GT box at EXACTLY the world poses the
zero123 delta tables claim each view has (zero123_utils.py:109-120,175-176).
The 32 images the runner hands `reconstruct()` must be pixel-identical to
rasters at `build_recon_cameras`' pack poses — which catches any azimuth
sign flip, view-order swap, or normalization mismatch between the delta
tables and the recon rig (utils/utils.py:130-145 ↔
One2345_eval_new_data.py:193-230), the class of bug no weight-level test
can see.  A flipped-azimuth negative control must collapse.

TPU-scale numbers (256², bit-identical / 12 dB flipped): docs/
pipeline_wiring.md.
"""

from examples.pipeline_wiring import wiring_check

# 86 s measured in the pytest env — lives in the fast suite on purpose:
# this is the only test that can catch an inter-stage contract regression


def test_oracle_wiring_exact_and_flipped_control():
    res = wiring_check(polar=75.0, size=96)
    # correct wiring: the oracle render and the pack render are the SAME
    # picture for every one of the 32 source rows and the query view
    assert res["psnr_min"] > 40.0, res
    assert res["psnr_query"] > 40.0, res

    flipped = wiring_check(polar=75.0, size=96, flip_azimuth=True)
    # the classic contract bug must be loudly visible (the dy=0 deltas are
    # sign-invariant, so the MIN over views is the discriminator)
    assert flipped["psnr_min"] < 25.0, flipped
    # and the sign flip must not somehow pass the exactness gate
    assert flipped["psnr_min"] < res["psnr_min"]


def test_oracle_wiring_high_elevation_branch():
    """polar > 75 selects the other stage-1 candidate set
    (run.py:40-44 / runner.py:397) — the ordering contract must hold on
    that branch too."""
    res = wiring_check(polar=105.0, size=96)
    assert res["psnr_min"] > 40.0, res
