"""SAM stage smoke tests on a tiny config (CPU)."""

import numpy as np

from one2345_tpu.core.config import SamConfig
from one2345_tpu.segmentation.sam import SamStage


def _tiny_cfg():
    return SamConfig(
        image_size=64, patch_size=16, encoder_dim=32, encoder_depth=2,
        encoder_heads=2, global_attn_indexes=(1,), window_size=2,
        prompt_embed_dim=32, dtype="float32",
    )


def test_sam_segment_bbox_shapes():
    stage = SamStage(_tiny_cfg(), seed=0)
    img = np.random.default_rng(0).integers(0, 255, (48, 60, 3), np.uint8)
    mask = stage.segment_bbox(img, (10, 10, 50, 40))
    assert mask.shape == (48, 60)
    assert mask.dtype == bool


def test_sam_cached_predict_matches_direct():
    stage = SamStage(_tiny_cfg(), seed=0)
    img = np.random.default_rng(1).integers(0, 255, (40, 40, 3), np.uint8)
    cache = stage.set_image(img)
    m1 = stage.predict_box(cache, (5, 5, 35, 35))
    m2 = stage.segment_bbox(img, (5, 5, 35, 35))
    np.testing.assert_array_equal(m1, m2)
    # second prompt against the same cache (no re-encode)
    m3 = stage.predict_box(cache, (0, 0, 20, 20))
    assert m3.shape == (40, 40)
