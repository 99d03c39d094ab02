"""Foreground bbox estimation on white, dark, and textured backgrounds.

The reference seeds SAM's box prompt with a rembg/u2net mask
(utils/utils.py:10-19).  Our replacement is SAM's own frame-wide-box
prediction (SamStage.seed_bbox) with a classical color-saliency fallback
(estimate_bbox) — the fallback must not assume a white background."""

import numpy as np
import pytest

from one2345_tpu.utils.image import bbox_from_mask, estimate_bbox


def _scene(bg, obj_color, noise=0.0, seed=0):
    """256x256 scene with a 80x100 object at (60, 90)."""
    rng = np.random.default_rng(seed)
    img = np.tile(np.asarray(bg, np.float32), (256, 256, 1))
    if noise:
        img += rng.normal(0, noise, img.shape)
    img[90:190, 60:140] = np.asarray(obj_color, np.float32)
    if noise:
        img[90:190, 60:140] += rng.normal(0, noise, (100, 80, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def _check_box(box, x0=60, y0=90, x1=139, y1=189, tol=12):
    bx0, by0, bx1, by1 = box
    assert abs(bx0 - x0) <= tol and abs(by0 - y0) <= tol, box
    assert abs(bx1 - x1) <= tol and abs(by1 - y1) <= tol, box


def test_estimate_bbox_white_background():
    _check_box(estimate_bbox(_scene((255, 255, 255), (90, 60, 40))))


def test_estimate_bbox_dark_background():
    """The old gray-threshold heuristic assumed a LIGHT background; a dark
    one must work too."""
    _check_box(estimate_bbox(_scene((20, 22, 25), (200, 180, 90))))


def test_estimate_bbox_colored_background_same_luma():
    """Object and background with near-equal grayscale luma but different
    hue — invisible to a gray-contrast threshold, clear in color space."""
    # luma(76,150,29 weights): blue-ish bg vs red-ish object, both ~115
    _check_box(estimate_bbox(_scene((60, 110, 220), (220, 90, 60))))


def test_estimate_bbox_textured_background():
    _check_box(estimate_bbox(_scene((140, 140, 140), (30, 90, 200), noise=10)))


def test_estimate_bbox_blank_frame_returns_full():
    img = np.full((64, 48, 3), 200, np.uint8)
    assert estimate_bbox(img) == (0, 0, 47, 63)


def test_bbox_from_mask_empty():
    assert bbox_from_mask(np.zeros((8, 10), bool)) == (0, 0, 9, 7)


def test_sam_seed_bbox_smoke():
    """seed_bbox returns an in-frame box or None (random weights — only the
    contract is testable here; real-weight behavior is the runbook's job)."""
    from tests.test_sam import _tiny_cfg
    from one2345_tpu.segmentation.sam import SamStage

    stage = SamStage(_tiny_cfg(), seed=0)
    img = np.random.default_rng(0).integers(0, 255, (48, 60, 3), np.uint8)
    cache = stage.set_image(img)
    box = stage.seed_bbox(cache)
    if box is not None:
        x0, y0, x1, y1 = box
        assert 0 <= x0 <= x1 < 60 and 0 <= y0 <= y1 < 48


def test_preprocess_uses_sam_seeded_bbox(monkeypatch):
    """The pipeline's preprocess must consult SAM for the seed box and only
    fall back to estimate_bbox when SAM's proposal is degenerate."""
    from one2345_tpu.core.config import PipelineConfig, SamConfig
    from one2345_tpu.pipeline.runner import One2345Pipeline
    from tests.test_sam import _tiny_cfg

    pipe = One2345Pipeline(
        PipelineConfig(sam=_tiny_cfg()), use_sam=True
    )
    calls = {"seed": 0, "fallback": 0}
    orig_seed = type(pipe.sam).seed_bbox

    def spy_seed(self, cache, margin=0.05):
        calls["seed"] += 1
        return (10, 10, 40, 35)

    monkeypatch.setattr(type(pipe.sam), "seed_bbox", spy_seed)
    import one2345_tpu.utils.image as img_utils

    orig_est = img_utils.estimate_bbox
    monkeypatch.setattr(
        img_utils, "estimate_bbox",
        lambda *a: calls.__setitem__("fallback", calls["fallback"] + 1) or orig_est(*a),
    )
    img = _scene((255, 255, 255), (90, 60, 40))
    out = pipe.preprocess(img, safety_check=False)
    assert out.shape == (256, 256, 3)
    assert calls["seed"] == 1 and calls["fallback"] == 0
    del orig_seed
