"""LoFTR match-visualization figures (plotting.py:154 parity)."""

import numpy as np

from one2345_tpu.elevation.loftr import MatchResult
from one2345_tpu.elevation.plotting import make_matching_figure, save_match_figures


def _pair(rng, k=20):
    return MatchResult(
        kpts0=rng.uniform(0, 63, (k, 2)).astype(np.float32),
        kpts1=rng.uniform(0, 63, (k, 2)).astype(np.float32),
        conf=rng.uniform(0.2, 1.0, k).astype(np.float32),
        valid=np.arange(k) < 12,  # fixed-top-K padding rows masked out
    )


def test_make_matching_figure(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(64, 64)).astype(np.float32)
    m = _pair(rng)
    out = tmp_path / "fig.png"
    make_matching_figure(
        img, img, m.kpts0, m.kpts1, m.conf, m.valid, path=str(out),
        text=["test", "12 matches"],
    )
    assert out.exists() and out.stat().st_size > 1000


def test_save_match_figures(tmp_path):
    rng = np.random.default_rng(1)
    imgs = rng.uniform(size=(4, 64, 64)).astype(np.float32)
    matches = {(0, 1): _pair(rng), (2, 3): _pair(rng)}
    paths = save_match_figures(imgs, matches, str(tmp_path / "viz"))
    assert len(paths) == 2
    import os

    assert all(os.path.exists(p) for p in paths)


def test_empty_matches(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(32, 32)).astype(np.float32)
    m = MatchResult(
        kpts0=np.zeros((8, 2), np.float32), kpts1=np.zeros((8, 2), np.float32),
        conf=np.zeros(8, np.float32), valid=np.zeros(8, bool),
    )
    out = tmp_path / "empty.png"
    make_matching_figure(img, img, m.kpts0, m.kpts1, m.conf, m.valid, path=str(out))
    assert out.exists()
