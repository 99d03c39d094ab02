"""Golden-input preprocessing test on the reference demo images.

The reference maintains quality via a curated golden example set
(demo/demo_examples, SURVEY §4).  The images are mounted read-only in this
environment; this test exercises the real preprocessing path (thumbnail ->
bbox -> recenter/rescale -> white composite) on them when available.
"""

import os

import numpy as np
import pytest

DEMO_DIR = "/root/reference/demo/demo_examples"

def _real_image(path: str) -> bool:
    # in some environments the demo PNGs are git-lfs pointer stubs
    return os.path.isfile(path) and os.path.getsize(path) > 10_000


@pytest.mark.parametrize("name", ["01_wild_hydrant.png", "04_unsplash_broccoli.png"])
def test_preprocess_golden_image(name):
    from PIL import Image

    from one2345_tpu.core.config import PipelineConfig
    from one2345_tpu.pipeline.runner import One2345Pipeline

    path = os.path.join(DEMO_DIR, name)
    if not _real_image(path):
        pytest.skip("demo image unavailable (lfs stub)")
    pipe = One2345Pipeline(PipelineConfig(), use_sam=False)
    img = np.asarray(Image.open(path).convert("RGBA"))
    out = pipe.preprocess(img)

    assert out.shape == (256, 256, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # white background composite: borders are (near) white
    border = np.concatenate([out[0], out[-1], out[:, 0], out[:, -1]])
    assert border.mean() > 0.93
    # the object fills a central region (ratio 0.75 rescale): center not white
    center = out[96:160, 96:160]
    assert center.mean() < 0.95
    # object occupies a plausible fraction of the frame
    fg = (~np.all(out > 0.97, axis=-1)).mean()
    assert 0.1 < fg < 0.8, fg
