"""LoFTR matcher smoke tests (tiny image size for CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from one2345_tpu.elevation.loftr import LoFTRMatcher, sine_position_encoding


def test_sine_position_encoding_shape():
    pe = sine_position_encoding(8, 8, 256)
    assert pe.shape == (8, 8, 256)
    # sin/cos structure: channel 0 is sin(x), channel 1 cos(x)
    assert abs(pe[0, 0, 0] - np.sin(1.0)) < 1e-6
    assert abs(pe[0, 0, 1] - np.cos(1.0)) < 1e-6


def test_matcher_identical_images_match_identity():
    """Matching an image against itself: valid matches must be (nearly)
    identity correspondences."""
    m = LoFTRMatcher(image_size=64, max_matches=64, threshold=0.05)
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(64, 64)).astype(np.float32)
    res = m.match_pair(m.params, jnp.asarray(img), jnp.asarray(img))
    valid = np.asarray(res.valid)
    if valid.any():  # random weights may or may not cross the threshold
        k0 = np.asarray(res.kpts0)[valid]
        k1 = np.asarray(res.kpts1)[valid]
        # coarse grid stride is 8; fine refinement stays within the window
        assert np.abs(k0 - k1).max() <= 8.0
    assert res.kpts0.shape == (64, 2)


def test_batched_pairs_match_single():
    m = LoFTRMatcher(image_size=64, max_matches=32, threshold=0.01)
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(2, 64, 64)).astype(np.float32)
    b = rng.uniform(size=(2, 64, 64)).astype(np.float32)
    batched = m.match_pairs(m.params, jnp.asarray(a), jnp.asarray(b))
    single0 = m.match_pair(m.params, jnp.asarray(a[0]), jnp.asarray(b[0]))
    np.testing.assert_allclose(
        np.asarray(batched.kpts0[0]), np.asarray(single0.kpts0), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(batched.conf[0]), np.asarray(single0.conf), atol=1e-5
    )
