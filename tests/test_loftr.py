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


def test_row_reduced_topk_matches_dense_sort():
    """The row-reduce + top-k selection equals the dense 13M-entry sort on
    mutual-NN-structured score matrices (at most one valid entry per row)."""
    rng = np.random.default_rng(7)
    L, K = 90, 16
    for trial in range(5):
        conf = rng.uniform(size=(L, L)).astype(np.float32)
        maxrow = conf == conf.max(axis=1, keepdims=True)
        maxcol = conf == conf.max(axis=0, keepdims=True)
        ok = (conf > 0.2) & maxrow & maxcol
        scores = np.where(ok, conf, 0.0)

        # dense reference (the pre-optimization form)
        topv_d, topi_d = jax.lax.top_k(jnp.asarray(scores.reshape(-1)), K)
        i_d, j_d = np.asarray(topi_d) // L, np.asarray(topi_d) % L

        row_val = jnp.max(jnp.asarray(scores), axis=1)
        row_arg = jnp.argmax(jnp.asarray(scores), axis=1)
        topv_r, i_r = jax.lax.top_k(row_val, K)
        j_r = np.asarray(row_arg)[np.asarray(i_r)]

        valid = np.asarray(topv_d) > 0
        np.testing.assert_allclose(np.asarray(topv_r), np.asarray(topv_d), atol=1e-7)
        np.testing.assert_array_equal(np.asarray(i_r)[valid], i_d[valid])
        np.testing.assert_array_equal(j_r[valid], j_d[valid])
