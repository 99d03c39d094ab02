"""Unit tests for the shared NN building blocks."""

import jax
import jax.numpy as jnp
import numpy as np

from one2345_tpu.nn.layers import (
    MaskedBatchNorm,
    WNDense,
    positional_encoding,
    resize_bilinear_align_corners,
)


def test_masked_bn_train_stats_over_active_only():
    """Training statistics must come from masked (active) elements only —
    the semantics torchsparse BatchNorm sees on a sparse tensor."""
    mod = MaskedBatchNorm()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(3.0, 2.0, size=(64, 4)).astype(np.float32))
    mask = jnp.ones((64, 1)).at[32:].set(0.0)
    # poison inactive entries: they must not affect the statistics
    x = x.at[32:].set(1e6)

    vars_ = mod.init(jax.random.key(0), x, mask, train=True)
    y, updates = mod.apply(vars_, x, mask, train=True, mutable=["batch_stats"])
    y = np.asarray(y)
    # active outputs are standardized; inactive are zeroed
    assert abs(y[:32].mean()) < 1e-4
    assert abs(y[:32].std() - 1.0) < 1e-2
    assert (y[32:] == 0).all()
    # running stats moved toward the active-set statistics, not the poison
    m = np.asarray(updates["batch_stats"]["mean"])
    assert (np.abs(m) < 10).all()


def test_wndense_direction_magnitude():
    """Effective weight = g * v/||v||: scaling v must not change the output."""
    mod = WNDense(3)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(5, 4)).astype(np.float32))
    vars_ = mod.init(jax.random.key(0), x)
    y0 = mod.apply(vars_, x)
    scaled = jax.tree_util.tree_map(lambda a: a, vars_)
    scaled = {"params": {**vars_["params"], "v": vars_["params"]["v"] * 7.0}}
    y1 = mod.apply(scaled, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)


def test_positional_encoding_layout():
    x = jnp.asarray([[0.5, -0.25, 1.0]])
    out = positional_encoding(x, 2)
    assert out.shape == (1, 3 * 5)
    np.testing.assert_allclose(np.asarray(out[0, :3]), [0.5, -0.25, 1.0])
    np.testing.assert_allclose(float(out[0, 3]), np.sin(0.5), atol=1e-6)
    np.testing.assert_allclose(float(out[0, 9]), np.sin(1.0), atol=1e-6)  # freq 2^1


def test_resize_align_corners_endpoints():
    img = jnp.arange(16.0).reshape(4, 4, 1)
    out = resize_bilinear_align_corners(img, (7, 7))
    # corners are preserved exactly with align_corners
    assert float(out[0, 0, 0]) == 0.0
    assert float(out[6, 6, 0]) == 15.0
    assert float(out[0, 6, 0]) == 3.0
