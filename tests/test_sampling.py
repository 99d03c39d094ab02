"""Parity tests for the sampling primitives against torch.grid_sample."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from one2345_tpu.geometry.sampling import (
    bilinear_sample_normalized,
    nearest_sample_volume,
    sample_pdf,
    trilinear_sample,
)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_bilinear_matches_torch(padding):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(7, 9, 3)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(50, 2)).astype(np.float32)

    ours = bilinear_sample_normalized(jnp.asarray(img), jnp.asarray(grid), padding=padding)

    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]  # [1,C,H,W]
    t_grid = torch.from_numpy(grid)[None, None]  # [1,1,N,2]
    ref = F.grid_sample(
        t_img, t_grid, mode="bilinear", padding_mode=padding, align_corners=True
    )[0, :, 0].T.numpy()

    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_trilinear_matches_torch(padding):
    rng = np.random.default_rng(1)
    vol = rng.normal(size=(5, 6, 7, 4)).astype(np.float32)  # [X,Y,Z,C]
    pts = rng.uniform(-1.2, 1.2, size=(40, 3)).astype(np.float32)

    ours = trilinear_sample(jnp.asarray(vol), jnp.asarray(pts), padding=padding)

    # torch: volume [1,C,D,H,W] with (D,H,W) = (X,Y,Z); grid last dim is
    # (x->W, y->H, z->D) so we must flip to (z,y,x) (the reference's flip at
    # render_utils.py:77-79)
    t_vol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]
    t_pts = torch.from_numpy(pts[:, ::-1].copy())[None, None, None]  # [1,1,1,N,3]
    ref = F.grid_sample(
        t_vol, t_pts, mode="bilinear", padding_mode=padding, align_corners=True
    )[0, :, 0, 0].T.numpy()

    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_nearest_matches_torch():
    rng = np.random.default_rng(2)
    vol = rng.normal(size=(5, 5, 5, 1)).astype(np.float32)
    pts = rng.uniform(-0.99, 0.99, size=(30, 3)).astype(np.float32)
    ours = nearest_sample_volume(jnp.asarray(vol), jnp.asarray(pts))
    t_vol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]
    t_pts = torch.from_numpy(pts[:, ::-1].copy())[None, None, None]
    ref = F.grid_sample(t_vol, t_pts, mode="nearest", align_corners=True)[
        0, :, 0, 0
    ].T.numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_trilinear_twice_differentiable():
    """The eikonal loss needs grad-of-grad through trilinear sampling
    (the reason the reference hand-writes ops/grid_sampler.py)."""
    vol = jnp.asarray(np.random.default_rng(3).normal(size=(4, 4, 4, 1)), jnp.float32)

    def f(p):
        return trilinear_sample(vol, p[None])[0, 0]

    p0 = jnp.array([0.1, -0.2, 0.3])
    g = jax.grad(f)(p0)
    assert g.shape == (3,)

    def norm_g(p):
        return jnp.sum(jax.grad(f)(p) ** 2)

    gg = jax.grad(norm_g)(p0)
    assert np.all(np.isfinite(np.asarray(gg)))


def test_sample_pdf_concentrates_mass():
    bins = jnp.linspace(0.0, 1.0, 9)[None].repeat(2, axis=0)  # [2, 9]
    w = jnp.zeros((2, 8)).at[:, 3].set(1.0)  # all mass in bin [3/8, 4/8]
    samples = sample_pdf(bins, w, 16)
    s = np.asarray(samples)
    assert s.shape == (2, 16)
    assert (s >= 3 / 8 - 0.02).all() and (s <= 4 / 8 + 0.02).all()


def test_sample_pdf_uniform_weights_spread():
    bins = jnp.linspace(0.0, 1.0, 9)[None]
    w = jnp.ones((1, 8))
    s = np.asarray(sample_pdf(bins, w, 64))[0]
    assert abs(s.mean() - 0.5) < 0.02
    assert s.min() < 0.05 and s.max() > 0.95
