"""Sphere-tracing depth extraction + auxiliary loss tests."""

import jax.numpy as jnp
import numpy as np

from one2345_tpu.recon.fast_renderer import sphere_trace_depth
from one2345_tpu.training.losses import (
    depth_l1_loss,
    depth_metrics,
    depth_smooth_loss,
    ncc_loss,
)


def _sphere_volume(res=64, r=0.5):
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return jnp.asarray(
        (np.sqrt(x**2 + y**2 + z**2) - r)[..., None].astype(np.float32)
    )


def test_sphere_trace_hits_surface():
    vol = _sphere_volume()
    n = 5
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, 1.5]]), (n, 1))
    th = jnp.linspace(-0.1, 0.1, n)
    rays_d = jnp.stack([jnp.sin(th), jnp.zeros_like(th), -jnp.cos(th)], -1)
    depth, hit = sphere_trace_depth(vol, rays_o, rays_d, 0.6, 2.4)
    assert np.asarray(hit).all()
    np.testing.assert_allclose(np.asarray(depth), 1.0, atol=0.05)


def test_sphere_trace_miss():
    vol = _sphere_volume()
    rays_o = jnp.array([[0.0, 0.0, 1.5]])
    rays_d = jnp.array([[1.0, 0.0, 0.0]])  # tangential miss
    depth, hit = sphere_trace_depth(vol, rays_o, rays_d, 0.6, 2.4)
    assert not np.asarray(hit).any()


def test_depth_losses():
    gt = jnp.array([1.0, 2.0, -1.0, 3.0])  # -1 invalid
    pred = jnp.array([1.5, 2.0, 99.0, 3.0])
    np.testing.assert_allclose(float(depth_l1_loss(pred, gt)), 0.5 / 3, rtol=1e-6)

    d = jnp.ones((8, 8))
    img = jnp.zeros((8, 8, 3))
    assert float(depth_smooth_loss(d, img)) == 0.0

    m = depth_metrics(gt * 1.1, gt)
    assert abs(float(m["abs_rel"]) - 0.1) < 1e-5
    assert float(m["delta_1"]) == 1.0


def test_ncc_identical_patches():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(4, 49, 3)).astype(np.float32))
    assert float(ncc_loss(a, a)) < 1e-5
    b = jnp.asarray(rng.normal(size=(4, 49, 3)).astype(np.float32))
    assert float(ncc_loss(a, b)) > 0.3
