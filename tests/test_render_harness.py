"""Tests for the in-tree eval rasterizer."""

import numpy as np

from one2345_tpu.eval.render_harness import eval_cameras, rasterize, render_eval_views
from one2345_tpu.recon.mesh_extract import marching_tetrahedra_np


def _sphere_mesh(res=21, r=0.6):
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    u = r - np.sqrt(x**2 + y**2 + z**2)
    v, f = marching_tetrahedra_np(u, 0.0)
    return v / (res - 1.0) * 2.0 - 1.0, f


def test_eval_camera_protocol():
    cams = eval_cameras()
    assert len(cams) == 24
    for K, w2c in cams:
        c = np.linalg.inv(np.vstack([w2c[:3], [0, 0, 0, 1]]))[:3, 3]
        np.testing.assert_allclose(np.linalg.norm(c), 1.3, atol=1e-6)
    # first 12 at 30 deg elevation
    elevs = []
    for K, w2c in cams:
        c = np.linalg.inv(np.vstack([w2c[:3], [0, 0, 0, 1]]))[:3, 3]
        elevs.append(np.degrees(np.arcsin(c[2] / 1.3)))
    np.testing.assert_allclose(elevs[:12], 30.0, atol=1e-4)
    np.testing.assert_allclose(elevs[12:], 0.0, atol=1e-4)


def test_rasterize_sphere():
    v, f = _sphere_mesh()
    colors = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (len(v), 1))
    K, w2c = eval_cameras(res=64)[0]
    rgb, alpha = rasterize(v * 0.4, f, colors, K, w2c, res=64, shade=False)
    # the sphere projects to a central disk: center covered, corners not
    assert alpha[32, 32]
    assert not alpha[2, 2] and not alpha[61, 61]
    # covered pixels are red
    np.testing.assert_allclose(rgb[32, 32], [1, 0, 0], atol=1e-5)
    # silhouette is roughly a circle: area ratio sanity
    frac = alpha.mean()
    assert 0.05 < frac < 0.6


def test_render_eval_views_shapes():
    v, f = _sphere_mesh(13)
    out = render_eval_views(v, f, res=32)
    assert out.shape == (24, 32, 32, 3)
    assert np.isfinite(out).all()
    # object visible from every view
    for i in range(24):
        assert (out[i] < 0.99).any()
