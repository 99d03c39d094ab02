"""Tests for Chamfer/F-score evaluation metrics."""

import numpy as np

from one2345_tpu.eval import metrics
from one2345_tpu.recon.mesh_extract import marching_tetrahedra_np


def _sphere_mesh(res=33, r=0.6):
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    u = r - np.sqrt(x**2 + y**2 + z**2)
    v, f = marching_tetrahedra_np(u, 0.0)
    v = v / (res - 1.0) * 2.0 - 1.0
    return v, f


def test_sample_surface_on_sphere():
    v, f = _sphere_mesh()
    pts = metrics.sample_surface(v, f, 2048)
    r = np.linalg.norm(pts, axis=1)
    assert abs(r.mean() - 0.6) < 0.02


def test_identical_meshes_zero_cd():
    v, f = _sphere_mesh()
    out = metrics.evaluate_mesh_pair(v, f, v.copy(), f.copy(), n_points=4096,
                                     normalize=False)
    # different sample seeds -> CD is the sampling density floor (~1e-3)
    assert out["chamfer_l2"] < 5e-3
    assert out["f_score"] > 0.99


def test_shifted_mesh_worse():
    v, f = _sphere_mesh()
    out0 = metrics.evaluate_mesh_pair(v, f, v, f, n_points=2048, normalize=False)
    out1 = metrics.evaluate_mesh_pair(v + 0.2, f, v, f, n_points=2048, normalize=False)
    assert out1["chamfer_l2"] > out0["chamfer_l2"] * 10
    assert out1["f_score"] < out0["f_score"]
    # normalization removes pure translation
    out2 = metrics.evaluate_mesh_pair(v + 0.2, f, v, f, n_points=2048, normalize=True)
    assert out2["chamfer_l2"] < 5e-3


def test_scale_invariance_of_normalized_eval():
    v, f = _sphere_mesh()
    out = metrics.evaluate_mesh_pair(v * 3.0, f, v, f, n_points=2048, normalize=True)
    assert out["f_score"] > 0.99
