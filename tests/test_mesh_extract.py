"""Tests for marching tetrahedra + PLY IO."""

import os

import numpy as np

from one2345_tpu.recon import mesh_extract as me


def _sphere_field(res=33, radius=0.6):
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    # "occupancy style": positive inside (matches -sdf)
    return radius - np.sqrt(x**2 + y**2 + z**2)


def test_sphere_surface():
    res = 33
    u = _sphere_field(res)
    verts, faces = me.marching_tetrahedra(u, 0.0)
    assert len(verts) > 100 and len(faces) > 100
    w = me.grid_to_world(verts, (-1, -1, -1), (1, 1, 1), res)
    r = np.linalg.norm(w, axis=1)
    # vertices on the 0.6-sphere within a voxel
    assert np.abs(r - 0.6).max() < 2.0 / (res - 1)
    # faces index valid vertices
    assert faces.min() >= 0 and faces.max() < len(verts)


def test_sphere_outward_orientation():
    res = 33
    u = _sphere_field(res)
    verts, faces = me.marching_tetrahedra(u, 0.0)
    w = me.grid_to_world(verts, (-1, -1, -1), (1, 1, 1), res)
    e1 = w[faces[:, 1]] - w[faces[:, 0]]
    e2 = w[faces[:, 2]] - w[faces[:, 0]]
    n = np.cross(e1, e2)
    c = w[faces].mean(axis=1)
    # field increases inward (occupancy), so normals point inward (-c)
    frac_aligned = (np.sum(n * (-c), axis=1) > 0).mean()
    assert frac_aligned > 0.98


def test_watertight_sphere_euler():
    """Closed surface: every edge shared by exactly 2 faces."""
    u = _sphere_field(25)
    verts, faces = me.marching_tetrahedra(u, 0.0)
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    keys = edges[:, 0].astype(np.int64) * len(verts) + edges[:, 1]
    _, counts = np.unique(keys, return_counts=True)
    assert (counts == 2).all()


def test_empty_field():
    u = -np.ones((8, 8, 8), np.float32)
    verts, faces = me.marching_tetrahedra(u, 0.0)
    assert len(verts) == 0 and len(faces) == 0


def test_ply_roundtrip(tmp_path):
    u = _sphere_field(17)
    verts, faces = me.marching_tetrahedra(u, 0.0)
    colors = np.random.default_rng(0).integers(0, 255, (len(verts), 3)).astype(np.uint8)
    path = os.path.join(tmp_path, "m.ply")
    me.save_ply(path, verts, faces, colors)
    v2, f2, c2 = me.load_ply(path)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)
    np.testing.assert_array_equal(c2, colors)


def test_axis_conversion_preserves_shape():
    u = _sphere_field(17)
    verts, faces = me.marching_tetrahedra(u, 0.0)
    v2, f2 = me.convert_mesh_axes(verts, faces)
    assert v2.shape == verts.shape and f2.shape == faces.shape
    # rigid+mirror transform preserves distances between the same vertices
    d_before = np.linalg.norm(verts[faces[:, 0]] - verts[faces[:, 1]], axis=1)
    d_after = np.linalg.norm(v2[faces[:, 0]] - v2[faces[:, 1]], axis=1)
    np.testing.assert_allclose(d_before, d_after, atol=1e-5)
