"""C++ marching tetrahedra vs numpy reference implementation."""

import numpy as np
import pytest

from one2345_tpu.native.build import marching_tetrahedra_native
from one2345_tpu.recon.mesh_extract import grid_to_world, marching_tetrahedra_np


def _sphere(res=33, r=0.6):
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return r - np.sqrt(x**2 + y**2 + z**2)


def test_native_matches_numpy_on_sphere():
    u = _sphere()
    out = marching_tetrahedra_native(u, 0.0)
    if out is None:
        pytest.skip("native library unavailable (no g++)")
    vn, fn = out
    vp, fp = marching_tetrahedra_np(u, 0.0)
    # same vertex set (order-independent) and same triangle count
    assert len(vn) == len(vp)
    assert len(fn) == len(fp)
    sn = np.asarray(sorted(map(tuple, np.round(vn, 4))))
    sp = np.asarray(sorted(map(tuple, np.round(vp, 4))))
    np.testing.assert_allclose(sn, sp, atol=1e-3)
    # vertices on the sphere
    w = grid_to_world(vn, (-1, -1, -1), (1, 1, 1), 33)
    rr = np.linalg.norm(w, axis=1)
    assert np.abs(rr - 0.6).max() < 2.0 / 32

    # outward orientation (field increases inward -> normals inward vs +c)
    e1 = w[fn[:, 1]] - w[fn[:, 0]]
    e2 = w[fn[:, 2]] - w[fn[:, 0]]
    nrm = np.cross(e1, e2)
    c = w[fn].mean(axis=1)
    assert (np.sum(nrm * (-c), axis=1) > 0).mean() > 0.98


def test_native_watertight():
    out = marching_tetrahedra_native(_sphere(25), 0.0)
    if out is None:
        pytest.skip("native library unavailable")
    v, f = out
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    keys = edges[:, 0].astype(np.int64) * len(v) + edges[:, 1]
    _, counts = np.unique(keys, return_counts=True)
    assert (counts == 2).all()


def test_sparse_cube_list_matches_dense_scan():
    """Passing the crossing-cube set yields the identical mesh (same
    vertex order and faces) in both the C++ and numpy paths."""
    u = _sphere(29, 0.55)
    X = u.shape[0]
    inside = u > 0.0
    cnt = np.zeros((X - 1,) * 3, np.uint8)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                cnt += inside[dx: X - 1 + dx, dy: X - 1 + dy, dz: X - 1 + dz]
    cubes = np.flatnonzero((cnt > 0) & (cnt < 8))

    vp, fp = marching_tetrahedra_np(u, 0.0)
    vps, fps = marching_tetrahedra_np(u, 0.0, active_cubes=cubes)
    np.testing.assert_array_equal(vp, vps)
    np.testing.assert_array_equal(fp, fps)

    out = marching_tetrahedra_native(u, 0.0)
    if out is None:
        pytest.skip("native library unavailable")
    vn, fn = out
    vns, fns = marching_tetrahedra_native(u, 0.0, active_cubes=cubes)
    np.testing.assert_array_equal(vn, vns)
    np.testing.assert_array_equal(fn, fns)


def test_sign_plane_analyze_matches_numpy():
    """Native sign-plane analysis == the numpy unpackbits/count/flatnonzero
    reference on a packed sphere field."""
    from one2345_tpu.native.build import sign_plane_analyze_native

    R = 33
    u = _sphere(R, 0.5)
    inside_ref = u > 0.0
    bits = np.packbits(inside_ref.reshape(-1), bitorder="little")

    out = sign_plane_analyze_native(bits, R)
    if out is None:
        pytest.skip("native library unavailable")
    inside, cubes, needed = out

    np.testing.assert_array_equal(inside, inside_ref)
    cnt = np.zeros((R - 1,) * 3, np.uint8)
    need_ref = np.zeros((R,) * 3, bool)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                cnt += inside_ref[dx: R - 1 + dx, dy: R - 1 + dy, dz: R - 1 + dz]
    active_ref = (cnt > 0) & (cnt < 8)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                need_ref[dx: R - 1 + dx, dy: R - 1 + dy, dz: R - 1 + dz] |= active_ref
    np.testing.assert_array_equal(cubes, np.flatnonzero(active_ref))
    np.testing.assert_array_equal(needed, np.flatnonzero(need_ref))
