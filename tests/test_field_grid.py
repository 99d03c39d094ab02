"""Separable field-grid extraction == pointwise trilinear + MLP."""

import jax.numpy as jnp
import numpy as np

from one2345_tpu.core.config import ReconConfig
from one2345_tpu.recon.pipeline import ReconStage


def test_field_grid_matches_pointwise():
    cfg = ReconConfig(vol_dims=(16, 16, 16), voxel_size=2.0 / 15.0, image_hw=(32, 32))
    stage = ReconStage(cfg, seed=0)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(16, 16, 16, 16)).astype(np.float32))

    R = 17
    u = np.asarray(stage.field_grid(stage.params, vol, R), np.float32)
    assert u.shape == (R, R, R)

    lin = np.linspace(-1, 1, R, dtype=np.float32)
    xx, yy, zz = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = jnp.asarray(np.stack([xx, yy, zz], -1).reshape(-1, 3))
    sdf = np.asarray(stage.sdf_chunk(stage.params, pts, vol)).reshape(R, R, R)

    np.testing.assert_allclose(u, -sdf, atol=2e-3)  # f16 quantization floor

    # int8 path: sign agreement inside the mask, -127 outside
    mask = jnp.ones((16, 16, 16, 1)).at[:4].set(0.0)
    q = np.asarray(stage.field_grid_i8(stage.params, vol, mask, R))
    assert q.dtype == np.int8
    idx = (np.arange(R) * (16 / R)).astype(int)
    outside = idx < 4
    assert (q[outside] == -127).all()
    inside = ~outside
    near = np.abs(u[inside]) > 0.01
    assert (np.sign(q[inside][near]) == np.sign(u[inside][near])).mean() > 0.999


def test_sparse_field_fetch_mesh_identical():
    """Sign-plane + sparse-refinement fetch -> bit-identical mesh vs the
    dense int8 fetch (crossing cubes use exact values; fill is sign-correct)."""
    from one2345_tpu.recon import mesh_extract

    cfg = ReconConfig(vol_dims=(16, 16, 16), voxel_size=2.0 / 15.0, image_hw=(32, 32))
    stage = ReconStage(cfg, seed=0)
    rng = np.random.default_rng(1)
    vol = jnp.asarray(rng.normal(size=(16, 16, 16, 16)).astype(np.float32))
    mask = jnp.ones((16, 16, 16, 1))

    R = 32
    q = stage.field_grid_i8(stage.params, vol, mask, R)
    dense = np.asarray(q, np.float32)
    sparse, active_cubes = stage._fetch_field_sparse(q, R, threshold=0.0)

    # same signs everywhere; exact values at corners of crossing cubes
    assert ((dense > 0) == (sparse > 0)).all()
    v_d, f_d = mesh_extract.marching_tetrahedra(dense, 0.0)
    v_s, f_s = mesh_extract.marching_tetrahedra(sparse, 0.0, active_cubes=active_cubes)
    assert v_d.shape == v_s.shape and f_d.shape == f_s.shape
    np.testing.assert_array_equal(v_d, v_s)
    # identical triangles; orientation (driven by np.gradient over the
    # far-field fill) may flip on a tiny fraction of knife-edge faces
    np.testing.assert_array_equal(np.sort(f_d, axis=1), np.sort(f_s, axis=1))
    assert (f_d != f_s).any(axis=1).mean() < 0.02
