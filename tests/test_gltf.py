"""GLB writer round-trip + small util tests."""

import numpy as np

from one2345_tpu.recon.gltf import load_glb, save_glb
from one2345_tpu.recon.mesh_extract import marching_tetrahedra_np
from one2345_tpu.utils.image import camera_cone_points, image_grid


def test_glb_roundtrip(tmp_path):
    lin = np.linspace(-1, 1, 17, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    u = 0.6 - np.sqrt(x**2 + y**2 + z**2)
    verts, faces = marching_tetrahedra_np(u, 0.0)
    colors = np.random.default_rng(0).uniform(size=(len(verts), 3)).astype(np.float32)

    path = str(tmp_path / "m.glb")
    save_glb(path, verts, faces, colors)
    v2, f2, c2 = load_glb(path)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)
    np.testing.assert_allclose(c2, colors, atol=1e-6)

    # header sanity: magic + version
    raw = open(path, "rb").read()
    assert raw[:4] == b"glTF"
    assert len(raw) % 4 == 0


def test_image_grid():
    imgs = np.arange(2 * 3 * 4 * 3, dtype=np.float32).reshape(2, 3, 4, 3)
    g = image_grid(imgs, 1, 2)
    assert g.shape == (3, 8, 3)
    np.testing.assert_array_equal(g[:, :4], imgs[0])
    np.testing.assert_array_equal(g[:, 4:], imgs[1])


def test_camera_cone():
    c2w = np.eye(4)
    c2w[:3, 3] = [1, 2, 3]
    pts = camera_cone_points(c2w)
    assert pts.shape == (16, 3)
    np.testing.assert_allclose(pts[0], [1, 2, 3])  # apex at camera center
