"""Tests for pose synthesis and scene normalization."""

import numpy as np

from one2345_tpu.geometry import cameras


def test_look_at_pose_properties():
    polar = np.radians([30.0, 60.0, 90.0, 120.0])
    azim = np.radians([30.0, 120.0, 210.0, 300.0])
    poses = cameras.spherical_look_at_poses(polar, azim, radius=1.2)
    assert poses.shape == (4, 4, 4)
    for p in poses:
        R = p[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)
        assert np.linalg.det(R) > 0.99
        # camera is on the radius-1.2 sphere
        np.testing.assert_allclose(np.linalg.norm(p[:3, 3]), 1.2, atol=1e-8)
        # forward column (blender backward axis) points from origin to camera
        np.testing.assert_allclose(R[:, 2], p[:3, 3] / 1.2, atol=1e-8)


def test_rig_low_and_high_elevation():
    ids_lo, polar_lo, azim_lo = cameras.rig_view_angles(30.0)
    assert len(ids_lo) == 40 and polar_lo.shape == (40,) and azim_lo.shape == (40,)
    assert ids_lo[:8] == [f"{i}.png" for i in range(8)]
    # first ring at the estimated elevation, second +30
    np.testing.assert_allclose(np.degrees(polar_lo[:4]), 30.0)
    np.testing.assert_allclose(np.degrees(polar_lo[4:8]), 60.0)

    ids_hi, polar_hi, _ = cameras.rig_view_angles(80.0)
    assert ids_hi[:8] == [f"{i}.png" for i in [0, 1, 2, 3, 8, 9, 10, 11]]
    np.testing.assert_allclose(np.degrees(polar_hi[4:8]), 50.0)


def test_pose_dict_payload():
    d = cameras.pose_dict(45.0)
    assert len(d["c2ws"]) == 40
    assert d["near_far"] == [0.5, 1.7999999999999998]
    assert d["intrinsics"][0][0] == 280.0


def _rq(M):
    """RQ decomposition with positive diagonal (what cv2.decomposeProjectionMatrix does)."""
    P = np.flipud(np.eye(3))
    q, r = np.linalg.qr((P @ M).T)
    K = P @ r.T @ P
    R = P @ q.T
    D = np.diag(np.sign(np.diag(K)))
    return K @ D, D @ R


def test_apply_scale_mat_matches_projection_decomposition():
    """Analytic normalization == the reference's K[R|t]S re-decomposition."""
    rng = np.random.default_rng(0)
    ids, poses = cameras.rig_poses(40.0)
    c2ws = poses @ cameras.BLENDER2OPENCV
    w2cs = np.linalg.inv(c2ws)
    K4 = np.eye(4)
    K4[:3, :3] = cameras.intrinsic_matrix()
    intr = np.stack([K4] * 5)
    sel = w2cs[:5]
    scale_mat = np.diag([0.7, 0.7, 0.7, 1.0])
    scale_mat[:3, 3] = rng.normal(size=3) * 0.1

    new_w2cs, new_c2ws, affines = cameras.apply_scale_mat(intr, sel, scale_mat)

    for i in range(5):
        P = (intr[i] @ sel[i] @ scale_mat)[:3, :4]
        Kd, Rd = _rq(P[:3, :3])
        Kd = Kd / Kd[2, 2]
        # camera center = null space of P
        _, _, vh = np.linalg.svd(P)
        c = vh[-1]
        c = c[:3] / c[3]
        np.testing.assert_allclose(new_c2ws[i][:3, :3], Rd.T, atol=1e-6)
        np.testing.assert_allclose(new_c2ws[i][:3, 3], c, atol=1e-6)
        np.testing.assert_allclose(affines[i][:3, :4], Kd @ new_w2cs[i][:3, :4], atol=1e-4)


def test_build_recon_cameras_shapes_and_scale():
    pack = cameras.build_recon_cameras(30.0)
    assert pack["w2cs"].shape == (33, 4, 4)
    assert pack["affines"].shape == (33, 4, 4)
    assert pack["target_w2cs"].shape == (8, 4, 4)
    # normalized cameras should sit roughly at distance 1.2/radius
    dists = np.linalg.norm(pack["c2ws"][:, :3, 3], axis=-1)
    assert np.all(dists > 0.5) and np.all(dists < 3.0)
    nf = pack["near_fars"]
    assert np.all(nf[:, 0] < dists) and np.all(nf[:, 1] > dists)
    # reference view is identity rotation up to the normalization translation
    q = pack["query_c2w"]
    assert np.isfinite(q).all()
