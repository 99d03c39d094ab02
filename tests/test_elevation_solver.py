"""Synthetic-geometry test: the elevation sweep recovers a known elevation."""

import jax.numpy as jnp
import numpy as np

from one2345_tpu.elevation.solver import PAIRS, _sweep, pose_hypothesis, triangulate_dlt


def _project(K, pose, pts):
    w2c = np.linalg.inv(np.asarray(pose))
    pc = pts @ w2c[:3, :3].T + w2c[:3, 3][None]
    uv = pc @ np.asarray(K).T
    return uv[:, :2] / uv[:, 2:3]


def _synthetic_matches(gt_elev, K, n=64, kpad=128, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-0.25, 0.25, size=(n, 3))
    poses = np.asarray(pose_hypothesis(jnp.asarray(gt_elev)))
    projs = [_project(K, poses[i], pts) for i in range(4)]
    packed = []
    for (i, j) in PAIRS:
        k0 = np.zeros((kpad, 2), np.float32)
        k1 = np.zeros((kpad, 2), np.float32)
        conf = np.zeros((kpad,), np.float32)
        valid = np.zeros((kpad,), bool)
        k0[:n] = projs[i] + rng.normal(0, noise, (n, 2))
        k1[:n] = projs[j] + rng.normal(0, noise, (n, 2))
        conf[:n] = 1.0
        valid[:n] = True
        packed.append((k0, k1, conf, valid))
    return tuple(jnp.asarray(np.stack([p[c] for p in packed])) for c in range(4))


def test_triangulation_exact():
    K = np.array([[280.0, 0, 128], [0, 280.0, 128], [0, 0, 1]], np.float32)
    poses = np.asarray(pose_hypothesis(jnp.asarray(60.0)))
    rng = np.random.default_rng(1)
    pts = rng.uniform(-0.3, 0.3, size=(32, 3)).astype(np.float32)
    P0 = K @ np.linalg.inv(poses[0])[:3, :4]
    P1 = K @ np.linalg.inv(poses[1])[:3, :4]
    uv0 = _project(K, poses[0], pts)
    uv1 = _project(K, poses[1], pts)
    X = np.asarray(triangulate_dlt(jnp.asarray(P0), jnp.asarray(P1), jnp.asarray(uv0), jnp.asarray(uv1)))
    np.testing.assert_allclose(X, pts, atol=1e-3)


def test_sweep_recovers_elevation():
    K = jnp.asarray(np.array([[280.0, 0, 128], [0, 280.0, 128], [0, 0, 1]], np.float32))
    for gt in [50.0, 90.0, 120.0]:
        packed = _synthetic_matches(gt, np.asarray(K))
        elevs = jnp.arange(30.0, 150.0, 10.0)
        errs = np.asarray(_sweep(elevs, K, packed, len(PAIRS)))
        best = float(elevs[int(np.argmin(errs))])
        assert abs(best - gt) <= 10.0, (gt, best, errs)


def test_fine_sweep_with_noise():
    K = jnp.asarray(np.array([[280.0, 0, 128], [0, 280.0, 128], [0, 0, 1]], np.float32))
    gt = 73.0
    packed = _synthetic_matches(gt, np.asarray(K), noise=0.3, seed=3)
    fine = jnp.arange(60.0, 90.0, 1.0)
    errs = np.asarray(_sweep(fine, K, packed, len(PAIRS)))
    best = float(fine[int(np.argmin(errs))])
    assert abs(best - gt) <= 2.0, (best, errs.round(2).tolist())


def test_fused_two_stage_sweep_matches_host_path():
    from one2345_tpu.elevation.solver import _sweep_two_stage

    K = jnp.asarray(np.array([[280.0, 0, 128], [0, 280.0, 128], [0, 0, 1]], np.float32))
    for gt, noise in [(50.0, 0.0), (73.0, 0.3), (120.0, 0.0)]:
        packed = _synthetic_matches(gt, np.asarray(K), noise=noise, seed=3)
        # host two-call reference
        coarse = jnp.arange(30.0, 150.0, 10.0)
        e1 = float(coarse[int(np.argmin(np.asarray(_sweep(coarse, K, packed, len(PAIRS)))))])
        fine = jnp.arange(e1 - 10.0, e1 + 10.0, 1.0)
        ref = float(fine[int(np.argmin(np.asarray(_sweep(fine, K, packed, len(PAIRS)))))])
        fused = float(_sweep_two_stage(K, packed, len(PAIRS)))
        assert fused == ref, (gt, fused, ref)
        assert abs(fused - gt) <= 2.0
