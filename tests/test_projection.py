"""Parity tests: back-projection + cost aggregation vs a torch re-derivation."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from one2345_tpu.geometry.projection import (
    aggregate_multiview_features,
    back_project_features,
    frustum_mask,
    sample_features_from_maps,
)


def _make_scene(rng, V=3, H=16, W=16, C=4, N=100):
    feats = rng.normal(size=(V, H, W, C)).astype(np.float32)
    pts = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32)
    projs = []
    for v in range(V):
        K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]])
        # camera at distance 3 looking at the origin (opencv: +z into scene)
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        pos = d * 3.0
        z = -d  # viewing direction
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x) + 1e-9
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=0)
        t = -R @ pos
        w2c = np.eye(4)
        w2c[:3, :3] = R
        w2c[:3, 3] = t
        P = np.eye(4)
        P[:3, :4] = K @ w2c[:3, :4]
        projs.append(P)
    return feats, pts, np.stack(projs).astype(np.float32)


def _torch_backproject(feats, pts, projs):
    """Reference semantics (ops/back_project.py:5-86) re-derived in torch."""
    V, H, W, C = feats.shape
    N = pts.shape[0]
    t_feats = torch.from_numpy(feats).permute(0, 3, 1, 2)  # [V,C,H,W]
    pts_h = np.concatenate([pts, np.ones((N, 1), np.float32)], axis=1)
    out_f, out_m = [], []
    for v in range(V):
        p = projs[v] @ pts_h.T
        x, y, z = p[0], p[1], p[2]
        z = np.where(z >= 0, np.maximum(z, 1e-6), z)
        x = x / z
        y = y / z
        gx = 2 * x / (W - 1) - 1
        gy = 2 * y / (H - 1) - 1
        mask = (np.abs(gx) <= 1) & (np.abs(gy) <= 1) & (p[2] > 0)
        grid = torch.from_numpy(np.stack([gx, gy], -1).astype(np.float32))[None, None]
        f = F.grid_sample(
            t_feats[v : v + 1], grid, padding_mode="zeros", align_corners=True
        )[0, :, 0].T.numpy()
        out_f.append(f)
        out_m.append(mask)
    return np.stack(out_f, 1), np.stack(out_m, 1)  # [N,V,C],[N,V]


def test_back_project_matches_reference_semantics():
    rng = np.random.default_rng(0)
    feats, pts, projs = _make_scene(rng)
    ours_f, ours_m = back_project_features(
        jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(projs)
    )
    ref_f, ref_m = _torch_backproject(feats, pts, projs)
    np.testing.assert_array_equal(np.asarray(ours_m), ref_m)
    np.testing.assert_allclose(np.asarray(ours_f), ref_f, atol=1e-5)


def test_frustum_mask_counts():
    rng = np.random.default_rng(1)
    feats, pts, projs = _make_scene(rng)
    _, m = back_project_features(jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(projs))
    fm = frustum_mask(jnp.asarray(pts), jnp.asarray(projs), (16, 16), min_visible_views=2)
    counts = np.asarray(m).sum(1)
    np.testing.assert_array_equal(np.asarray(fm), counts >= 2)


def test_aggregate_variance_mean():
    rng = np.random.default_rng(2)
    f = rng.normal(size=(10, 4, 6)).astype(np.float32)
    m = (rng.uniform(size=(10, 4)) > 0.3).astype(np.float32)
    m[:, 0] = 1  # ensure visible
    out = np.asarray(aggregate_multiview_features(jnp.asarray(f), jnp.asarray(m)))
    counts = m.sum(1)
    mean = f.sum(1) / (counts[:, None] + 1e-5)
    var = (f**2).sum(1) / (counts[:, None] + 1e-5) - mean**2
    np.testing.assert_allclose(out[:, :6], var, atol=1e-5)
    np.testing.assert_allclose(out[:, 6:], mean, atol=1e-5)


def test_sample_features_from_maps_masks():
    rng = np.random.default_rng(3)
    feats, pts, projs = _make_scene(rng)
    w2cs, Ks = [], []
    for P in projs:
        K = np.array([[20.0, 0, 8.0], [0, 20.0, 8.0], [0, 0, 1]], np.float32)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :4] = np.linalg.inv(K) @ P[:3, :4]
        w2cs.append(w2c)
        Ks.append(K)
    f, m = sample_features_from_maps(
        jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(np.stack(w2cs)),
        jnp.asarray(np.stack(Ks)), (16, 16),
    )
    assert f.shape == (3, 100, 4) and m.shape == (3, 100)
    # out-of-frustum samples must be (near) zero features
    ref_f, ref_m = _torch_backproject(feats, pts, projs)
    np.testing.assert_allclose(np.asarray(f), ref_f.transpose(1, 0, 2), atol=1e-4)
