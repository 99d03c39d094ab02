"""3D mesh evaluation metrics: Chamfer distance + F-score.

The reference evaluates with these metrics in the paper (Table 1, arXiv
2306.16928) but ships no metric code — only the Blender render harness
(render/README.md).  This module supplies the missing piece, following the
conventions used by the One-2-3-45 evaluation: uniform surface sampling,
symmetric Chamfer-L2, and F-score at a distance threshold.
"""

from __future__ import annotations

import numpy as np


def sample_surface(
    verts: np.ndarray, faces: np.ndarray, n_points: int, seed: int = 0
) -> np.ndarray:
    """Uniform-by-area point sampling on a triangle mesh -> [n, 3]."""
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    total = areas.sum()
    if total <= 0 or len(faces) == 0:
        return np.zeros((0, 3), np.float32)
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(faces), size=n_points, p=areas / total)
    r1 = np.sqrt(rng.uniform(size=(n_points, 1)))
    r2 = rng.uniform(size=(n_points, 1))
    return ((1 - r1) * v0[idx] + r1 * (1 - r2) * v1[idx] + r1 * r2 * v2[idx]).astype(
        np.float32
    )


def _nn_dists(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """For each point in a, distance to nearest point in b."""
    from scipy.spatial import cKDTree

    tree = cKDTree(b)
    d, _ = tree.query(a, k=1)
    return d


def chamfer_distance(
    pts_a: np.ndarray, pts_b: np.ndarray, squared: bool = True
) -> float:
    """Symmetric Chamfer distance (mean of both directions)."""
    d_ab = _nn_dists(pts_a, pts_b)
    d_ba = _nn_dists(pts_b, pts_a)
    if squared:
        return float(np.mean(d_ab**2) + np.mean(d_ba**2)) / 2.0
    return float(np.mean(d_ab) + np.mean(d_ba)) / 2.0


def f_score(pts_pred: np.ndarray, pts_gt: np.ndarray, threshold: float = 0.05) -> float:
    """F-score at a distance threshold (precision/recall harmonic mean)."""
    d_pg = _nn_dists(pts_pred, pts_gt)
    d_gp = _nn_dists(pts_gt, pts_pred)
    precision = float(np.mean(d_pg < threshold))
    recall = float(np.mean(d_gp < threshold))
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def normalize_to_unit_box(verts: np.ndarray, scale: float = 0.8) -> np.ndarray:
    """Center + scale a mesh into a `scale`-sized unit box, matching the
    Blender eval normalization (render/single_render_eval.py:141-152)."""
    bb_min, bb_max = verts.min(0), verts.max(0)
    center = (bb_min + bb_max) / 2
    extent = (bb_max - bb_min).max()
    return (verts - center) / (extent + 1e-12) * scale


def evaluate_mesh_pair(
    pred_verts, pred_faces, gt_verts, gt_faces,
    n_points: int = 16384, fscore_threshold: float = 0.05, normalize: bool = True,
) -> dict:
    """CD + F-score between predicted and GT meshes (both normalized)."""
    pv = normalize_to_unit_box(pred_verts) if normalize else pred_verts
    gv = normalize_to_unit_box(gt_verts) if normalize else gt_verts
    pp = sample_surface(pv, pred_faces, n_points)
    gp = sample_surface(gv, gt_faces, n_points, seed=1)
    return {
        "chamfer_l2": chamfer_distance(pp, gp, squared=True),
        "chamfer_l1": chamfer_distance(pp, gp, squared=False),
        "f_score": f_score(pp, gp, fscore_threshold),
    }
