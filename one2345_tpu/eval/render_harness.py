"""Mesh evaluation render harness — the 24-view protocol, self-contained.

Parity target: render/launch_render_eval.py + render/single_render_eval.py —
renders GT and predicted meshes from 24 fixed viewpoints (12 @ 30 deg
elevation + 12 @ 0 deg, camera distance 1.3, the mesh normalized into a
0.8-unit box) for image-space metric computation.

The reference shells out to Blender/BlenderProc (an external binary).  Here
the same camera protocol is rendered by an in-tree z-buffer rasterizer with
per-vertex colors + lambertian shading — no external renderer needed; when
blenderproc IS available, `blender_command` emits the equivalent CLI.
"""

from __future__ import annotations

import numpy as np

from one2345_tpu.eval.metrics import normalize_to_unit_box

EVAL_RES = 512
EVAL_CAM_DIST = 1.3
EVAL_AZIMUTHS = np.arange(12) * 30.0
EVAL_ELEVATIONS = (30.0, 0.0)


def eval_cameras(res: int = EVAL_RES):
    """[24] (K, w2c) of the eval protocol (single_render_eval.py:170-213:
    12 azimuths at polar 60 deg, 12 at polar 90 deg)."""
    from one2345_tpu.geometry.cameras import BLENDER2OPENCV, spherical_look_at_poses

    polar = np.radians(
        [90.0 - e for e in EVAL_ELEVATIONS for _ in range(12)]
    )
    azim = np.radians(np.concatenate([EVAL_AZIMUTHS, EVAL_AZIMUTHS]))
    c2ws = spherical_look_at_poses(polar, azim, radius=EVAL_CAM_DIST) @ BLENDER2OPENCV
    w2cs = np.linalg.inv(c2ws)
    focal = res / (2 * np.tan(np.radians(20.0)))  # ~40 deg fov
    K = np.array([[focal, 0, res / 2], [0, focal, res / 2], [0, 0, 1]])
    return [(K, w2cs[i]) for i in range(24)]


def rasterize(
    verts: np.ndarray,
    faces: np.ndarray,
    colors: np.ndarray,
    K: np.ndarray,
    w2c: np.ndarray,
    res: int = EVAL_RES,
    shade: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Z-buffer rasterization with barycentric-interpolated vertex colors.

    :return: (rgb [res,res,3] float, alpha [res,res] bool)
    """
    vc = verts @ w2c[:3, :3].T + w2c[:3, 3]
    uvw = vc @ K.T
    z = uvw[:, 2]
    uv = uvw[:, :2] / np.maximum(z[:, None], 1e-6)

    rgb = np.ones((res, res, 3), np.float32)
    depth = np.full((res, res), np.inf, np.float32)
    alpha = np.zeros((res, res), bool)

    tri_uv = uv[faces]  # [F, 3, 2]
    tri_z = z[faces]
    tri_c = colors[faces]
    # backface + behind-camera culling
    ok = (tri_z > 1e-4).all(axis=1)

    if shade:
        e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
        e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
        n = np.cross(e1, e2)
        n /= np.linalg.norm(n, axis=1, keepdims=True) + 1e-12
        light = np.array([0.5, 0.5, 1.0])
        light = light / np.linalg.norm(light)
        lam = (0.55 + 0.45 * np.abs(n @ light))[:, None, None]
        tri_c = np.clip(tri_c * lam, 0, 1)

    for f in np.nonzero(ok)[0]:
        p = tri_uv[f]
        zmin = tri_z[f]
        x0 = max(int(np.floor(p[:, 0].min())), 0)
        x1 = min(int(np.ceil(p[:, 0].max())) + 1, res)
        y0 = max(int(np.floor(p[:, 1].min())), 0)
        y1 = min(int(np.ceil(p[:, 1].max())) + 1, res)
        if x0 >= x1 or y0 >= y1:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1) + 0.5, np.arange(y0, y1) + 0.5)
        d = np.stack([xs - p[0, 0], ys - p[0, 1]], axis=-1)
        m = np.array([p[1] - p[0], p[2] - p[0]]).T  # [2, 2]
        det = m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0]
        if abs(det) < 1e-12:
            continue
        inv = np.array([[m[1, 1], -m[0, 1]], [-m[1, 0], m[0, 0]]]) / det
        bc = d @ inv.T  # [h, w, 2] -> (b1, b2)
        b1, b2 = bc[..., 0], bc[..., 1]
        b0 = 1.0 - b1 - b2
        inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0)
        if not inside.any():
            continue
        zi = b0 * zmin[0] + b1 * zmin[1] + b2 * zmin[2]
        sub_d = depth[y0:y1, x0:x1]
        upd = inside & (zi < sub_d)
        ci = (
            b0[..., None] * tri_c[f, 0]
            + b1[..., None] * tri_c[f, 1]
            + b2[..., None] * tri_c[f, 2]
        )
        sub_rgb = rgb[y0:y1, x0:x1]
        sub_rgb[upd] = ci[upd]
        sub_d[upd] = zi[upd]
        alpha[y0:y1, x0:x1] |= upd
    return rgb, alpha


def render_eval_views(
    verts: np.ndarray,
    faces: np.ndarray,
    colors: np.ndarray | None = None,
    res: int = 256,
    normalize: bool = True,
) -> np.ndarray:
    """[24, res, res, 3] renders of the eval protocol."""
    v = normalize_to_unit_box(verts, 0.8) if normalize else verts
    c = colors if colors is not None else np.full((len(v), 3), 0.7, np.float32)
    out = []
    for K, w2c in eval_cameras(res):
        rgb, _ = rasterize(v, faces, c, K, w2c, res)
        out.append(rgb)
    return np.stack(out)


def blender_command(mesh_path: str, out_dir: str) -> list[str]:
    """The BlenderProc invocation equivalent to launch_render_eval.py (use
    when blenderproc + Blender are installed on the eval host)."""
    return [
        "blenderproc", "run", "render_eval.py",
        "--object_path", mesh_path, "--output_dir", out_dir,
        "--camera_dist", str(EVAL_CAM_DIST), "--resolution", str(EVAL_RES),
    ]
