"""World<->camera projection + multi-view feature fetching (pure JAX).

TPU-native re-design of the reference's cost-volume builder and per-sample
feature fetch:

- `project_points`    ~ the projection half of ops/back_project.py:5-69
- `back_project_features` ~ back_project_sparse_type (ops/back_project.py:5-86)
  but *dense and fixed-shape*: every voxel of the 96^3 lattice is processed
  with a validity mask instead of boolean-indexed sparse coords, so the whole
  thing is one big gather XLA can fuse (no dynamic shapes).
- `sample_features_from_maps` ~ render_utils.sample_ptsFeatures_from_featureMaps
  (models/render_utils.py:88-120) with the cam2pixel z-clamp semantics
  (ops/back_project.py:89-129).

All feature maps are channels-last [H, W, C] (TPU-friendly layout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from one2345_tpu.geometry.sampling import bilinear_sample


def project_points(
    pts: jnp.ndarray, proj: jnp.ndarray, z_clamp: float = 1e-6
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project world points through a 4x4 projection (K @ w2c).

    :param pts: [..., 3] world coordinates
    :param proj: [4, 4] projection matrix
    :return: (x_pix, y_pix, z) each [...]; z is the (signed) camera depth with
        non-negative values clamped to ``z_clamp`` before the divide, matching
        ops/back_project.py:55-59.
    """
    x = proj[0, 0] * pts[..., 0] + proj[0, 1] * pts[..., 1] + proj[0, 2] * pts[..., 2] + proj[0, 3]
    y = proj[1, 0] * pts[..., 0] + proj[1, 1] * pts[..., 1] + proj[1, 2] * pts[..., 2] + proj[1, 3]
    z = proj[2, 0] * pts[..., 0] + proj[2, 1] * pts[..., 1] + proj[2, 2] * pts[..., 2] + proj[2, 3]
    z_safe = jnp.where(z >= 0, jnp.maximum(z, z_clamp), z)
    return x / z_safe, y / z_safe, z


def back_project_features(
    pts: jnp.ndarray,
    feats: jnp.ndarray,
    projs: jnp.ndarray,
    size_hw: tuple[int, int] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fetch per-view features for a set of world points.

    :param pts: [N, 3] world points (voxel centers)
    :param feats: [V, H, W, C] per-view feature maps
    :param projs: [V, 4, 4] projection matrices (K @ w2c)
    :param size_hw: the (H, W) the projection matrices are calibrated for
        (defaults to the feature-map size)
    :return: (features [N, V, C], mask [N, V] bool) — mask true when the
        point lands inside the view frustum with positive depth.
    """
    H, W = feats.shape[1], feats.shape[2]
    sH, sW = size_hw if size_hw is not None else (H, W)

    def per_view(feat, proj):
        x, y, z = project_points(pts, proj)
        # normalized [-1,1] against the calibrated size
        gx = 2.0 * x / (sW - 1) - 1.0
        gy = 2.0 * y / (sH - 1) - 1.0
        mask = (jnp.abs(gx) <= 1.0) & (jnp.abs(gy) <= 1.0) & (z > 0)
        # rescale to the actual feature-map pixel grid
        px = (gx + 1.0) * 0.5 * (W - 1)
        py = (gy + 1.0) * 0.5 * (H - 1)
        f = bilinear_sample(feat, px, py, padding="zeros")
        return f, mask

    features, masks = jax.vmap(per_view)(feats, projs)  # [V, N, C], [V, N]
    return jnp.swapaxes(features, 0, 1), jnp.swapaxes(masks, 0, 1)


def frustum_mask(
    pts: jnp.ndarray,
    projs: jnp.ndarray,
    size_hw: tuple[int, int],
    min_visible_views: int = 2,
) -> jnp.ndarray:
    """[N] bool: point is inside >= ``min_visible_views`` view frusta.

    Mirrors the only_mask fast path + `sum > minimum_visible_views` culling in
    sparse_sdf_network.py:326-334 (minimum_visible_views=1 -> strictly more
    than 1 view, i.e. >= 2).
    """
    sH, sW = size_hw

    def per_view(proj):
        x, y, z = project_points(pts, proj)
        gx = 2.0 * x / (sW - 1) - 1.0
        gy = 2.0 * y / (sH - 1) - 1.0
        return (jnp.abs(gx) <= 1.0) & (jnp.abs(gy) <= 1.0) & (z > 0)

    masks = jax.vmap(per_view)(projs)  # [V, N]
    return jnp.sum(masks.astype(jnp.int32), axis=0) >= min_visible_views


def sample_features_from_maps(
    pts: jnp.ndarray,
    feats: jnp.ndarray,
    w2cs: jnp.ndarray,
    intrinsics: jnp.ndarray,
    size_hw: tuple[int, int],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-view bilinear fetch for render-time samples.

    :param pts: [N, 3]; :param feats: [V, H, W, C]; :param w2cs: [V, 4, 4];
    :param intrinsics: [V, 3, 3]
    :return: (features [V, N, C], mask [V, N])

    Matches sample_ptsFeatures_from_featureMaps + cam2pixel: depth is clamped
    to min 1e-3 (so points behind the camera project "somewhere" but are
    masked by the |grid|<1 test only — parity with back_project.py:110-121).
    """
    H, W = feats.shape[1], feats.shape[2]
    sH, sW = size_hw

    def per_view(feat, w2c, K):
        proj = K @ w2c[:3, :4]  # [3,4]
        x = proj[0, 0] * pts[..., 0] + proj[0, 1] * pts[..., 1] + proj[0, 2] * pts[..., 2] + proj[0, 3]
        y = proj[1, 0] * pts[..., 0] + proj[1, 1] * pts[..., 1] + proj[1, 2] * pts[..., 2] + proj[1, 3]
        z = proj[2, 0] * pts[..., 0] + proj[2, 1] * pts[..., 1] + proj[2, 2] * pts[..., 2] + proj[2, 3]
        z = jnp.maximum(z, 1e-3)
        gx = 2.0 * (x / z) / (sW - 1) - 1.0
        gy = 2.0 * (y / z) / (sH - 1) - 1.0
        mask = (jnp.abs(gx) < 1.0) & (jnp.abs(gy) < 1.0)
        # the reference pushes out-of-range coords to 2.0 ('zeros' padding);
        # the zero-padded bilinear tap handles that implicitly.
        px = (gx + 1.0) * 0.5 * (W - 1)
        py = (gy + 1.0) * 0.5 * (H - 1)
        f = bilinear_sample(feat, px, py, padding="zeros")
        return f, mask

    return jax.vmap(per_view)(feats, w2cs, intrinsics)


def aggregate_multiview_features(
    features: jnp.ndarray, masks: jnp.ndarray
) -> jnp.ndarray:
    """Variance+mean cost aggregation over the view axis.

    :param features: [N, V, C]; :param masks: [N, V] (0/1)
    :return: [N, 2C] — concat(variance, mean), matching
        sparse_sdf_network.py:221-250 exactly: the statistics divide by the
        *visible view count* but sum over all views (invalid views contribute
        their zero-padded features — a quirk kept for weight parity).
    """
    counts = jnp.sum(masks.astype(features.dtype), axis=1)  # [N]
    inv = 1.0 / (counts + 1e-5)
    vol_sum = jnp.sum(features, axis=1)  # [N, C]
    vol_sq_sum = jnp.sum(features**2, axis=1)
    mean = vol_sum * inv[:, None]
    var = vol_sq_sum * inv[:, None] - mean**2
    return jnp.concatenate([var, mean], axis=-1)
