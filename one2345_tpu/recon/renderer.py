"""Conditional NeuS volume renderer (fixed-shape, jit-friendly).

Parity target: reconstruction/models/sparse_neus_renderer.py
(SparseNeuSRenderer) + models/projector.py (Projector).  TPU re-design:

- the reference boolean-indexes valid samples (`pts[pts_mask_bool]`,
  render_core:216-236) producing dynamic shapes; here every sample is
  evaluated and masked — the SDF MLP is tiny, so dense evaluation is far
  cheaper than dynamic-shape recompilation;
- importance sampling (4 rounds of NeuS up-sampling, render:521-549) runs as
  a Python loop over fixed sizes inside jit (unrolled scan);
- the eikonal normals use `jax.grad` through the twice-differentiable
  trilinear sampler instead of autograd.grad(create_graph=True).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from one2345_tpu.geometry.sampling import (
    nearest_sample_volume,
    sample_pdf,
    trilinear_sample,
)


class RenderParams(NamedTuple):
    n_samples: int = 64
    n_importance: int = 64
    n_importance_rounds: int = 4
    perturb: bool = False
    alpha_inter_ratio: float = 0.0
    background_rgb: float | None = None  # scalar (white = 1.0)
    # Training-regime extension (off by default = reference semantics):
    # probability that a training ray queries the blending net with the
    # SURFACE NORMAL instead of the direction to the query camera.  The
    # mesh-coloring pass (ReconStage.color_chunk, replicating
    # compute_view_independent, projector.py:346-353) always queries with
    # normals — a direction distribution the reference trainer never
    # supervises.  For Lambertian appearance the observed pixel color is
    # direction-independent, so supervising normal-queried renders against
    # the same pixels is exact and puts the production color path
    # in-distribution (see docs/recon_quality.md).
    normal_query_prob: float = 0.0


def pts_mask_from_volume(pts: jnp.ndarray, mask_volume: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour occupancy lookup, [..., ] float
    (sparse_neus_renderer.py:154-168)."""
    m = nearest_sample_volume(mask_volume, pts)
    return m[..., 0]


def up_sample_z(
    z_vals: jnp.ndarray,
    sdf: jnp.ndarray,
    pts_mask: jnp.ndarray,
    n_importance: int,
    inv_variance: float,
) -> jnp.ndarray:
    """One round of NeuS slope-aware importance sampling
    (sparse_neus_renderer.py:73-115).

    :param z_vals: [N, S]; :param sdf: [N, S]; :param pts_mask: [N, S]
    """
    N, S = z_vals.shape
    seg_mask = pts_mask[:, :-1] * pts_mask[:, 1:]

    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    prev_z, next_z = z_vals[:, :-1], z_vals[:, 1:]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    dot_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)
    prev_dot = jnp.concatenate([jnp.zeros((N, 1)), dot_val[:, :-1]], axis=-1)
    dot_val = jnp.minimum(prev_dot, dot_val)
    dot_val = jnp.clip(dot_val, -10.0, 0.0) * seg_mask

    dist = next_z - prev_z
    prev_esti = mid_sdf - dot_val * dist * 0.5
    next_esti = mid_sdf + dot_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_variance)
    next_cdf = jax.nn.sigmoid(next_esti * inv_variance)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
    alpha = alpha * seg_mask

    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((N, 1)), 1.0 - alpha + 1e-7], axis=-1), axis=-1
    )[:, :-1]
    weights = alpha * trans
    return jax.lax.stop_gradient(sample_pdf(z_vals, weights, n_importance))


def cat_and_sort_z(z_vals, sdf, new_z_vals, new_sdf):
    """Merge + sort samples along the ray (cat_z_vals, renderer:117-151)."""
    z = jnp.concatenate([z_vals, new_z_vals], axis=-1)
    s = jnp.concatenate([sdf, new_sdf], axis=-1)
    order = jnp.argsort(z, axis=-1)
    return jnp.take_along_axis(z, order, axis=-1), jnp.take_along_axis(s, order, axis=-1)


def compute_ray_diff(pts_flat: jnp.ndarray, ray2tar: jnp.ndarray, support_c2ws: jnp.ndarray):
    """[V, N, 4] direction-difference features (projector.py:16-63).

    ``ray2tar`` [N, 3]: unit vectors toward the query camera (render path,
    compute_angle) or surface normals (mesh-color path,
    compute_angle_view_independent).
    """
    sup_centers = support_c2ws[:, :3, 3]  # [V, 3]
    r2s = sup_centers[:, None, :] - pts_flat[None, :, :]
    r2s = r2s / (jnp.linalg.norm(r2s, axis=-1, keepdims=True) + 1e-6)
    diff = ray2tar[None] - r2s
    diff_norm = jnp.linalg.norm(diff, axis=-1, keepdims=True)
    dot = jnp.sum(ray2tar[None] * r2s, axis=-1, keepdims=True)
    direction = diff / jnp.maximum(diff_norm, 1e-6)
    return jax.lax.stop_gradient(jnp.concatenate([direction, dot], axis=-1))


def projector_features(
    pts: jnp.ndarray,
    volume: jnp.ndarray,
    mask_volume: jnp.ndarray,
    feature_maps: jnp.ndarray,
    color_maps: jnp.ndarray,
    w2cs: jnp.ndarray,
    intrinsics: jnp.ndarray,
    size_hw: tuple[int, int],
    ray2tar: jnp.ndarray,
):
    """Per-sample features for the rendering network (Projector.compute,
    projector.py:99-229).

    :param pts: [N_rays, n_samples, 3] (normalized space)
    :param ray2tar: [N_rays*n_samples, 3]
    :return: (geo_feat [Nr,Ns,C], rgb_feat [V,Nr,Ns,3+F], ray_diff [V,Nr,Ns,4],
              mask [V,Nr,Ns])
    """
    from one2345_tpu.geometry.projection import sample_features_from_maps

    Nr, Ns, _ = pts.shape
    flat = pts.reshape(-1, 3)

    geo_feat = trilinear_sample(volume, flat, padding="zeros")
    in_cube = jnp.all(jnp.abs(flat) < 1.0, axis=-1)
    occ = trilinear_sample(mask_volume, flat, padding="zeros")[..., 0] > 0
    geo_mask = in_cube & occ

    both = jnp.concatenate([color_maps, feature_maps], axis=-1)
    feats, pmask = sample_features_from_maps(flat, both, w2cs, intrinsics, size_hw)

    c2ws = jnp.linalg.inv(w2cs)
    ray_diff = compute_ray_diff(flat, ray2tar, c2ws)

    final_mask = pmask & geo_mask[None]
    V = feats.shape[0]
    return (
        geo_feat.reshape(Nr, Ns, -1),
        feats.reshape(V, Nr, Ns, -1),
        ray_diff.reshape(V, Nr, Ns, 4),
        final_mask.reshape(V, Nr, Ns),
    )


def render_rays(
    sdf_fn,
    sdf_grad_fn,
    rendering_net_fn,
    inv_variance: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    volume: jnp.ndarray,
    mask_volume: jnp.ndarray,
    feature_maps: jnp.ndarray,
    color_maps: jnp.ndarray,
    w2cs: jnp.ndarray,
    intrinsics: jnp.ndarray,
    size_hw: tuple[int, int],
    query_cam_center: jnp.ndarray,
    params: RenderParams = RenderParams(),
    key: jax.Array | None = None,
    fitted_color_fn=None,
) -> dict:
    """Render a batch of rays (SparseNeuSRenderer.render + render_core,
    sparse_neus_renderer.py:171-635).

    ``sdf_fn(pts[N,3]) -> (sdf [N,1], feat [N,H])`` and ``sdf_grad_fn(pts) ->
    (sdf, feat, grad [N,3])`` close over the conditional volume; the
    rendering net closes over its params.

    ``fitted_color_fn(pts_flat, dirs_flat, feat_flat, grads_flat) ->
    [N_flat, 3]``: the per-shape fitted-rendering path (if_fitted_rendering,
    render_core:236-296) — replaces the generic projector + blending net.
    """
    N_rays = rays_o.shape[0]
    ns = params.n_samples
    sample_dist = jnp.mean((far - near) / ns)

    z_vals = jnp.linspace(0.0, 1.0, ns)[None, :]
    z_vals = near + (far - near) * z_vals
    z_vals = jnp.broadcast_to(z_vals, (N_rays, ns))

    if params.perturb and key is not None:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * t_rand

    # ---- importance sampling (no_grad in the reference; stop_gradient here)
    if params.n_importance > 0:
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        sdf, _ = sdf_fn(jax.lax.stop_gradient(pts.reshape(-1, 3)))
        sdf = jax.lax.stop_gradient(sdf).reshape(N_rays, ns)
        n_per_round = params.n_importance // params.n_importance_rounds
        for i in range(params.n_importance_rounds):
            pmask = pts_mask_from_volume(
                (rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]).reshape(-1, 3),
                mask_volume,
            ).reshape(z_vals.shape)
            new_z = up_sample_z(z_vals, sdf, pmask, n_per_round, 64 * 2**i)
            new_pts = rays_o[:, None, :] + rays_d[:, None, :] * new_z[..., None]
            new_mask = pts_mask_from_volume(new_pts.reshape(-1, 3), mask_volume)
            new_sdf, _ = sdf_fn(jax.lax.stop_gradient(new_pts.reshape(-1, 3)))
            new_sdf = jax.lax.stop_gradient(new_sdf)[:, 0]
            # masked-out new samples get sdf=100 (cat_z_vals, renderer:138-143)
            new_sdf = jnp.where(new_mask > 0, new_sdf, 100.0).reshape(new_z.shape)
            z_vals, sdf = cat_and_sort_z(z_vals, sdf, new_z, new_sdf)

    n_total = z_vals.shape[1]

    # ---- render core (sparse_neus_renderer.py:171-455)
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full((N_rays, 1), sample_dist)], axis=-1
    )
    mid_z = z_vals + dists * 0.5
    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., None]  # [N, S, 3]
    flat = pts.reshape(-1, 3)
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape).reshape(-1, 3)

    pts_mask = pts_mask_from_volume(flat, mask_volume).reshape(N_rays, n_total)
    pts_mask = jax.lax.stop_gradient(pts_mask)

    sdf, feat, gradients = sdf_grad_fn(flat)
    sdf = jnp.where(pts_mask.reshape(-1, 1) > 0, sdf, 100.0)
    feat = feat * pts_mask.reshape(-1, 1)
    gradients = gradients * pts_mask.reshape(-1, 1)

    # rendering network features
    if fitted_color_fn is not None:
        sampled_color = fitted_color_fn(flat, dirs, feat, gradients).reshape(
            N_rays, n_total, 3
        )
        rendering_valid_mask = jnp.ones((N_rays, 1), bool)
    else:
        ray2tar = query_cam_center[None, :] - flat
        ray2tar = ray2tar / (jnp.linalg.norm(ray2tar, axis=-1, keepdims=True) + 1e-6)
        if params.normal_query_prob > 0.0 and key is not None:
            # per-ray Bernoulli mix of camera directions and surface
            # normals (see RenderParams.normal_query_prob); normals at
            # masked samples are zero vectors, which those samples' masks
            # already exclude from the blend
            normals = gradients * jax.lax.rsqrt(
                jnp.sum(gradients**2, axis=-1, keepdims=True) + 1e-12
            )
            use_n = jax.random.bernoulli(
                jax.random.fold_in(key, 101),
                params.normal_query_prob,
                (N_rays, 1, 1),
            )
            use_n = jnp.broadcast_to(use_n, (N_rays, n_total, 1)).reshape(-1, 1)
            ray2tar = jnp.where(use_n, jax.lax.stop_gradient(normals), ray2tar)
        geo_feat, rgb_feat, ray_diff, ren_mask = projector_features(
            pts, volume, mask_volume, feature_maps, color_maps, w2cs, intrinsics,
            size_hw, ray2tar,
        )
        sampled_color, rendering_valid_mask = rendering_net_fn(
            geo_feat, rgb_feat, ray_diff, ren_mask
        )

    # ---- NeuS alpha compositing
    true_dot = jnp.sum(dirs * gradients, axis=-1, keepdims=True)
    air = params.alpha_inter_ratio
    iter_cos = -(
        jax.nn.relu(-true_dot * 0.5 + 0.5) * (1.0 - air) + jax.nn.relu(-true_dot) * air
    )
    iter_cos = iter_cos * pts_mask.reshape(-1, 1)

    d_half = jnp.clip(iter_cos, -10.0, 10.0) * dists.reshape(-1, 1) * 0.5
    prev_cdf = jax.nn.sigmoid((sdf - d_half) * inv_variance)
    next_cdf = jax.nn.sigmoid((sdf + d_half) * inv_variance)
    p = prev_cdf - next_cdf
    c = prev_cdf
    alpha = jnp.clip((p + 1e-5) / (c + 1e-5), 0.0, 1.0).reshape(N_rays, n_total)
    alpha = alpha * pts_mask

    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((N_rays, 1)), 1.0 - alpha + 1e-7], axis=-1), axis=-1
    )[:, :-1]
    weights = alpha * trans
    weights_sum = weights.sum(axis=-1, keepdims=True)

    color = jnp.sum(sampled_color * weights[:, :, None], axis=1)
    if params.background_rgb is not None:
        color = color + params.background_rgb * (1.0 - weights_sum)

    grad_res = gradients.reshape(N_rays, n_total, 3)
    # eps inside the sqrt: gradients are zeroed at masked samples and the
    # derivative of ||x|| at x=0 is NaN — the reference avoids this only
    # because its masked zeros are autograd constants (render_core:236-239)
    grad_norm = jnp.sqrt(jnp.sum(grad_res**2, axis=-1) + 1e-12)
    gradient_error = (grad_norm - 1.0) ** 2
    gradient_error = jnp.sum(pts_mask * gradient_error) / (jnp.sum(pts_mask) + 1e-5)

    depth = jnp.sum(mid_z * weights, axis=1, keepdims=True)
    depth_var = jnp.sum((mid_z - depth) ** 2 * weights, axis=-1, keepdims=True)

    return {
        "color_fine": color,
        "color_fine_mask": rendering_valid_mask,
        "depth": depth,
        "depth_variance": depth_var,
        "sdf": sdf.reshape(N_rays, n_total),
        "gradients": grad_res,
        "weights": weights,
        "weights_sum": weights_sum,
        "alpha_sum": alpha.sum(axis=-1, keepdims=True).mean(),
        "alpha_mean": alpha.mean(),
        "gradient_error_fine": gradient_error,
        "variance": 1.0 / inv_variance,
        "mid_z_vals": mid_z,
        "pts_mask": pts_mask,
    }
