"""Auxiliary reconstruction losses + depth metric suite.

Parity targets: reconstruction/loss/depth_loss.py (masked L1, smoothness),
reconstruction/loss/depth_metric.py (abs-rel / sq-rel / rmse / delta
accuracies), reconstruction/loss/ncc.py (normalized cross-correlation patch
loss, finetune path).  All pure jittable functions.
"""

from __future__ import annotations

import jax.numpy as jnp


def depth_l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Masked L1; invalid GT (<0) excluded (depth_loss.py:6-29)."""
    valid = (gt > 0).astype(pred.dtype)
    return jnp.sum(jnp.abs(pred - gt) * valid) / (jnp.sum(valid) + 1e-8)


def depth_smooth_loss(depth: jnp.ndarray, image: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware first-order smoothness over a [H, W] depth map with [H, W, 3]
    guidance image (depth_loss.py DepthSmoothLoss semantics)."""
    dd_x = jnp.abs(depth[:, 1:] - depth[:, :-1])
    dd_y = jnp.abs(depth[1:, :] - depth[:-1, :])
    di_x = jnp.mean(jnp.abs(image[:, 1:] - image[:, :-1]), axis=-1)
    di_y = jnp.mean(jnp.abs(image[1:, :] - image[:-1, :]), axis=-1)
    return jnp.mean(dd_x * jnp.exp(-di_x)) + jnp.mean(dd_y * jnp.exp(-di_y))


def ncc_loss(patch_a: jnp.ndarray, patch_b: jnp.ndarray, mask=None) -> jnp.ndarray:
    """1 - NCC over patch pixels (loss/ncc.py:7-29).

    :param patch_a/b: [N, P, C] warped patches; :param mask: [N, P]
    """
    if mask is None:
        mask = jnp.ones(patch_a.shape[:2], patch_a.dtype)
    w = mask[..., None] / (jnp.sum(mask, axis=1, keepdims=True)[..., None] + 1e-8)
    mu_a = jnp.sum(patch_a * w, axis=1, keepdims=True)
    mu_b = jnp.sum(patch_b * w, axis=1, keepdims=True)
    va = patch_a - mu_a
    vb = patch_b - mu_b
    cov = jnp.sum(va * vb * w, axis=1)
    std = jnp.sqrt(
        jnp.sum(va**2 * w, axis=1) * jnp.sum(vb**2 * w, axis=1) + 1e-8
    )
    ncc = cov / std
    return jnp.mean(1.0 - jnp.clip(ncc, -1.0, 1.0))


def depth_metrics(pred: jnp.ndarray, gt: jnp.ndarray) -> dict:
    """Standard monocular-depth metric suite (depth_metric.py:4-204)."""
    valid = gt > 0
    n = jnp.sum(valid) + 1e-8
    p = jnp.where(valid, pred, 1.0)
    g = jnp.where(valid, gt, 1.0)
    err = p - g
    abs_rel = jnp.sum(jnp.where(valid, jnp.abs(err) / g, 0.0)) / n
    sq_rel = jnp.sum(jnp.where(valid, err**2 / g, 0.0)) / n
    rmse = jnp.sqrt(jnp.sum(jnp.where(valid, err**2, 0.0)) / n)
    rmse_log = jnp.sqrt(
        jnp.sum(jnp.where(valid, (jnp.log(jnp.maximum(p, 1e-8)) - jnp.log(g)) ** 2, 0.0)) / n
    )
    ratio = jnp.maximum(p / g, g / p)
    deltas = {
        f"delta_{i}": jnp.sum(jnp.where(valid, (ratio < 1.25**i).astype(jnp.float32), 0.0)) / n
        for i in (1, 2, 3)
    }
    return {
        "abs_rel": abs_rel,
        "sq_rel": sq_rel,
        "rmse": rmse,
        "rmse_log": rmse_log,
        **deltas,
    }
