"""Bilinear / trilinear sampling primitives (pure JAX, twice-differentiable).

The reference needs a hand-written autodiff-friendly trilinear sampler
(reconstruction/ops/grid_sampler.py:64-219) because PyTorch's F.grid_sample
lacks a clean double-backward, which the eikonal loss requires.  In JAX the
lerp-based samplers below are natively twice-differentiable, so
`jax.grad(jax.grad(...))` through them just works.

Conventions (matching torch.nn.functional.grid_sample with
align_corners=True): normalized coords g in [-1,1] map to pixel/voxel index
(g+1)/2*(size-1); `zeros` padding makes out-of-range samples contribute 0,
`border` clamps to the edge.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(g: jnp.ndarray, size: int) -> jnp.ndarray:
    return (g + 1.0) * 0.5 * (size - 1)


def bilinear_sample(
    image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, padding: str = "zeros"
) -> jnp.ndarray:
    """Sample ``image`` [H, W, C] at pixel coords (x, y) -> [..., C].

    ``x``/``y`` are *pixel* coordinates (align_corners=True convention:
    0..W-1 / 0..H-1).  Matches torch grid_sample bilinear semantics:
    out-of-range corner taps contribute zero ('zeros') or clamp ('border').
    """
    H, W = image.shape[0], image.shape[1]
    flat = image.reshape(H * W, -1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0

    def tap(ix, iy):
        ix_c = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iy_c = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        lin = iy_c * W + ix_c
        v = jnp.take(flat, lin.reshape(-1), axis=0).reshape(
            lin.shape + (flat.shape[-1],)
        )
        if padding == "zeros":
            ok = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
            v = v * ok[..., None].astype(image.dtype)
        return v

    w00 = ((1 - tx) * (1 - ty))[..., None].astype(image.dtype)
    w01 = (tx * (1 - ty))[..., None].astype(image.dtype)
    w10 = ((1 - tx) * ty)[..., None].astype(image.dtype)
    w11 = (tx * ty)[..., None].astype(image.dtype)
    return (
        tap(x0, y0) * w00
        + tap(x0 + 1, y0) * w01
        + tap(x0, y0 + 1) * w10
        + tap(x0 + 1, y0 + 1) * w11
    )


def bilinear_sample_normalized(
    image: jnp.ndarray, grid: jnp.ndarray, padding: str = "zeros"
) -> jnp.ndarray:
    """``grid`` [..., 2] holds (gx, gy) in [-1, 1]; image is [H, W, C]."""
    H, W = image.shape[0], image.shape[1]
    x = _unnormalize(grid[..., 0], W)
    y = _unnormalize(grid[..., 1], H)
    return bilinear_sample(image, x, y, padding=padding)


def trilinear_sample(
    volume: jnp.ndarray, pts: jnp.ndarray, padding: str = "zeros"
) -> jnp.ndarray:
    """Sample ``volume`` [X, Y, Z, C] at normalized pts [..., 3] in [-1, 1].

    pts[..., 0] indexes the X axis, [..., 1] Y, [..., 2] Z — i.e. the caller
    passes plain (x, y, z).  (The reference must flip xyz before calling
    grid_sample because torch's grid dim order is (W, H, D) innermost-first:
    models/render_utils.py:77-79, sparse_sdf_network.py:407-410.  With an
    explicit [X, Y, Z, C] layout no flip is needed.)

    TPU note: corner taps are ROW gathers on the flattened [X*Y*Z, C] matrix
    (jnp.take) — multi-axis advanced indexing lowers to a gather the TPU
    compiler handles pathologically (15-minute compiles / fusion-pass
    crashes were observed for the 3-D indexed form).
    """
    X, Y, Z = volume.shape[0], volume.shape[1], volume.shape[2]
    flat = volume.reshape(X * Y * Z, -1)
    fx = _unnormalize(pts[..., 0], X)
    fy = _unnormalize(pts[..., 1], Y)
    fz = _unnormalize(pts[..., 2], Z)
    x0, y0, z0 = jnp.floor(fx), jnp.floor(fy), jnp.floor(fz)
    tx, ty, tz = fx - x0, fy - y0, fz - z0

    def tap(ix, iy, iz):
        ix_c = jnp.clip(ix, 0, X - 1).astype(jnp.int32)
        iy_c = jnp.clip(iy, 0, Y - 1).astype(jnp.int32)
        iz_c = jnp.clip(iz, 0, Z - 1).astype(jnp.int32)
        lin = (ix_c * Y + iy_c) * Z + iz_c
        v = jnp.take(flat, lin.reshape(-1), axis=0).reshape(lin.shape + (flat.shape[-1],))
        if padding == "zeros":
            ok = (
                (ix >= 0) & (ix <= X - 1)
                & (iy >= 0) & (iy <= Y - 1)
                & (iz >= 0) & (iz <= Z - 1)
            )
            v = v * ok[..., None].astype(volume.dtype)
        return v

    out = 0.0
    for dx, wx in ((0, 1 - tx), (1, tx)):
        for dy, wy in ((0, 1 - ty), (1, ty)):
            for dz, wz in ((0, 1 - tz), (1, tz)):
                w = (wx * wy * wz)[..., None].astype(volume.dtype)
                out = out + tap(x0 + dx, y0 + dy, z0 + dz) * w
    return out


def nearest_sample_volume(volume: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour volume sampling (used for validity masks, matching
    F.grid_sample(mode='nearest') in sparse_neus_renderer.py:155-168)."""
    X, Y, Z = volume.shape[0], volume.shape[1], volume.shape[2]
    flat = volume.reshape(X * Y * Z, -1)
    ix = jnp.round(_unnormalize(pts[..., 0], X))
    iy = jnp.round(_unnormalize(pts[..., 1], Y))
    iz = jnp.round(_unnormalize(pts[..., 2], Z))
    ok = (
        (ix >= 0) & (ix <= X - 1) & (iy >= 0) & (iy <= Y - 1) & (iz >= 0) & (iz <= Z - 1)
    )
    ix = jnp.clip(ix, 0, X - 1).astype(jnp.int32)
    iy = jnp.clip(iy, 0, Y - 1).astype(jnp.int32)
    iz = jnp.clip(iz, 0, Z - 1).astype(jnp.int32)
    lin = (ix * Y + iy) * Z + iz
    v = jnp.take(flat, lin.reshape(-1), axis=0).reshape(lin.shape + (flat.shape[-1],))
    return v * ok[..., None].astype(volume.dtype)


def sample_pdf(
    bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int, key=None
) -> jnp.ndarray:
    """Inverse-CDF importance sampling along rays.

    :param bins: [N_rays, M] bin edges (z values)
    :param weights: [N_rays, M-1] or [N_rays, M] weights (reference passes M
        weights with M bins; the CDF then has M+1 entries — semantics kept
        from models/render_utils.py:8-51)
    :param n_samples: samples to draw per ray
    :param key: PRNG key for stratified jitter; deterministic mid-bin samples
        if None (det=True path of the reference).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [N, M+1]

    n_rays = cdf.shape[0]
    if key is None:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, (n_rays, n_samples))
    else:
        u = jax.random.uniform(key, (n_rays, n_samples))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    # bins has one fewer column than cdf; clamp indices into bins
    nb = bins.shape[-1]
    bins_g0 = jnp.take_along_axis(bins, jnp.minimum(below, nb - 1), axis=-1)
    bins_g1 = jnp.take_along_axis(bins, jnp.minimum(above, nb - 1), axis=-1)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)
