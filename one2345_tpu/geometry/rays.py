"""Ray generation (world space), matching reconstruction/models/rays.py.

All functions are pure and jittable; image layout is channels-last [H, W, C].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rays_from_camera(
    H: int, W: int, intrinsic: jnp.ndarray, c2w: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full-image pixel rays in world space.

    Mirrors gen_rays_from_single_image (models/rays.py:11-56): pixel centers
    at integer coords, directions normalized in camera space then rotated.
    Returns (rays_o [H*W, 3], rays_d [H*W, 3]).
    """
    ys, xs = jnp.meshgrid(
        jnp.linspace(0.0, H - 1.0, H), jnp.linspace(0.0, W - 1.0, W), indexing="ij"
    )
    p = jnp.stack([xs, ys, jnp.ones_like(ys)], axis=-1).reshape(-1, 3)  # [N,3]
    K_inv = jnp.linalg.inv(intrinsic)
    p = p @ K_inv[:3, :3].T
    rays_v = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    rays_v = rays_v @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_v.shape)
    return rays_o, rays_v


def random_rays_from_image(
    key: jax.Array,
    N_rays: int,
    image: jnp.ndarray,
    intrinsic: jnp.ndarray,
    c2w: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    fg_fraction: float = 0.5,
    depth: jnp.ndarray | None = None,
) -> dict:
    """Random training rays with optional foreground-importance sampling.

    A fixed-shape variant of gen_random_rays_from_single_image
    (models/rays.py:57-157): when ``mask`` is given, ~``fg_fraction`` of rays
    are drawn from foreground pixels via categorical sampling over the mask
    (instead of the reference's dynamic nonzero indexing).

    :param image: [H, W, 3]; :param mask: [H, W] in {0,1}; :param depth: [H, W]
    """
    H, W = image.shape[0], image.shape[1]
    n_px = H * W
    k_fg, k_bg, k_uni = jax.random.split(key, 3)

    if mask is not None:
        flat_mask = mask.reshape(-1).astype(jnp.float32)
        n_fg = int(N_rays * fg_fraction)
        n_bg = N_rays - n_fg
        # categorical over (possibly empty) fg/bg sets; fall back to uniform
        fg_logits = jnp.where(flat_mask > 0.5, 0.0, -1e9)
        bg_logits = jnp.where(flat_mask > 0.5, -1e9, 0.0)
        any_fg = jnp.any(flat_mask > 0.5)
        any_bg = jnp.any(flat_mask <= 0.5)
        uni = jax.random.randint(k_uni, (N_rays,), 0, n_px)
        fg_idx = jnp.where(
            any_fg, jax.random.categorical(k_fg, fg_logits, shape=(n_fg,)), uni[:n_fg]
        )
        bg_idx = jnp.where(
            any_bg, jax.random.categorical(k_bg, bg_logits, shape=(n_bg,)), uni[n_fg:]
        )
        idx = jnp.concatenate([fg_idx, bg_idx])
    else:
        idx = jax.random.randint(k_uni, (N_rays,), 0, n_px)

    rays_o, rays_v = rays_from_camera(H, W, intrinsic, c2w)
    sample = {
        "rays_o": rays_o[idx],
        "rays_v": rays_v[idx],
        "rays_color": image.reshape(-1, 3)[idx],
        "rays_mask": (
            mask.reshape(-1, 1)[idx] if mask is not None else jnp.ones((N_rays, 1))
        ),
    }
    if depth is not None:
        sample["rays_depth"] = depth.reshape(-1, 1)[idx]
    return sample
