"""NeuS renderer math tests with an analytic sphere SDF (no networks)."""

import jax
import jax.numpy as jnp
import numpy as np

from one2345_tpu.recon.renderer import (
    RenderParams,
    cat_and_sort_z,
    render_rays,
    up_sample_z,
)


def _sphere_sdf(pts):
    r = jnp.linalg.norm(pts, axis=-1, keepdims=True)
    return r - 0.5, jnp.zeros(pts.shape[:-1] + (16,))


def _sphere_sdf_grad(pts):
    sdf, feat = _sphere_sdf(pts)
    g = pts / (jnp.linalg.norm(pts, axis=-1, keepdims=True) + 1e-9)
    return sdf, feat, g


def _const_color_net(geo, rgb, rd, mask):
    Nr, Ns = geo.shape[:2]
    return 0.5 * jnp.ones((Nr, Ns, 3)), jnp.ones((Nr, 1), bool)


def _scene(n_rays=4):
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, 1.5]]), (n_rays, 1))
    # slight angular spread, all hitting the sphere
    th = jnp.linspace(-0.05, 0.05, n_rays)
    rays_d = jnp.stack([jnp.sin(th), jnp.zeros_like(th), -jnp.cos(th)], axis=-1)
    V = 2
    return dict(
        rays_o=rays_o,
        rays_d=rays_d,
        near=jnp.asarray(0.5),
        far=jnp.asarray(2.5),
        volume=jnp.zeros((4, 4, 4, 16)),
        mask_volume=jnp.ones((4, 4, 4, 1)),
        feature_maps=jnp.zeros((V, 16, 16, 56)),
        color_maps=jnp.zeros((V, 16, 16, 3)),
        w2cs=jnp.tile(jnp.eye(4)[None], (V, 1, 1)),
        intrinsics=jnp.tile(jnp.eye(3)[None], (V, 1, 1)),
        size_hw=(16, 16),
        query_cam_center=jnp.array([0.0, 0.0, 1.5]),
    )


def test_up_sample_concentrates_near_surface():
    s = _scene(1)
    z = jnp.linspace(0.5, 2.5, 32)[None]
    pts = s["rays_o"][:1, None] + s["rays_d"][:1, None] * z[..., None]
    sdf, _ = _sphere_sdf(pts.reshape(-1, 3))
    sdf = sdf.reshape(1, 32)
    new_z = up_sample_z(z, sdf, jnp.ones_like(sdf), 16, 64.0)
    # importance samples land near the first surface crossing (z = 1.0)
    d = np.asarray(new_z[0])
    assert (np.abs(d - 1.0) < 0.3).mean() > 0.5


def test_cat_and_sort():
    z = jnp.array([[1.0, 3.0]])
    s = jnp.array([[10.0, 30.0]])
    z2 = jnp.array([[2.0, 0.5]])
    s2 = jnp.array([[20.0, 5.0]])
    zs, ss = cat_and_sort_z(z, s, z2, s2)
    np.testing.assert_allclose(np.asarray(zs[0]), [0.5, 1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(ss[0]), [5.0, 10.0, 20.0, 30.0])


def test_render_sphere_depth_and_weights():
    s = _scene(4)
    out = render_rays(
        _sphere_sdf,
        _sphere_sdf_grad,
        _const_color_net,
        jnp.asarray(2000.0),
        s["rays_o"],
        s["rays_d"],
        s["near"],
        s["far"],
        s["volume"],
        s["mask_volume"],
        s["feature_maps"],
        s["color_maps"],
        s["w2cs"],
        s["intrinsics"],
        s["size_hw"],
        s["query_cam_center"],
        RenderParams(n_samples=32, n_importance=32, background_rgb=1.0),
    )
    depth = np.asarray(out["depth"][:, 0])
    # sphere hit at t ~= 1.0 (camera at 1.5, radius 0.5)
    np.testing.assert_allclose(depth, 1.0, atol=0.05)
    # opaque surface: weights sum ~ 1
    np.testing.assert_allclose(np.asarray(out["weights_sum"][:, 0]), 1.0, atol=0.05)
    # exact unit-norm gradients -> eikonal ~ 0
    assert float(out["gradient_error_fine"]) < 1e-4
    # color = 0.5 blend (+ no background leak)
    np.testing.assert_allclose(np.asarray(out["color_fine"]), 0.5, atol=0.05)


def _dirsens_color_net(geo, rgb, rd, mask):
    """Color net whose output depends ONLY on the ray-diff features, so a
    change in the blending query direction (ray2tar) changes the color."""
    Nr, Ns = geo.shape[:2]
    c = jnp.mean(rd, axis=(0, 3))  # [Nr, Ns]
    return jnp.stack([c, c, c], axis=-1), jnp.ones((Nr, 1), bool)


def test_normal_query_prob_mixes_query_direction():
    """RenderParams.normal_query_prob: 0.0 (default) must be bit-identical
    to the reference regime (direction-to-camera queries) with or without a
    key; 1.0 must swap the query to the surface normal — changing blended
    color on geometry where normal != camera direction — while leaving the
    geometry outputs (depth, weights) untouched, and be key-deterministic."""
    s = _scene(4)
    # off-axis query camera: rays hit the sphere near (0,0,0.5) where the
    # normal ~ +z, while direction-to-camera ~ +x — maximally distinct
    qc = jnp.array([1.5, 0.0, 0.5])

    def run(params, key=None):
        return render_rays(
            _sphere_sdf,
            _sphere_sdf_grad,
            _dirsens_color_net,
            jnp.asarray(2000.0),
            s["rays_o"],
            s["rays_d"],
            s["near"],
            s["far"],
            s["volume"],
            s["mask_volume"],
            s["feature_maps"],
            s["color_maps"],
            s["w2cs"],
            s["intrinsics"],
            s["size_hw"],
            qc,
            params,
            key=key,
        )

    base = RenderParams(n_samples=32, n_importance=32, background_rgb=1.0)
    key = jax.random.key(7)
    out_ref = run(base)
    out_p0 = run(base, key=key)
    out_p1 = run(base._replace(normal_query_prob=1.0), key=key)
    out_p1b = run(base._replace(normal_query_prob=1.0), key=key)

    # prob=0.0 is the reference regime, key or not — bit identical
    np.testing.assert_array_equal(
        np.asarray(out_ref["color_fine"]), np.asarray(out_p0["color_fine"])
    )
    # key-deterministic
    np.testing.assert_array_equal(
        np.asarray(out_p1["color_fine"]), np.asarray(out_p1b["color_fine"])
    )
    # normal queries change the blend input -> color moves
    dc = np.abs(
        np.asarray(out_p1["color_fine"]) - np.asarray(out_p0["color_fine"])
    ).max()
    assert dc > 1e-3, f"normal-query path did not alter ray_diff colors ({dc=})"
    # ...but never the geometry
    np.testing.assert_allclose(
        np.asarray(out_p1["depth"]), np.asarray(out_p0["depth"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_p1["weights_sum"]), np.asarray(out_p0["weights_sum"]),
        atol=1e-6,
    )


def test_render_miss_is_background():
    s = _scene(2)
    rays_d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (2, 1))  # miss the sphere
    out = render_rays(
        _sphere_sdf,
        _sphere_sdf_grad,
        _const_color_net,
        jnp.asarray(2000.0),
        s["rays_o"],
        rays_d,
        s["near"],
        s["far"],
        s["volume"],
        s["mask_volume"],
        s["feature_maps"],
        s["color_maps"],
        s["w2cs"],
        s["intrinsics"],
        s["size_hw"],
        s["query_cam_center"],
        RenderParams(n_samples=32, n_importance=32, background_rgb=1.0),
    )
    np.testing.assert_allclose(np.asarray(out["weights_sum"][:, 0]), 0.0, atol=0.02)
    np.testing.assert_allclose(np.asarray(out["color_fine"]), 1.0, atol=0.05)
