"""In-env recon quality benchmark: train -> reconstruct -> CD/F-score vs GT.

The one piece of evidence that separates "the trainer's loss falls" from
"the framework produces correct 3D geometry" without real checkpoints:
render a KNOWN colored mesh to the production 32-view recon rig with the
in-tree rasterizer, train `ReconStage` from scratch on those posed views,
run the production `reconstruct()`, and score the mesh against the ground
truth with `eval/metrics` (Chamfer + F-score) plus vertex-color agreement.

Mirrors what the reference can demonstrate with ckpt_215000 via
validate_colored_mesh (reconstruction/models/trainer_generic.py:1309-1380),
substituting a synthetic-data overfit for the unavailable checkpoint.

    PYTHONPATH=/root/.axon_site:/root/repo python examples/recon_quality.py \
        [--steps 1500] [--res 128] [--vol 48] [--rays 512] [--json out.json]

Defaults are sized for the one-v5e TPU run (~10-20 min); the CI test
(tests/test_recon_quality.py) injects tiny values through run_benchmark().
"""

# allow `python examples/<name>.py` from the repo root without installing
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def make_gt_sphere(n_lat: int = 24, n_lon: int = 48, radius: float = 0.45):
    """UV sphere in the NORMALIZED recon frame (volume spans [-1,1]) with
    position-coded vertex colors c = 0.5 + 0.5 * p/|p| — every surface
    point's color is analytically known, so the color pass is checkable."""
    lat = np.linspace(0, np.pi, n_lat + 1)
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    verts = [(0.0, 0.0, radius)]
    for t in lat[1:-1]:
        for p in lon:
            verts.append((
                radius * np.sin(t) * np.cos(p),
                radius * np.sin(t) * np.sin(p),
                radius * np.cos(t),
            ))
    verts.append((0.0, 0.0, -radius))
    verts = np.asarray(verts, np.float32)

    faces = []
    # top cap
    for j in range(n_lon):
        faces.append((0, 1 + j, 1 + (j + 1) % n_lon))
    # bands
    for i in range(n_lat - 2):
        a = 1 + i * n_lon
        b = 1 + (i + 1) * n_lon
        for j in range(n_lon):
            j2 = (j + 1) % n_lon
            faces.append((a + j, b + j, b + j2))
            faces.append((a + j, b + j2, a + j2))
    # bottom cap
    last = len(verts) - 1
    a = 1 + (n_lat - 2) * n_lon
    for j in range(n_lon):
        faces.append((last, a + (j + 1) % n_lon, a + j))
    faces = np.asarray(faces, np.int32)

    colors = 0.5 + 0.5 * verts / np.linalg.norm(verts, axis=1, keepdims=True)
    return verts, faces, colors.astype(np.float32)


def make_gt_box(half_extents=(0.35, 0.25, 0.45), n: int = 10):
    """Axis-aligned ASYMMETRIC cuboid with n x n quads per face and the
    same direction-coded colors as the sphere.  Second benchmark shape:
    the SDF network's geometric init is a sphere by construction, so a
    cuboid (sharp edges, three distinct half-extents, flat faces) proves
    the pipeline learns geometry rather than riding the init prior."""
    hx, hy, hz = half_extents
    verts, faces = [], []
    lin = np.linspace(-1.0, 1.0, n + 1)

    def add_face(origin, du, dv):
        base = len(verts)
        for a in lin:
            for b in lin:
                verts.append(origin + a * du + b * dv)
        for i in range(n):
            for j in range(n):
                k = base + i * (n + 1) + j
                faces.append((k, k + n + 1, k + n + 2))
                faces.append((k, k + n + 2, k + 1))

    ex, ey, ez = (np.array([hx, 0, 0]), np.array([0, hy, 0]),
                  np.array([0, 0, hz]))
    add_face(ex, ey, ez)      # +x (winding is irrelevant: rasterizer is
    add_face(-ex, ez, ey)     # -x  two-sided and normals are re-oriented
    add_face(ey, ez, ex)      # +y  outward downstream)
    add_face(-ey, ex, ez)     # -y
    add_face(ez, ex, ey)      # +z
    add_face(-ez, ey, ex)     # -z
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    colors = 0.5 + 0.5 * verts / np.maximum(
        np.linalg.norm(verts, axis=1, keepdims=True), 1e-12)
    return verts, faces, colors.astype(np.float32)


def box_surface_distance(p: np.ndarray, half_extents=(0.35, 0.25, 0.45)):
    """|SDF| of the axis-aligned box at points p [N,3] (exact)."""
    q = np.abs(p) - np.asarray(half_extents, np.float32)
    outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
    inside = np.minimum(np.max(q, axis=-1), 0.0)
    return np.abs(outside + inside)


def scaled_camera_pack(polar_deg: float, res: int) -> dict:
    """build_recon_cameras pack rescaled from its native 256^2 frame to
    res^2 (intrinsics and affines rows 0-1 scale linearly with K)."""
    from one2345_tpu.geometry.cameras import build_recon_cameras

    pack = {k: (np.array(v) if isinstance(v, np.ndarray) else v)
            for k, v in build_recon_cameras(polar_deg).items()}
    s = res / 256.0
    pack["intrinsics"][:, :2] *= s
    pack["affines"][:, :2] *= s
    return pack


def render_views(verts, faces, colors, pack, res: int):
    """[33, res, res, 3] white-background renders of the GT mesh on the
    recon rig (view 0 = reference) + [33, res, res] alpha masks."""
    from one2345_tpu.eval.render_harness import rasterize

    imgs, alphas = [], []
    for i in range(pack["w2cs"].shape[0]):
        rgb, alpha = rasterize(
            verts, faces, colors, pack["intrinsics"][i], pack["w2cs"][i],
            res=res, shade=False,
        )
        imgs.append(rgb)
        alphas.append(alpha)
    return np.stack(imgs), np.stack(alphas)


def vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted per-vertex normals, oriented OUTWARD (away from the
    mesh centroid — exact for star-shaped surfaces like the GT sphere;
    marching-tets winding is not guaranteed consistent)."""
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)  # area-weighted face normals
    n = np.zeros_like(verts)
    for k in range(3):
        np.add.at(n, faces[:, k], fn)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    outward = verts - verts.mean(axis=0)
    flip = np.sum(n * outward, axis=1, keepdims=True) < 0
    return np.where(flip, -n, n)


def bestview_vertex_colors(verts, normals, images, w2cs, intrinsics):
    """Oracle vertex colors: bilinear-sample each vertex from its most
    face-on source view (max dot(normal, dir_to_camera)) — no network.

    Isolates geometry + projection accuracy from the learned blending:
    if the reconstructed surface sits on the GT surface and the projection
    math is right, these colors match the GT texture regardless of how
    well the toy-scale rendering network learned to blend.
    """
    V = images.shape[0]
    H, W = images.shape[1:3]
    cams = np.linalg.inv(w2cs)[:, :3, 3]  # [V,3]
    d = cams[:, None, :] - verts[None]  # [V,N,3]
    d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    best = np.argmax(np.sum(d * normals[None], axis=-1), axis=0)  # [N]

    p = np.einsum("nij,nj->ni", w2cs[best, :3, :3], verts) + w2cs[best, :3, 3]
    uv = np.einsum("nij,nj->ni", intrinsics[best], p)
    u = uv[:, 0] / np.maximum(uv[:, 2], 1e-6)
    v = uv[:, 1] / np.maximum(uv[:, 2], 1e-6)
    u = np.clip(u, 0.0, W - 1.001)
    v = np.clip(v, 0.0, H - 1.001)
    u0, v0 = u.astype(np.int64), v.astype(np.int64)
    fu, fv = (u - u0)[:, None], (v - v0)[:, None]
    c00 = images[best, v0, u0]
    c01 = images[best, v0, u0 + 1]
    c10 = images[best, v0 + 1, u0]
    c11 = images[best, v0 + 1, u0 + 1]
    return (c00 * (1 - fu) * (1 - fv) + c01 * fu * (1 - fv)
            + c10 * (1 - fu) * fv + c11 * fu * fv)


def held_out_view_psnr(stage, images_src, pack, gt_verts, gt_faces, gt_colors,
                       res: int, azimuth_deg: float = 22.5,
                       lod: int = 0) -> tuple[float, float]:
    """Render a camera pose NOT in the training rig through the production
    Validator path and score PSNR against the rasterized GT at that pose —
    the novel-view generalization check (val_step protocol,
    trainer_generic.py:359-475, on a held-out query pose).

    Returns (full-frame PSNR, object-masked PSNR).  The masked variant
    scores only pixels where the GT object projects: the full frame is
    dominated by the UNOBSERVABLE shell outside the camera ring (junk
    there occludes the background from novel poses until the SDF prior
    settles, which short CI schedules don't reach), while the object
    region is covered by training rays and must be right at any scale.

    The held-out rays are CLIPPED to the observable ball |p| < 0.8 — the
    same region the *_obs geometry metrics score.  Without the clip,
    unobservable-shell junk sits between the novel camera and the object
    (the rig cameras are at radius ~0.86, the shell right behind them)
    and occludes the object region at short schedules, so the masked gate
    would measure SDF-prior settling instead of learning (measured: at
    300 CPU steps the trained-but-occluded render scored 8.8 dB masked vs
    12.1 for the untrained geometric-init sphere's clean gray render)."""
    from one2345_tpu.eval.render_harness import rasterize
    from one2345_tpu.recon.validation import Validator

    a = np.radians(azimuth_deg)
    rz = np.array([
        [np.cos(a), -np.sin(a), 0, 0],
        [np.sin(a), np.cos(a), 0, 0],
        [0, 0, 1, 0],
        [0, 0, 0, 1],
    ], np.float32)
    c2w_h = rz @ pack["c2ws"][0]
    w2c_h = np.linalg.inv(c2w_h).astype(np.float32)

    pack_h = dict(pack)
    pack_h["c2ws"] = np.concatenate([c2w_h[None], pack["c2ws"][1:]])
    pack_h["w2cs"] = np.concatenate([w2c_h[None], pack["w2cs"][1:]])
    cam_dist = float(np.linalg.norm(c2w_h[:3, 3]))
    nf = np.array(pack["near_fars"], np.float32).copy()
    nf[0] = (max(cam_dist - 0.8, 0.05), cam_dist + 0.8)
    pack_h["near_fars"] = nf

    gt_rgb, gt_alpha = rasterize(
        gt_verts, gt_faces, gt_colors, pack["intrinsics"][0], w2c_h,
        res=res, shade=False,
    )
    out = Validator(stage).render_view(
        images_src, pack_h, view_idx=0, H=res, W=res, lod=lod)
    full = float(Validator.psnr(out["color"], gt_rgb))
    m = np.asarray(gt_alpha) > 0.5
    mse = float(np.mean((np.asarray(out["color"])[m] - gt_rgb[m]) ** 2))
    masked = float(-10.0 * np.log10(max(mse, 1e-10)))
    return full, masked


def run_finetune_phase(
    stage, images, alphas, pack, ft_steps: int, n_rays: int,
    mesh_resolution: int, seed: int, gt_verts, gt_faces, surf_dist_fn,
    log_every: int = 100,
) -> dict:
    """Per-shape finetune on top of the trained stage (the reference's `-ft`
    mode, sparse_sdf_network.py:548-781 + trainer's finetune branch):
    the conditional volume itself becomes the optimized parameter, the SDF
    MLP warm-starts from the stage, and a fresh BlendingRenderingNetwork
    learns per-view blending.  Re-extracts the mesh from the finetuned
    field and re-scores geometry + blend-net colors, so the benchmark shows
    the finetune stage REFINES a real reconstruction (not merely that its
    loss falls on a toy scene, which tests/test_finetune.py already gates).

    :param images: [33, res, res, 3] rig renders (view 0 = reference view)
    :param pack: normalized-frame camera pack (no scale/trans mats)
    """
    import jax
    import jax.numpy as jnp

    from one2345_tpu.eval.metrics import chamfer_distance, f_score, sample_surface
    from one2345_tpu.geometry.rays import random_rays_from_image
    from one2345_tpu.recon import mesh_extract
    from one2345_tpu.recon.finetune import FinetuneTrainer, pixel_warp
    from one2345_tpu.recon.sdf_network import SdfVolumeNetwork

    t0 = time.perf_counter()
    cfg = stage.config
    res = images.shape[1]
    src_imgs = jnp.asarray(images[1:])
    src_w2cs = jnp.asarray(pack["w2cs"][1:])
    src_intr = jnp.asarray(pack["intrinsics"][1:])

    # conditional volume at the trained weights (reconstruct()'s own first
    # two stages — the finetune optimizes THIS volume)
    feats = stage.feature_maps(stage.params, src_imgs)
    vol_out = stage.conditional_volume(
        stage.params, feats, jnp.asarray(pack["affines"][1:])
    )
    volume, mask_volume = vol_out["volume"], vol_out["mask"]

    ft = FinetuneTrainer(stage, lr=5e-4)
    fstate = ft.init_state(volume, mask_volume, jax.random.key(seed + 101))

    imgs_dev = jnp.asarray(images)
    masks = jnp.asarray(alphas, jnp.float32)
    Ks_dev = jnp.asarray(pack["intrinsics"])
    c2ws_dev = jnp.asarray(pack["c2ws"])
    nf_dev = jnp.asarray(pack["near_fars"], jnp.float32)
    sample_rays = jax.jit(
        lambda k, img, mask, K, c2w: random_rays_from_image(
            k, n_rays, img, K, c2w, mask=mask
        )
    )

    key = jax.random.key(seed + 7)
    n_views = imgs_dev.shape[0]
    losses = []
    for i in range(ft_steps):
        k_ray, k_step = jax.random.split(jax.random.fold_in(key, i))
        v = i % n_views
        rays = sample_rays(k_ray, imgs_dev[v], masks[v], Ks_dev[v], c2ws_dev[v])
        scene = {
            "rays_o": rays["rays_o"], "rays_v": rays["rays_v"],
            "rays_color": rays["rays_color"], "near_far": nf_dev[v],
            "images": src_imgs, "w2cs": src_w2cs, "intrinsics": src_intr,
        }
        fstate, metrics = ft.train_step(fstate, mask_volume, scene, k_step)
        if i % log_every == 0 or i == ft_steps - 1:
            c = float(metrics["color"])
            losses.append(c)
            print(f"ft step {i:5d}  color {c:.4f}  loss {float(metrics['loss']):.4f}",
                  flush=True)
            if not np.isfinite(c):
                raise RuntimeError(f"finetune diverged at step {i}")

    # mesh from the finetuned field: stage params with the finetuned
    # sdf_layer swapped in, evaluated on the finetuned volume
    params_ft = dict(stage.params)
    params_ft["sdf"] = {
        "params": {
            **stage.params["sdf"]["params"],
            "sdf_layer": fstate.sdf_params["params"],
        }
    }
    vol_ft = fstate.volume * mask_volume
    field_fn = jax.jit(lambda p, v: stage.field_grid(p, v, mesh_resolution))
    u = np.asarray(field_fn(params_ft, vol_ft), np.float32)
    verts_grid, faces = mesh_extract.marching_tetrahedra(u, cfg.mesh_threshold)
    pv = mesh_extract.grid_to_world(
        verts_grid, (-1, -1, -1), (1, 1, 1), mesh_resolution)

    out = {
        "ft_steps": ft_steps,
        "ft_color_first": round(losses[0], 4),
        "ft_color_last": round(losses[-1], 4),
        "ft_pred_verts": int(len(pv)),
    }
    if len(pv) and len(faces):
        pp = sample_surface(pv, faces, 16384, seed=0)
        gp = sample_surface(gt_verts, gt_faces, 16384, seed=1)
        out["ft_chamfer_l1"] = round(
            float(chamfer_distance(pp, gp, squared=False)), 5)
        out["ft_f_score_05"] = round(float(f_score(pp, gp, 0.05)), 4)
        out["ft_f_score_10"] = round(float(f_score(pp, gp, 0.10)), 4)
        obs = np.linalg.norm(pp, axis=1) < 0.8
        out["ft_junk_frac"] = round(float(1.0 - obs.mean()), 4)
        if obs.sum() > 256:
            out["ft_chamfer_l1_obs"] = round(
                float(chamfer_distance(pp[obs], gp, squared=False)), 5)
            out["ft_f_score_10_obs"] = round(float(f_score(pp[obs], gp, 0.10)), 4)

        # colors through the FINETUNED blending net (validate_colored_mesh's
        # finetune branch): normals from the finetuned SDF, per-view pixel
        # colors warped onto the surface, blend weights from the net
        near = surf_dist_fn(pv) < 0.05
        if near.sum() > 100:
            pts_near = pv[near]
            H = W = res

            @jax.jit
            def color_chunk_ft(pts):
                s, feat, grads = stage.sdf_net.apply(
                    params_ft["sdf"], pts, vol_ft,
                    method=SdfVolumeNetwork.sdf_and_gradient,
                )
                nrm = grads / jnp.sqrt(
                    jnp.sum(grads**2, axis=-1, keepdims=True) + 1e-12)
                pix_c, pix_m = pixel_warp(pts, src_imgs, src_w2cs, src_intr, (H, W))
                color, ok, _, _ = ft.blend_net.apply(
                    fstate.blend_params, pts, nrm, nrm, feat,
                    pix_c, pix_m.astype(jnp.float32),
                )
                return color

            chunk = 8192
            padded = int(np.ceil(len(pts_near) / chunk) * chunk)
            pad_pts = np.zeros((padded, 3), np.float32)
            pad_pts[: len(pts_near)] = pts_near
            cols = [
                color_chunk_ft(jnp.asarray(pad_pts[i : i + chunk]))
                for i in range(0, padded, chunk)
            ]
            pc = np.asarray(
                cols[0] if len(cols) == 1 else jnp.concatenate(cols), np.float32
            )[: len(pts_near)]
            rn = np.linalg.norm(pts_near, axis=1, keepdims=True)
            want = 0.5 + 0.5 * pts_near / np.maximum(rn, 1e-6)
            out["ft_color_mae"] = round(float(np.abs(pc - want).mean()), 4)
    out["ft_secs"] = round(time.perf_counter() - t0, 1)
    return out


def run_benchmark(
    steps: int = 1500,
    res: int = 128,
    vol: int = 48,
    n_rays: int = 512,
    n_samples: int = 48,
    n_importance: int = 48,
    lr: float = 1e-3,
    mesh_resolution: int = 128,
    seed: int = 0,
    log_every: int = 100,
    radius: float = 0.45,
    sphere_lat: int = 24,
    sphere_lon: int = 48,
    out_ply: str | None = None,
    ft_steps: int = 0,
    num_lods: int = 1,
    shape: str = "sphere",
    normal_query_prob: float = 0.0,
) -> dict:
    import jax
    import jax.numpy as jnp

    from one2345_tpu.core.config import ReconConfig
    from one2345_tpu.eval.metrics import chamfer_distance, f_score, sample_surface
    from one2345_tpu.geometry.rays import random_rays_from_image
    from one2345_tpu.recon.pipeline import ReconStage
    from one2345_tpu.training.recon_trainer import ReconTrainer

    t_all = time.perf_counter()
    if shape == "sphere":
        gt_verts, gt_faces, gt_colors = make_gt_sphere(
            sphere_lat, sphere_lon, radius)
        surf_dist_fn = lambda p: np.abs(np.linalg.norm(p, axis=1) - radius)
    elif shape == "box":
        gt_verts, gt_faces, gt_colors = make_gt_box()
        surf_dist_fn = box_surface_distance
    else:
        raise ValueError(f"unknown shape {shape!r}")
    pack = scaled_camera_pack(90.0, res)
    images, alphas = render_views(gt_verts, gt_faces, gt_colors, pack, res)
    print(f"data: 33 x {res}^2 renders of a {len(gt_verts)}-vert {shape} "
          f"({time.perf_counter() - t_all:.1f}s)", flush=True)

    lod_extra = {}
    if num_lods > 1:
        # coarse-to-fine: fine lattice at 2x the coarse dims (the
        # production ratio is 96 -> 192), lod1 anneal scaled like lod0's
        assert ft_steps == 0, "the finetune phase is a lod0 flow"
        lod_extra = dict(
            num_lods=2,
            lod1_vol_dims=(2 * vol, 2 * vol, 2 * vol),
            lod1_voxel_size=2.0 / (2 * vol - 1),
            anneal_end_lod1=max(steps // 3, 1),
        )
    cfg = ReconConfig(
        image_hw=(res, res), vol_dims=(vol, vol, vol),
        voxel_size=2.0 / (vol - 1), n_rays=n_rays,
        n_samples=n_samples, n_importance=n_importance,
        learning_rate=lr, anneal_end=max(steps // 3, 1),
        end_iter=steps, mesh_resolution=mesh_resolution,
        # the reference gates its mask loss at 50k iters (of 200k); scale
        # the gate to this short schedule so background rays constrain
        # floaters (weights_sum -> 0 off-object) within the run
        fg_bg_gate_iter=max(steps // 10, 1),
        normal_query_prob=normal_query_prob,
        **lod_extra,
    )
    stage = ReconStage(cfg, seed=seed)
    trainer = ReconTrainer(stage, cfg)
    state = trainer.init_state()

    pack_nm = {k: v for k, v in pack.items() if k not in ("scale_mat", "trans_mat")}
    # random-init held-out renders FIRST: the CI novel-view gate is
    # RELATIVE on the OBJECT-MASKED score (trained must beat untrained by
    # a clear margin).  Absolute full-frame dB at toy scale is
    # backend-dependent (same config/seed: 16.1 TPU vs 8.8 CPU at 300
    # steps) and the untrained geometric-init SDF — a sphere by
    # construction — renders a plausible blob that scores 12.0 full-frame,
    # so only the masked trained-vs-untrained delta is a stable learning
    # signal.  FOUR held-out azimuths, not one: the per-pose margin at
    # short CPU schedules is noisy (single-pose margins 0.7-7 dB across
    # backends at the same config/seed), the 4-pose mean is the gate.
    fine_lod = 1 if num_lods > 1 else 0
    heldout_az = (22.5, 120.0, 200.0, 292.5)
    ho_rand = [held_out_view_psnr(
        stage, images[1:], pack_nm, gt_verts, gt_faces, gt_colors, res=res,
        azimuth_deg=az, lod=fine_lod,
    ) for az in heldout_az]
    psnr_heldout_random = float(np.mean([h[0] for h in ho_rand]))
    psnr_heldout_masked_random = float(np.mean([h[1] for h in ho_rand]))

    imgs_dev = jnp.asarray(images)
    # source set = images[1:]: mirror the production 32-source contract
    # (reconstruct() and held_out_view_psnr condition on images[1:]; view 0
    # is the query-only view and must not leak into the source volume)
    scene_const = {
        "images": imgs_dev[1:][None],
        "affines": jnp.asarray(pack["affines"][1:])[None],
        "w2cs": jnp.asarray(pack["w2cs"][1:])[None],
        "intrinsics": jnp.asarray(pack["intrinsics"][1:])[None],
        "near_far": jnp.asarray(pack["query_near_far"], jnp.float32)[None],
    }
    # supervision rays must come from MANY viewpoints: a single fixed
    # query view leaves depth unconstrained along its rays (measured:
    # PSNR 26 with F-score 0.08 — a billboard, not a sphere).  Cycle the
    # supervised view across all 33 rig cameras, as the reference's
    # per-iteration query-view sampling does.
    masks_dev = jnp.asarray(alphas, jnp.float32)
    Ks_dev = jnp.asarray(pack["intrinsics"])
    c2ws_dev = jnp.asarray(pack["c2ws"])
    nf_dev = jnp.asarray(pack["near_fars"], jnp.float32)

    sample_rays = jax.jit(
        lambda k, img, mask, K, c2w: random_rays_from_image(
            k, n_rays, img, K, c2w, mask=mask
        )
    )

    t_train = time.perf_counter()
    losses, psnrs = [], []
    key = jax.random.key(seed)
    n_views = imgs_dev.shape[0]
    for i in range(steps):
        k_ray, k_step = jax.random.split(jax.random.fold_in(key, i))
        v = i % n_views
        rays = sample_rays(k_ray, imgs_dev[v], masks_dev[v], Ks_dev[v], c2ws_dev[v])
        scene = dict(
            scene_const,
            near_far=nf_dev[v][None],
            rays_o=rays["rays_o"][None],
            rays_v=rays["rays_v"][None],
            rays_color=rays["rays_color"][None],
            rays_mask=rays["rays_mask"][None],
        )
        state, metrics = trainer.train_step(state, scene, k_step)
        if i % log_every == 0 or i == steps - 1:
            c = float(metrics["color_loss"])
            p = float(metrics["psnr"])
            losses.append(c)
            psnrs.append(p)
            print(f"step {i:5d}  color_loss {c:.4f}  psnr {p:.2f}", flush=True)
            if not np.isfinite(c):
                raise RuntimeError(f"loss diverged at step {i}")
    train_secs = time.perf_counter() - t_train

    # ---- production reconstruct() on the trained weights, in the
    # NORMALIZED frame (strip scale/trans so pred and GT share coordinates)
    stage_trained = ReconStage(cfg, params=trainer.stage_variables(state))
    recon = stage_trained.reconstruct(
        images[1:], pack_nm, resolution=mesh_resolution, out_path=out_ply
    )
    pv, pf, pc = recon["vertices"], recon["faces"], recon["colors"]
    print(f"reconstructed {len(pv)} verts / {len(pf)} faces", flush=True)

    out: dict = {
        "steps": steps, "res": res, "vol_dims": vol, "n_rays": n_rays,
        "num_lods": num_lods, "shape": shape,
        "normal_query_prob": normal_query_prob,
        "train_secs": round(train_secs, 1),
        "sec_per_step": round(train_secs / steps, 4),
        "psnr_first": round(psnrs[0], 2), "psnr_last": round(psnrs[-1], 2),
        "pred_verts": int(len(pv)),
    }
    if len(pv):
        # radius distribution of predicted vertices: for the sphere GT,
        # p10/p50/p90 near `radius` = clean surface, a wide spread =
        # floaters or scale error (diagnosis only for the box shape)
        r_all = np.linalg.norm(pv, axis=1)
        out["pred_radius_p10"] = round(float(np.percentile(r_all, 10)), 4)
        out["pred_radius_p50"] = round(float(np.percentile(r_all, 50)), 4)
        out["pred_radius_p90"] = round(float(np.percentile(r_all, 90)), 4)
    if len(pv) and len(pf):
        # both meshes live in the same normalized frame: score ABSOLUTE
        # distances (no per-mesh re-normalization that could mask scale
        # errors); tau=0.05 on a 0.9-diameter sphere matches the standard
        # protocol's scale
        pp = sample_surface(pv, pf, 16384, seed=0)
        gp = sample_surface(gt_verts, gt_faces, 16384, seed=1)
        out["chamfer_l1"] = round(float(chamfer_distance(pp, gp, squared=False)), 5)
        out["chamfer_l2"] = round(float(chamfer_distance(pp, gp, squared=True)), 6)
        out["f_score_05"] = round(float(f_score(pp, gp, 0.05)), 4)
        out["f_score_10"] = round(float(f_score(pp, gp, 0.10)), 4)
        # ---- observable-region metrics.  The rig's cameras sit at radius
        # ~0.86 in the normalized frame, so the shell beyond them is
        # geometrically unobservable (no training ray can reach it) and is
        # constrained only by the SDF prior, which short schedules haven't
        # settled.  Real objects (and the GT sphere) live well inside; the
        # full-scale run carves the shell clean (f_score_10 0.995 with NO
        # filtering), while the CI-sized config leaves prior-junk there.
        # junk_frac quantifies it; the *_obs metrics score the region the
        # rig can actually see.
        obs = np.linalg.norm(pp, axis=1) < 0.8
        out["junk_frac"] = round(float(1.0 - obs.mean()), 4)
        if obs.sum() > 256:
            out["chamfer_l1_obs"] = round(
                float(chamfer_distance(pp[obs], gp, squared=False)), 5)
            out["f_score_05_obs"] = round(float(f_score(pp[obs], gp, 0.05)), 4)
            out["f_score_10_obs"] = round(float(f_score(pp[obs], gp, 0.10)), 4)
        # color agreement at predicted vertices near the GT surface: the
        # analytic color field is c(p) = 0.5 + 0.5 * p/|p|
        near = surf_dist_fn(pv) < 0.05
        if near.sum() > 100:
            rn = np.linalg.norm(pv[near], axis=1, keepdims=True)
            want = 0.5 + 0.5 * pv[near] / np.maximum(rn, 1e-6)
            # production path (learned blending net fed surface normals —
            # the reference's compute_view_independent, projector.py:231-425).
            # At toy single-scene scale the blending net sees normals as an
            # out-of-distribution "query direction" and averages visible +
            # occluded views, so this saturates near the 0.25 gray floor;
            # with the real generalizable checkpoint it is the product path.
            out["color_mae"] = round(float(np.abs(pc[near] - want).mean()), 4)
            out["color_frac_scored"] = round(float(near.mean()), 3)
            # oracle: best-view projection of the SOURCE IMAGES onto the
            # predicted surface — no network, isolates geometry+projection
            vn = vertex_normals(pv, pf)
            oc = bestview_vertex_colors(
                pv[near], vn[near], images[1:],
                pack["w2cs"][1:], pack["intrinsics"][1:],
            )
            out["color_mae_bestview"] = round(float(np.abs(oc - want).mean()), 4)
        # novel-view generalization: render poses NOT in the training rig
        # through the production Validator path, PSNR vs the rasterized GT
        # (paired with the random-init renders of the same poses above);
        # reported values are 4-azimuth means, *_min the worst pose margin
        ho_tr = [held_out_view_psnr(
            stage_trained, images[1:], pack_nm, gt_verts, gt_faces,
            gt_colors, res=res, azimuth_deg=az, lod=fine_lod,
        ) for az in heldout_az]
        out["psnr_heldout"] = round(float(np.mean([h[0] for h in ho_tr])), 2)
        out["psnr_heldout_masked"] = round(
            float(np.mean([h[1] for h in ho_tr])), 2)
        out["psnr_heldout_random"] = round(psnr_heldout_random, 2)
        out["psnr_heldout_masked_random"] = round(psnr_heldout_masked_random, 2)
        out["heldout_margin_min"] = round(float(min(
            t[1] - r[1] for t, r in zip(ho_tr, ho_rand))), 2)
    if ft_steps > 0:
        out.update(run_finetune_phase(
            stage_trained, images, alphas, pack_nm, ft_steps, n_rays,
            mesh_resolution, seed, gt_verts, gt_faces, surf_dist_fn,
            log_every,
        ))
    out["total_secs"] = round(time.perf_counter() - t_all, 1)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--vol", type=int, default=48)
    p.add_argument("--rays", type=int, default=512)
    p.add_argument("--json", default=None)
    p.add_argument("--ply", default=None, help="save the reconstructed mesh")
    p.add_argument("--ft-steps", type=int, default=0,
                   help="per-shape finetune steps after recon (0 = off)")
    p.add_argument("--lods", type=int, default=1, choices=(1, 2),
                   help="2 = coarse-to-fine (lod1) training + reconstruction")
    p.add_argument("--shape", default="sphere", choices=("sphere", "box"),
                   help="GT shape (box = asymmetric cuboid, breaks the "
                        "sphere-init prior)")
    p.add_argument("--normal-query-prob", type=float, default=0.0,
                   help="fraction of training rays queried with surface "
                        "normals (the mesh-color pass's direction regime; "
                        "ReconConfig.normal_query_prob)")
    args = p.parse_args(argv)

    out = run_benchmark(steps=args.steps, res=args.res, vol=args.vol,
                        n_rays=args.rays, out_ply=args.ply,
                        ft_steps=args.ft_steps, num_lods=args.lods,
                        shape=args.shape,
                        normal_query_prob=args.normal_query_prob)
    print(json.dumps(out), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    _sys.exit(main())
