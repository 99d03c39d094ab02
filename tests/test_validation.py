"""Full-image validation renderer (val_step parity) on a tiny config."""

import numpy as np

from one2345_tpu.core.config import ReconConfig
from one2345_tpu.geometry import cameras as cam
from one2345_tpu.recon.pipeline import ReconStage
from one2345_tpu.recon.validation import Validator


def test_render_view_tiny():
    cfg = ReconConfig(
        image_hw=(32, 32), vol_dims=(16, 16, 16), voxel_size=2.0 / 15.0,
        n_samples=8, n_importance=8,
    )
    stage = ReconStage(cfg, seed=0)
    val = Validator(stage, n_rays_chunk=256)

    rng = np.random.default_rng(0)
    images = rng.uniform(size=(4, 32, 32, 3)).astype(np.float32)
    pack = cam.build_recon_cameras(45.0)
    sel = [0, 1, 2, 3, 4]
    cams = {}
    for k, v in pack.items():
        if isinstance(v, np.ndarray) and v.ndim >= 2 and len(v) >= 33:
            cams[k] = v[sel]
        else:
            cams[k] = v
    # rescale intrinsics from the 256-frame to 32^2
    cams["intrinsics"] = pack["intrinsics"][sel] / 8.0
    cams["intrinsics"][:, 2, 2] = 1.0
    aff = np.tile(np.eye(4, dtype=np.float32)[None], (5, 1, 1))
    aff[:, :3, :4] = np.einsum(
        "vij,vjk->vik", cams["intrinsics"], cams["w2cs"][:, :3, :4]
    )
    cams["affines"] = aff
    cams["near_fars"] = pack["near_fars"][sel]

    out = val.render_view(images, cams, view_idx=0, H=16, W=16)
    assert out["color"].shape == (16, 16, 3)
    assert out["depth"].shape == (16, 16)
    assert out["normal"].shape == (16, 16, 3)
    for v in out.values():
        assert np.isfinite(v).all()

    panel = Validator.panel(out, gt=np.zeros((16, 16, 3), np.float32))
    assert panel.shape == (16, 64, 3)
    p = Validator.psnr(out["color"], out["color"])
    assert p > 100  # identical images -> huge PSNR


def test_render_view_lod1():
    """val_step's num_lods=2 path: the fine-lod validation render uses the
    coarse-pruned volume on the separate lod1 networks."""
    cfg = ReconConfig(
        image_hw=(32, 32), vol_dims=(8, 8, 8), voxel_size=2.0 / 7.0,
        num_lods=2, lod1_vol_dims=(16, 16, 16), lod1_voxel_size=2.0 / 15.0,
        lod1_d_compress=8, lod1_prune_threshold=0.5,
        n_samples=8, n_importance=8,
    )
    stage = ReconStage(cfg, seed=0)
    val = Validator(stage, n_rays_chunk=256)

    rng = np.random.default_rng(0)
    images = rng.uniform(size=(4, 32, 32, 3)).astype(np.float32)
    pack = cam.build_recon_cameras(45.0)
    sel = [0, 1, 2, 3, 4]
    cams = {k: (v[sel] if isinstance(v, np.ndarray) and v.ndim >= 2 and len(v) >= 33
                else v) for k, v in pack.items()}
    cams["intrinsics"] = pack["intrinsics"][sel] / 8.0
    cams["intrinsics"][:, 2, 2] = 1.0
    aff = np.tile(np.eye(4, dtype=np.float32)[None], (5, 1, 1))
    aff[:, :3, :4] = np.einsum(
        "vij,vjk->vik", cams["intrinsics"], cams["w2cs"][:, :3, :4]
    )
    cams["affines"] = aff
    cams["near_fars"] = pack["near_fars"][sel]

    out = val.render_view(images, cams, view_idx=0, H=8, W=8, lod=1)
    assert out["color"].shape == (8, 8, 3)
    for v in out.values():
        assert np.isfinite(v).all()

    # depth-filter configs must validate through the SAME prune path the
    # trainer/reconstruct use (prune_occupancy_depth_filter), not the
    # plain occupancy prune
    cfg_df = cfg.replace(lod1_prune_depth_filter=True)
    stage_df = ReconStage(cfg_df, params=stage.params)
    out_df = Validator(stage_df, n_rays_chunk=256).render_view(
        images, cams, view_idx=0, H=8, W=8, lod=1
    )
    assert out_df["color"].shape == (8, 8, 3)
    for v in out_df.values():
        assert np.isfinite(v).all()
