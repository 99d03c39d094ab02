"""Coarse-to-fine (lod1) reconstruction path on a tiny config."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute: two-lod recon compiles

from one2345_tpu.core.config import ReconConfig
from one2345_tpu.geometry import cameras as cam
from one2345_tpu.recon.pipeline import ReconStage


@pytest.mark.parametrize("depth_filter", [False, True])
def test_lod1_volume_and_reconstruct(depth_filter):
    cfg = ReconConfig(
        num_lods=2,
        vol_dims=(16, 16, 16), voxel_size=2.0 / 15.0,
        lod1_vol_dims=(32, 32, 32), lod1_voxel_size=2.0 / 31.0,
        lod1_d_compress=8,
        mesh_resolution=24,
        # depth-filtered pruning variant (prune_depth_filter path,
        # sparse_neus_renderer.py:687-820)
        lod1_prune_depth_filter=depth_filter,
    )
    stage = ReconStage(cfg, seed=0)
    assert "sdf_lod1" in stage.params

    rng = np.random.default_rng(0)
    imgs = rng.uniform(size=(4, 64, 64, 3)).astype(np.float32)
    # cameras: subsample the standard rig pack to 1 ref + 4 src, rescaled
    pack = cam.build_recon_cameras(45.0)
    sel = [0, 1, 2, 3, 4]
    pack_small = {
        k: (v[sel] if isinstance(v, np.ndarray) and v.ndim >= 2 and len(v) >= 33 else v)
        for k, v in pack.items() if k != "img_ids"
    }
    # intrinsics were calibrated for 256^2; the recon projects against
    # cfg.image_hw so scale them to 64^2
    cfg64 = {**pack_small}
    cfg64["intrinsics"] = pack_small["intrinsics"] / 4.0
    cfg64["intrinsics"][:, 2, 2] = 1.0
    aff = np.tile(np.eye(4, dtype=np.float32)[None], (5, 1, 1))
    aff[:, :3, :4] = np.einsum(
        "vij,vjk->vik", cfg64["intrinsics"], pack_small["w2cs"][:, :3, :4]
    )
    cfg64["affines"] = aff

    stage.config = stage.config.replace(image_hw=(64, 64))
    mesh = stage.reconstruct(imgs, cfg64, resolution=24)
    assert np.isfinite(mesh["vertices"]).all()
    assert len(mesh["vertices"]) > 0
    assert mesh["colors"].shape == (len(mesh["vertices"]), 3)
