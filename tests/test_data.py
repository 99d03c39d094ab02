"""Training-data pipeline tests on synthetic on-disk fixtures."""

import os

import numpy as np
from PIL import Image

from one2345_tpu.training.data import (
    ObjaverseViewsDataset,
    Prefetcher,
    ReconScenesDataset,
    cartesian_to_spherical,
    relative_pose_token,
)


def test_spherical_roundtrip():
    xyz = np.array([1.2 * np.sin(1.0) * np.cos(0.5), 1.2 * np.sin(1.0) * np.sin(0.5),
                    1.2 * np.cos(1.0)])
    theta, az, r = cartesian_to_spherical(xyz)
    np.testing.assert_allclose([theta, az, r], [1.0, 0.5, 1.2], atol=1e-6)


def test_relative_pose_token_identity():
    c2w = np.eye(4)
    c2w[:3, 3] = [0, 1.2, 0]
    T = relative_pose_token(c2w, c2w)
    np.testing.assert_allclose(T, [0, 0, 1, 0], atol=1e-6)


def _make_objaverse_fixture(root, n_obj=2, n_views=4):
    rng = np.random.default_rng(0)
    for o in range(n_obj):
        d = os.path.join(root, f"obj{o}")
        os.makedirs(d)
        for v in range(n_views):
            img = rng.integers(0, 255, (32, 32, 4), dtype=np.uint8)
            Image.fromarray(img, "RGBA").save(os.path.join(d, f"{v:03d}.png"))
            c2w = np.eye(4)
            c2w[:3, 3] = rng.normal(size=3) + [0, 0, 2.0]
            np.save(os.path.join(d, f"{v:03d}.npy"), c2w[:3, :4])


def test_objaverse_dataset_batches(tmp_path):
    _make_objaverse_fixture(str(tmp_path))
    ds = ObjaverseViewsDataset(str(tmp_path), total_views=4, image_size=32)
    assert len(ds) == 2
    it = ds.batches(3)
    batch = next(it)
    assert batch["image_target"].shape == (3, 32, 32, 3)
    assert batch["image_cond"].shape == (3, 32, 32, 3)
    assert batch["T"].shape == (3, 1, 4)
    assert batch["image_target"].min() >= -1.0 and batch["image_target"].max() <= 1.0

    pf = Prefetcher(ds.batches(2))
    b2 = next(pf)
    assert b2["T"].shape == (2, 1, 4)
    pf.close()


def _make_tar_shards(root, n_shards=2, objs_per_shard=3, n_views=3):
    import tarfile

    rng = np.random.default_rng(1)
    paths = []
    for s in range(n_shards):
        path = os.path.join(root, f"shard_{s:03d}.tar")
        with tarfile.open(path, "w") as tf:
            for o in range(objs_per_shard):
                uid = f"uid{s}_{o}"
                for v in range(n_views):
                    img = rng.integers(0, 255, (16, 16, 4), dtype=np.uint8)
                    import io

                    buf = io.BytesIO()
                    Image.fromarray(img, "RGBA").save(buf, "PNG")
                    data = buf.getvalue()
                    info = tarfile.TarInfo(f"{uid}/{v:03d}.png")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
                    c2w = np.eye(4)
                    c2w[:3, 3] = rng.normal(size=3) + [0, 0, 2.0]
                    buf = io.BytesIO()
                    np.save(buf, c2w[:3, :4])
                    data = buf.getvalue()
                    info = tarfile.TarInfo(f"{uid}/{v:03d}.npy")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
        paths.append(path)
    return paths


def test_tar_shard_streaming(tmp_path):
    """webdataset-style tar ingestion (ldm/data/simple.py:168 parity)."""
    from one2345_tpu.training.data import ObjaverseTarShards

    shards = _make_tar_shards(str(tmp_path))
    ds = ObjaverseTarShards(shards, image_size=16, shuffle_buffer=4)
    batch = next(ds.batches(5))
    assert batch["image_target"].shape == (5, 16, 16, 3)
    assert batch["image_cond"].shape == (5, 16, 16, 3)
    assert batch["T"].shape == (5, 1, 4)
    assert batch["image_target"].min() >= -1.0 and batch["image_target"].max() <= 1.0

    # non-looping epoch drains the shuffle buffer and terminates
    ds2 = ObjaverseTarShards(shards, image_size=16, shuffle_buffer=100, loop=False)
    n = sum(1 for _ in ds2.samples())
    assert n == 6  # 2 shards x 3 objects


def test_recon_scenes_dataset(tmp_path):
    # build a pipeline-artifact-style shape dir
    from one2345_tpu.geometry import cameras as cam

    shape = os.path.join(tmp_path, "shape0")
    os.makedirs(os.path.join(shape, "stage1_8"))
    os.makedirs(os.path.join(shape, "stage2_8"))
    cam.write_pose_json(shape, 45.0)
    rng = np.random.default_rng(1)
    ids, _ = cam.rig_poses(45.0)
    for i in ids[:8]:
        Image.fromarray(rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)).save(
            os.path.join(shape, "stage1_8", i)
        )
    for i in ids[8:]:
        Image.fromarray(rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)).save(
            os.path.join(shape, "stage2_8", i)
        )

    ds = ReconScenesDataset(str(tmp_path), n_rays=16)
    sc = ds.sample_scene(0)
    assert sc["images"].shape == (33, 256, 256, 3)
    assert sc["affines"].shape == (33, 4, 4)
    assert sc["rays_o"].shape == (16, 3)
    assert sc["rays_color"].shape == (16, 3)
    assert np.isfinite(sc["near_far"]).all()
