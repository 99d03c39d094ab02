"""Training data pipelines.

Parity targets:
- Zero123 finetune data: ldm/data/simple.py (ObjaverseData:208) — per object
  a directory of rendered views `%03d.png` + camera-to-world matrices
  `%03d.npy`; each sample draws (cond, target) views of one object and the
  relative-pose token T = (d_polar, sin d_azimuth, cos d_azimuth, d_radius).
- Reconstruction training data: reconstruction/data/One2345_train.py —
  per shape: stage1/stage2-style view PNGs + pose.json + GT depth maps.

Loaders are plain-Python iterators producing numpy batches; device feeding /
sharding happens in the trainers.  No torch DataLoader — host-side threads
prefetch while the TPU step runs.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Iterator

import numpy as np


def cartesian_to_spherical(xyz: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(theta_polar, azimuth, radius) of camera positions [.., 3] — the
    convention of ObjaverseData.get_T (ldm/data/simple.py)."""
    xy = xyz[..., 0] ** 2 + xyz[..., 1] ** 2
    z = np.sqrt(xy + xyz[..., 2] ** 2)
    theta = np.arctan2(np.sqrt(xy), xyz[..., 2])  # polar from +z
    azimuth = np.arctan2(xyz[..., 1], xyz[..., 0])
    return theta, azimuth, z

def relative_pose_token(cond_c2w: np.ndarray, target_c2w: np.ndarray) -> np.ndarray:
    """[4] = (d_theta, sin d_az, cos d_az, d_radius) between two views."""
    t_cond, az_cond, r_cond = cartesian_to_spherical(cond_c2w[:3, 3])
    t_tgt, az_tgt, r_tgt = cartesian_to_spherical(target_c2w[:3, 3])
    d_t = t_tgt - t_cond
    d_az = (az_tgt - az_cond) % (2 * np.pi)
    return np.array([d_t, np.sin(d_az), np.cos(d_az), r_tgt - r_cond], np.float32)


def _decode_view(img, size: int = 256, bg: float = 1.0) -> np.ndarray:
    """RGBA render (PIL image) -> [size, size, 3] in [-1, 1], white composite."""
    if img.size != (size, size):
        from PIL import Image

        img = img.resize((size, size), Image.LANCZOS)
    arr = np.asarray(img).astype(np.float32) / 255.0
    if arr.shape[-1] == 4:
        arr = arr[..., :3] * arr[..., 3:] + bg * (1.0 - arr[..., 3:])
    return arr * 2.0 - 1.0


def _load_view(path: str, size: int = 256, bg: float = 1.0) -> np.ndarray:
    from PIL import Image

    return _decode_view(Image.open(path), size, bg)


class ObjaverseViewsDataset:
    """Zero123 finetune samples from a root of per-object view folders.

    Layout (matching the reference's views_whole_sphere dumps):
        root/<uid>/000.png ... 011.png  (RGBA renders)
        root/<uid>/000.npy ... 011.npy  ([3,4] or [4,4] c2w matrices)
    """

    def __init__(self, root_dir: str, total_views: int = 12, image_size: int = 256,
                 paths: list[str] | None = None, seed: int = 0):
        self.root = root_dir
        if paths is None:
            paths = sorted(
                d for d in os.listdir(root_dir)
                if os.path.isdir(os.path.join(root_dir, d))
            )
        self.paths = paths
        self.total_views = total_views
        self.image_size = image_size
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.paths)

    def sample(self, idx: int | None = None) -> dict:
        if idx is None:
            idx = int(self.rng.integers(len(self.paths)))
        obj = os.path.join(self.root, self.paths[idx])
        ic, it = self.rng.choice(self.total_views, 2, replace=False)

        def cam(i):
            m = np.load(os.path.join(obj, f"{i:03d}.npy"))
            if m.shape == (3, 4):
                m = np.concatenate([m, [[0, 0, 0, 1]]], axis=0)
            return m

        cond_c2w, tgt_c2w = cam(ic), cam(it)
        return {
            "image_cond": _load_view(os.path.join(obj, f"{ic:03d}.png"), self.image_size),
            "image_target": _load_view(os.path.join(obj, f"{it:03d}.png"), self.image_size),
            "T": relative_pose_token(cond_c2w, tgt_c2w)[None],  # [1, 4]
        }

    def batches(self, batch_size: int) -> Iterator[dict]:
        while True:
            samples = [self.sample() for _ in range(batch_size)]
            yield {
                k: np.stack([s[k] for s in samples]).astype(np.float32)
                for k in samples[0]
            }


class ObjaverseTarShards:
    """Streaming tar-shard loader — the webdataset ingestion path of the
    reference training config (ObjaverseDataModuleFromConfig,
    ldm/data/simple.py:168, batch 192 from tar shards).

    Shard layout (views_release packing): members named
    ``<uid>/<idx>.png`` (RGBA render) + ``<uid>/<idx>.npy`` ([3,4]/[4,4]
    c2w).  Objects are yielded as their members complete; a shuffle buffer
    decorrelates neighbors.  Pure stdlib (tarfile) — no webdataset dep;
    host threads (Prefetcher) overlap decode with device steps.
    """

    def __init__(self, shard_paths: list[str], image_size: int = 256,
                 shuffle_buffer: int = 256, seed: int = 0, loop: bool = True):
        if not shard_paths:
            raise ValueError("no shards given")
        self.shards = list(shard_paths)
        self.image_size = image_size
        self.shuffle_buffer = shuffle_buffer
        self.loop = loop
        self.rng = np.random.default_rng(seed)

    # ---- shard walking ----------------------------------------------------
    def _iter_objects(self) -> Iterator[dict]:
        """Yield {'pngs': {idx: bytes}, 'cams': {idx: np [4,4]}} per object."""
        import io
        import tarfile

        while True:
            order = list(self.shards)
            self.rng.shuffle(order)
            for shard in order:
                with tarfile.open(shard, "r|*") as tf:  # stream, no seeks
                    current_uid, pngs, cams = None, {}, {}
                    for m in tf:
                        if not m.isfile() or "/" not in m.name:
                            continue
                        uid, fname = m.name.split("/", 1)
                        if current_uid is not None and uid != current_uid:
                            if pngs and cams:
                                yield {"pngs": pngs, "cams": cams}
                            pngs, cams = {}, {}
                        current_uid = uid
                        stem, ext = os.path.splitext(fname)
                        data = tf.extractfile(m).read()
                        if ext == ".png":
                            pngs[stem] = data
                        elif ext == ".npy":
                            m4 = np.load(io.BytesIO(data))
                            if m4.shape == (3, 4):
                                m4 = np.concatenate([m4, [[0, 0, 0, 1]]], axis=0)
                            cams[stem] = m4
                    if pngs and cams:
                        yield {"pngs": pngs, "cams": cams}
            if not self.loop:
                return

    def samples(self) -> Iterator[dict]:
        import io

        from PIL import Image

        def emit(obj):
            keys = sorted(set(obj["pngs"]) & set(obj["cams"]))
            ic, it = self.rng.choice(len(keys), 2, replace=False)
            kc, kt = keys[int(ic)], keys[int(it)]
            return {
                "image_cond": _decode_view(
                    Image.open(io.BytesIO(obj["pngs"][kc])), self.image_size
                ),
                "image_target": _decode_view(
                    Image.open(io.BytesIO(obj["pngs"][kt])), self.image_size
                ),
                "T": relative_pose_token(obj["cams"][kc], obj["cams"][kt])[None],
            }

        buf: list[dict] = []
        for obj in self._iter_objects():
            if len(set(obj["pngs"]) & set(obj["cams"])) < 2:
                continue
            buf.append(obj)
            if len(buf) < self.shuffle_buffer:
                continue
            yield emit(buf.pop(int(self.rng.integers(len(buf)))))
        # non-looping epoch end: drain whatever is left in the buffer
        while buf:
            yield emit(buf.pop(int(self.rng.integers(len(buf)))))

    def batches(self, batch_size: int) -> Iterator[dict]:
        it = self.samples()
        while True:
            samples = [next(it) for _ in range(batch_size)]
            yield {
                k: np.stack([s[k] for s in samples]).astype(np.float32)
                for k in samples[0]
            }


class ReconScenesDataset:
    """Reconstruction-training scenes from exp-style shape dirs
    (stage1_8/, stage2_8/, pose.json — the pipeline's own artifact layout,
    mirroring One2345_train.py's ref+src view assembly)."""

    def __init__(self, root_dir: str, n_rays: int = 512, seed: int = 0,
                 shape_dirs: list[str] | None = None):
        self.root = root_dir
        if shape_dirs is None:
            shape_dirs = sorted(
                d for d in os.listdir(root_dir)
                if os.path.isdir(os.path.join(root_dir, d))
            )
        self.shape_dirs = shape_dirs
        self.n_rays = n_rays
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.shape_dirs)

    def load_scene(self, idx: int) -> dict:
        from one2345_tpu.geometry import cameras as cam

        shape_dir = os.path.join(self.root, self.shape_dirs[idx])
        with open(os.path.join(shape_dir, "pose.json")) as f:
            meta = json.load(f)
        # recover elevation from the first pose's polar angle
        c2w0 = np.asarray(meta["c2ws"]["0.png"] if "0.png" in meta["c2ws"] else
                          list(meta["c2ws"].values())[0])
        polar = np.degrees(np.arccos(np.clip(c2w0[2, 3] / 1.2, -1, 1)))
        pack = cam.build_recon_cameras(float(polar))

        imgs = []
        ref = _load_view(os.path.join(shape_dir, "stage1_8", pack["img_ids"][0]))
        imgs.append((ref + 1.0) / 2.0)
        for img_id in pack["img_ids"][8:]:
            v = _load_view(os.path.join(shape_dir, "stage2_8", img_id))
            imgs.append((v + 1.0) / 2.0)
        images = np.stack(imgs)  # [33, 256, 256, 3] in [0,1]
        return {"images": images, "cameras": pack}

    def sample_scene(self, idx: int | None = None, key=None) -> dict:
        """Scene dict in the ReconTrainer format (random rays from the ref
        view; mask = non-white heuristic as the renders are white-bg)."""
        import jax

        from one2345_tpu.geometry.rays import random_rays_from_image

        if idx is None:
            idx = int(self.rng.integers(len(self.shape_dirs)))
        sc = self.load_scene(idx)
        pack = sc["cameras"]
        img0 = sc["images"][0]
        mask = (~np.all(img0 > 245 / 255.0, axis=-1)).astype(np.float32)
        if key is None:
            key = jax.random.key(int(self.rng.integers(1 << 31)))
        rays = random_rays_from_image(
            key, self.n_rays, img0, pack["intrinsics"][0], pack["c2ws"][0],
            mask=mask,
        )
        return {
            "images": sc["images"],
            "affines": pack["affines"],
            "w2cs": pack["w2cs"],
            "intrinsics": pack["intrinsics"],
            "near_far": pack["query_near_far"],
            "rays_o": np.asarray(rays["rays_o"], np.float32),
            "rays_v": np.asarray(rays["rays_v"], np.float32),
            "rays_color": np.asarray(rays["rays_color"], np.float32),
            "rays_mask": np.asarray(rays["rays_mask"], np.float32),
        }


class Prefetcher:
    """Background-thread batch prefetch (host IO overlaps device steps)."""

    def __init__(self, iterator: Iterator, depth: int = 2):
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = False

        def work():
            for item in iterator:
                if self._stop:
                    return
                self.q.put(item)

        self.t = threading.Thread(target=work, daemon=True)
        self.t.start()

    def __iter__(self):
        return self

    def __next__(self):
        return self.q.get()

    def close(self):
        self._stop = True
