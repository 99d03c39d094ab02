"""End-to-end single-image -> textured-mesh pipeline.

Parity target: run.py (preprocess -> stage1_run -> stage2_run ->
reconstruct, run.py:79-119) and the demo orchestration (demo/app.py).

TPU re-design vs the reference:
- no subprocesses, no PNG round-trips between stages: all four ML stages are
  in-process jitted programs exchanging device arrays (artifact PNGs +
  pose.json are *optional exports* for compatibility);
- stage-1 samples each elevation ring as one 4-view batch with identical
  shapes in both branches (-> zero recompilation across inputs; the
  reference loops per image);
- stage-2 samples all remaining 7x4 views in one batch;
- with >1 visible chip the view x CFG batch of every sampler call shards
  over a `data` mesh axis (padded to the mesh size when uneven).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
import jax
import numpy as np

from one2345_tpu.core.config import PipelineConfig
from one2345_tpu.core.profiling import Timer
from one2345_tpu.geometry import cameras as cam
from one2345_tpu.utils import image as img_utils


def select_stage1b_plan(polar: float, n_devices: int):
    """Second-ring stage-1 sampling plan (run.py:40-44 view-index logic).

    Single chip (or any mesh the 4-view batch divides) samples just the
    needed ring.  On an 8-device mesh the 4-view batch would be PADDED to 8
    anyway (half the FLOPs wasted on duplicate rows) — so sample BOTH
    elevation rings (views 4..11, same cost) and slice out the needed one;
    the spare ring is free insurance for per-view retries.  Per-view noise
    is keyed by the GLOBAL candidate-view id (sample_views noise_ids), so
    the 8-view plan produces bit-identical ring images to the single-chip
    4-view plan under the same seed — topology does not change outputs.

    :return: (indices_to_sample, slice_for_needed_ring, second_ring_ids)
    """
    second = [4, 5, 6, 7] if polar <= 75 else [8, 9, 10, 11]
    if n_devices > 1 and 4 % n_devices != 0:
        sample = list(range(4, 12))
        off = 0 if polar <= 75 else 4
        return sample, slice(off, off + 4), second
    return second, slice(0, 4), second


class UnsafeImageError(RuntimeError):
    """Raised when the safety checker flags the input image
    (the library-level equivalent of demo/app.py:376-386 returning the
    unsafe-placeholder image)."""


@dataclass
class PipelineResult:
    mesh_path: str | None
    vertices: np.ndarray
    faces: np.ndarray
    colors: np.ndarray
    elevation: float
    stage1_images: np.ndarray  # [8, 256, 256, 3]
    stage2_images: np.ndarray  # [8, 4, 256, 256, 3]
    timings: dict = field(default_factory=dict)


class One2345Pipeline:
    """Lazy-constructed stages; each stage jits once per process."""

    def __init__(
        self,
        config: PipelineConfig | None = None,
        params: dict | None = None,
        use_sam: bool = True,
        mesh=None,
        auto_mesh: bool = True,
    ):
        """:param mesh: `jax.sharding.Mesh` with a `data` axis for view-batch
        sharding of the diffusion stage.  With ``auto_mesh`` (default) a 1-D
        mesh over all local devices is created automatically whenever more
        than one chip is visible and the stage batches (8 / 56 view x CFG)
        divide the device count — single-chip behavior is unchanged."""
        self.config = config or PipelineConfig()
        params = params or {}
        self._params = params
        self.use_sam = use_sam
        self._mesh = mesh
        self._auto_mesh = auto_mesh
        self._zero123 = None
        self._recon = None
        self._sam = None
        self._elev = None
        self._safety = None

    # lazy stage constructors -------------------------------------------------
    def _resolve_mesh(self):
        if self._mesh is None and self._auto_mesh:
            n = len(jax.devices())
            # stage batches are 8 / 56 (views x CFG) — shard only over
            # divisor-of-8 meshes so every program splits evenly
            if n > 1 and 8 % n == 0:
                from one2345_tpu.core.meshes import create_mesh

                self._mesh = create_mesh(("data",))
        return self._mesh

    @property
    def zero123(self):
        if self._zero123 is None:
            from one2345_tpu.diffusion.zero123 import Zero123Stage

            self._zero123 = Zero123Stage(
                self.config.diffusion, self._params.get("zero123"),
                mesh=self._resolve_mesh(),
            )
        return self._zero123

    @property
    def recon(self):
        if self._recon is None:
            from one2345_tpu.recon.pipeline import ReconStage

            self._recon = ReconStage(self.config.recon, self._params.get("recon"))
        return self._recon

    @property
    def sam(self):
        if self._sam is None:
            from one2345_tpu.segmentation.sam import SamStage

            self._sam = SamStage(self.config.sam, self._params.get("sam"))
        return self._sam

    @property
    def elevation_estimator(self):
        if self._elev is None:
            from one2345_tpu.elevation.loftr import LoFTRMatcher
            from one2345_tpu.elevation.solver import ElevationEstimator

            import jax.numpy as jnp

            ecfg = self.config.elevation
            matcher = LoFTRMatcher(
                self._params.get("loftr"),
                dtype=jnp.bfloat16 if ecfg.dtype == "bfloat16" else jnp.float32,
            )
            self._elev = ElevationEstimator(
                matcher,
                focal=self.config.elevation.focal,
                image_size=self.config.elevation.image_size,
            )
        return self._elev

    @property
    def safety(self):
        if self._safety is None:
            from one2345_tpu.segmentation.safety import SafetyChecker

            sp = self._params.get("safety")
            self._safety = sp if isinstance(sp, SafetyChecker) else SafetyChecker(
                **(sp or {})
            )
        return self._safety

    def check_safety(self, rgb_uint8: np.ndarray) -> bool:
        """NSFW gate on the raw input (demo/app.py nsfw_check:376-386):
        CLIP-embed the image and score it against the concept embeddings.
        Free when no safety weights are loaded (checker flags nothing)."""
        if not self.safety.has_weights:
            return False
        import jax.numpy as jnp

        from one2345_tpu.diffusion.clip import preprocess_for_clip

        embed = getattr(self, "_clip_embed_jit", None)
        if embed is None:
            # one compiled program per process — un-jitted flax apply would
            # dispatch the whole CLIP tower op-by-op on every request
            embed = jax.jit(self.zero123.clip.apply)
            self._clip_embed_jit = embed

        # host-side resize to the fixed CLIP frame (as the HF feature
        # extractor does) so the jitted program sees ONE input shape —
        # request images vary in size/aspect and would retrace otherwise
        from PIL import Image

        csize = self.config.diffusion.clip.image_size
        im = Image.fromarray(rgb_uint8).resize((csize, csize), Image.BICUBIC)
        x = np.asarray(im).astype(np.float32) / 127.5 - 1.0  # [-1, 1]
        emb = np.asarray(
            embed(
                self.zero123.params["clip"],
                preprocess_for_clip(jnp.asarray(x[None]), csize),
            )
        )
        return bool(self.safety.check(emb)[0])

    # checkpointing -----------------------------------------------------------
    def save_params(self, path: str) -> None:
        """Persist every constructed stage's params as one orbax tree."""
        from one2345_tpu.core import checkpoint

        tree = {}
        if self._zero123 is not None:
            tree["zero123"] = self._zero123.params
        if self._recon is not None:
            tree["recon"] = self._recon.params
        if self._sam is not None:
            tree["sam"] = self._sam.params
        if self._elev is not None:
            tree["loftr"] = self._elev.matcher.params
        checkpoint.save(path, tree)

    # stages ------------------------------------------------------------------
    def preprocess(
        self,
        raw_image: np.ndarray,
        bbox: tuple[int, int, int, int] | None = None,
        safety_check: bool = True,
    ) -> np.ndarray:
        """uint8 RGB(A) -> [256, 256, 3] float [0,1] recentered on white
        (run.py preprocess: thumbnail 512 -> SAM bbox segment -> recenter).

        :param bbox: optional (x0, y0, x1, y1) prompt override in the
            512-thumbnail frame — the demo's bbox-slider flow
            (demo/app.py:418,607-614); default = rembg-style estimate.
        :raises UnsafeImageError: when the safety checker flags the image.
        """
        from PIL import Image

        pil = Image.fromarray(raw_image)
        pil = img_utils.thumbnail(pil, 512)
        arr = np.asarray(pil)
        if arr.shape[-1] == 4:
            rgb = (img_utils.composite_white(arr.astype(np.float32) / 255.0) * 255).astype(np.uint8)
        else:
            rgb = arr
        if safety_check and self.check_safety(rgb):
            raise UnsafeImageError("NSFW content detected")
        if self.use_sam:
            # one ViT-H encode serves both the bbox seed and the final
            # box-prompted mask (SamPredictor set_image semantics)
            cache = self.sam.set_image(rgb)
            if bbox is None:
                # rembg replacement: let SAM itself propose the object box;
                # classical saliency estimate as fallback
                bbox = self.sam.seed_bbox(cache)
                if bbox is None:
                    bbox = img_utils.estimate_bbox(rgb)
            mask = self.sam.predict_box(cache, bbox)
        else:
            bg = ~np.all(rgb > 245, axis=-1)
            mask = bg
            if arr.shape[-1] == 4:
                mask = arr[..., 3] > 0
        rgba = np.concatenate([rgb, (mask[..., None] * 255).astype(np.uint8)], axis=-1)
        return img_utils.recenter_rescale(
            rgba, out_size=self.config.diffusion.image_size
        )

    def warmup(self, mesh_resolution: int | None = None) -> dict:
        """Compile every stage graph once on synthetic input (cold-start
        elimination for serving: the first real request then runs at steady
        state).  Returns the per-stage timings of the warm-up run."""
        rng = np.random.default_rng(0)
        size = self.config.diffusion.image_size
        img = np.ones((size, size, 3), np.float32)
        q = size // 4
        img[q : 3 * q, q : 3 * q] = rng.uniform(0.2, 0.8, (2 * q, 2 * q, 3))
        if self.use_sam:
            # the SAM ViT-H encoder/decoder graphs are on the /preprocess
            # hot path — compile them too, not just the mesh stages
            pre = np.full((512, 512, 3), 255, np.uint8)
            pre[128:384, 128:384] = (
                rng.uniform(40, 200, (256, 256, 3)).astype(np.uint8)
            )
            self.preprocess(pre, safety_check=False)
        result = self.run(
            img, skip_preprocess=True,
            mesh_resolution=mesh_resolution or self.config.mesh_resolution,
            seed=0,
        )
        # The warm-up input yields no LoFTR matches, so run() above takes
        # the elevation fallback and never traces the pose sweep — compile
        # it here on empty slates (same shapes as real matches) so the
        # first real request doesn't pay a multi-minute remote compile.
        import jax.numpy as jnp

        from one2345_tpu.elevation.solver import PAIRS, _sweep_two_stage

        est = self.elevation_estimator
        K = est.matcher.max_matches
        P = len(PAIRS)
        arrs = (
            jnp.zeros((P, K, 2)), jnp.zeros((P, K, 2)),
            jnp.zeros((P, K)), jnp.zeros((P, K), bool),
        )
        float(_sweep_two_stage(jnp.asarray(est.K), arrs, P))
        return result.timings

    def run_many(
        self,
        images,
        seeds=None,
        out_dirs=None,
        max_in_flight: int = 2,
        **run_kwargs,
    ) -> list:
        """Overlapped multi-request throughput mode (serving).

        Runs requests in a small thread pool so one request's host/tunnel-
        bound segments (sparse field fetch, C++ marching tets, PLY
        assembly) overlap another's device programs.  Device programs
        serialize on the chip and every run draws noise from its own seed,
        so results are identical to sequential `run` calls
        (tests/test_run_many.py).  Measured on one v5e at reference step
        counts: 9.54 -> 9.10 s/mesh (+4.6%) with max_in_flight=2; deeper
        queues add host contention for no device-side gain.

        :param seeds: per-request seeds (default: config.seed + index)
        :param out_dirs: per-request out_dir list (default: no exports)
        :return: list of PipelineResult in input order
        """
        from concurrent.futures import ThreadPoolExecutor

        # Build the lazy stages on the calling thread first: the `is None`
        # property checks are not thread-safe, and two threads racing into
        # a cold pipeline would each construct (and remote-compile) their
        # own stage objects.
        _ = self.zero123, self.recon, self.elevation_estimator
        if self.use_sam and not run_kwargs.get("skip_preprocess"):
            _ = self.sam

        n = len(images)
        if seeds is None:
            seeds = [self.config.seed + i for i in range(n)]
        if out_dirs is None:
            out_dirs = [None] * n

        def one(i):
            return self.run(
                images[i], out_dir=out_dirs[i], seed=seeds[i], **run_kwargs
            )

        with ThreadPoolExecutor(max_workers=max_in_flight) as ex:
            return list(ex.map(one, range(n)))

    def run(
        self,
        image: np.ndarray,
        out_dir: str | None = None,
        mesh_resolution: int | None = None,
        output_format: str | None = None,
        seed: int | None = None,
        skip_preprocess: bool = False,
    ) -> PipelineResult:
        """Full image -> textured mesh (predict_multiview + reconstruct)."""
        cfg = self.config
        timer = Timer()
        key = jax.random.key(cfg.seed if seed is None else seed)
        k_s1, k_s2e, k_s2 = jax.random.split(key, 3)

        with timer.span("preprocess"):
            input_256 = image if skip_preprocess else self.preprocess(image)

        # Stage outputs stay ON DEVICE end-to-end — the device<->host tunnel
        # of this environment runs ~20 MB/s, so the reference's
        # write-PNG-read-PNG stage handoffs would dominate wall-clock here.
        import jax.numpy as jnp

        # ---- stage 1a: the 4 same-elevation views (run.py stage1_run's
        # adjust_set=range(4)); the elevation-dependent 4 come after the
        # estimate — 8 total view samples, both branches batch-4 (one
        # compilation each, no elevation-dependent shapes)
        with timer.span("stage1"):
            s1_first = self.zero123.stage1(input_256, k_s1, indices=[0, 1, 2, 3])
            s1_first.block_until_ready()

        # ---- stage 2 for view 0 (elevation estimation input, run.py:28-30)
        with timer.span("stage2_view0"):
            s2_v0 = self.zero123.stage2(
                s1_first[:1], k_s2e, steps=cfg.diffusion.ddim_steps_stage2,
                view_ids=[0],
            )  # [1, 4, ...]
            s2_v0.block_until_ready()

        with timer.span("elevation"):
            # device array handed over directly — the estimator's
            # grayscale/resize/matching all run on device (no 3 MB fetch)
            polar = self.estimate_elevation(s2_v0[0])

        # ---- stage 1b: the second elevation ring (run.py:40-44)
        sel = list(range(8)) if polar <= 75 else list(range(4)) + list(range(8, 12))
        mesh = self.zero123.mesh
        n_dev = int(mesh.devices.size) if mesh is not None else 1
        sample_idx, ring, _ = select_stage1b_plan(polar, n_dev)
        with timer.span("stage1"):
            s1_second = self.zero123.stage1(
                input_256, jax.random.fold_in(k_s1, 1), indices=sample_idx
            )[ring]
            s1_second.block_until_ready()
        stage1_images = jnp.concatenate([s1_first, s1_second], axis=0)

        # ---- stage 2 for the remaining 7 views (run.py stage2_run)
        with timer.span("stage2"):
            rest = self.zero123.stage2(
                stage1_images[1:], k_s2, steps=cfg.diffusion.ddim_steps_stage2,
                view_ids=list(range(1, 8)),
            )  # [7, 4, ...]
            rest.block_until_ready()
        stage2_images = jnp.concatenate([s2_v0, rest], axis=0)  # [8, 4, ...]

        # ---- reconstruction
        with timer.span("reconstruct"):
            camera_pack = cam.build_recon_cameras(polar)
            src_images = stage2_images.reshape(-1, *stage2_images.shape[2:])  # [32,...]
            mesh_path = None
            if out_dir:
                os.makedirs(out_dir, exist_ok=True)
                mesh_path = os.path.join(out_dir, "mesh.ply")
            mesh = self.recon.reconstruct(
                src_images,
                camera_pack,
                resolution=mesh_resolution or cfg.mesh_resolution,
                out_path=mesh_path,
            )

        if out_dir:
            self.export_artifacts(out_dir, polar, stage1_images, stage2_images, sel)
            fmt = output_format or cfg.output_format
            if fmt in (".obj", ".glb"):
                mesh_path = self.convert_mesh(out_dir, mesh, fmt)

        return PipelineResult(
            mesh_path=mesh_path,
            vertices=mesh["vertices"],
            faces=mesh["faces"],
            colors=mesh["colors"],
            elevation=90.0 - polar,
            stage1_images=stage1_images,
            stage2_images=stage2_images,
            timings=timer.report(),
        )

    def estimate_elevation(self, nearby_views) -> float:
        """[4, 256, 256, 3] (numpy or device array) -> polar angle deg;
        falls back to 90 (run.py:32-36 try/except)."""
        try:
            est = self.elevation_estimator.estimate(nearby_views)
        except Exception:
            est = None
        return float(int(est)) if est is not None else self.config.elevation.default_elevation

    # artifact exports (reference-compatible layout) --------------------------
    def export_artifacts(self, out_dir, polar, stage1_images, stage2_images, sel):
        """stage1_8/{i}.png, stage2_8/{i}_{j}.png, pose.json — the exact
        filesystem contract of the reference (SURVEY data-flow table)."""
        from PIL import Image

        stage1_images = np.asarray(stage1_images)
        stage2_images = np.asarray(stage2_images)
        s1_dir = os.path.join(out_dir, "stage1_8")
        s2_dir = os.path.join(out_dir, "stage2_8")
        os.makedirs(s1_dir, exist_ok=True)
        os.makedirs(s2_dir, exist_ok=True)
        for k, i in enumerate(sel):
            Image.fromarray((stage1_images[k] * 255).astype(np.uint8)).save(
                os.path.join(s1_dir, f"{i}.png")
            )
            for j in range(4):
                Image.fromarray((stage2_images[k, j] * 255).astype(np.uint8)).save(
                    os.path.join(s2_dir, f"{i}_{j}.png")
                )
        cam.write_pose_json(out_dir, polar)

    def convert_mesh(self, out_dir, mesh, fmt: str) -> str:
        from one2345_tpu.recon import mesh_extract

        v, f = mesh_extract.convert_mesh_axes(mesh["vertices"], mesh["faces"])
        path = os.path.join(out_dir, f"mesh{fmt}")
        if fmt == ".obj":
            save_obj(path, v, f, mesh["colors"])
        else:
            from one2345_tpu.recon.gltf import save_glb

            save_glb(path, v, f, mesh["colors"])
        return path


def save_obj(path: str, verts: np.ndarray, faces: np.ndarray, colors: np.ndarray):
    """OBJ with per-vertex colors (trimesh include_color=True format)."""
    with open(path, "w") as f:
        for v, c in zip(verts, colors):
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f} {c[0]:.4f} {c[1]:.4f} {c[2]:.4f}\n")
        for tri in faces + 1:
            f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")
