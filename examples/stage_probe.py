"""Per-stage TPU timing probe: times each pipeline stage separately at the
REAL production shapes and prints one JSON line per stage (plus a warm
end-to-end line).  The surgical companion to bench.py — run it when hunting
for the next stage to optimize:

    python examples/stage_probe.py [--mesh_resolution 256] [--repeats 3]

Stage timings are measured warm (each stage runs once for compile, then
`repeats` measured runs) so the numbers reflect steady-state serving.
"""

from __future__ import annotations

# allow `python examples/<name>.py` from the repo root without installing
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def sync(x):
    """Force real device synchronization.  Under the axon plugin
    `block_until_ready` returns early until the stream has been drained by
    an actual D2H fetch (see CLAUDE.md) — a 1-element slice fetch is a
    dependency-complete sync that costs ~1 ms of transfer."""
    import numpy as _np

    flat = x.reshape(-1) if hasattr(x, "reshape") else x
    _np.asarray(flat[:1])
    return x


def span(fn, repeats: int):
    fn()  # warm-up / compile (fn must end with a real fetch / sync)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), float(np.mean(ts))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mesh_resolution", type=int, default=256)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--sam", action="store_true",
                   help="also time SAM ViT-H preprocessing (encode + "
                        "seed/final decodes at 1024^2, as in bench.py)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from one2345_tpu.core.config import PipelineConfig
    from one2345_tpu.geometry import cameras as cam
    from one2345_tpu.pipeline.runner import One2345Pipeline

    cfg = PipelineConfig()
    pipe = One2345Pipeline(cfg, use_sam=args.sam)

    rng = np.random.default_rng(0)
    size = cfg.diffusion.image_size
    img = np.ones((size, size, 3), np.float32)
    img[size // 4 : 3 * size // 4, size // 4 : 3 * size // 4] = rng.uniform(
        0.2, 0.8, (size // 2, size // 2, 3)
    )

    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)

    def emit(stage, best, mean, **extra):
        print(json.dumps({"stage": stage, "best_s": round(best, 4),
                          "mean_s": round(mean, 4), **extra}), flush=True)

    # SAM preprocessing (raw 512^2 -> segmented/recentered 256^2)
    if args.sam:
        raw = np.full((512, 512, 3), 255, np.uint8)
        raw[128:384, 128:384] = rng.uniform(40, 200, (256, 256, 3)).astype(np.uint8)

        def run_pre():
            pipe.preprocess(raw, safety_check=False)

        emit("preprocess_sam", *span(run_pre, args.repeats))

    # stage 1 (one 4-view ring, 77 DDIM steps)
    s1 = None

    def run_s1():
        nonlocal s1
        s1 = pipe.zero123.stage1(img, k1, indices=[0, 1, 2, 3])
        sync(s1)

    emit("stage1_ring4", *span(run_s1, args.repeats), views=4)

    # stage 2 for one view (4 nearby, 50 steps)
    s2v0 = None

    def run_s2v0():
        nonlocal s2v0
        s2v0 = pipe.zero123.stage2(s1[:1], k2, steps=cfg.diffusion.ddim_steps_stage2)
        sync(s2v0)

    emit("stage2_view0", *span(run_s2v0, args.repeats), views=4)

    # elevation (LoFTR 6 pairs + sweep; device arrays in, as in the pipeline)
    def run_elev():
        pipe.estimate_elevation(s2v0[0])

    emit("elevation", *span(run_elev, args.repeats))

    # stage 2 for the remaining 7 views (28 samples)
    s1_8 = jnp.concatenate([s1, s1], axis=0)

    def run_s2():
        out = pipe.zero123.stage2(s1_8[1:], k3, steps=cfg.diffusion.ddim_steps_stage2)
        sync(out)

    emit("stage2_rest", *span(run_s2, args.repeats), views=28)

    # reconstruction (cost volume + field + MC + color)
    camera_pack = cam.build_recon_cameras(90.0)
    stage2_images = np.asarray(
        pipe.zero123.stage2(s1_8[:8][1:], k3, steps=2)
    )  # shape donor only
    src = np.concatenate([np.asarray(s2v0), stage2_images], axis=0).reshape(
        -1, size, size, 3
    )

    def run_recon():
        pipe.recon.reconstruct(src, camera_pack, resolution=args.mesh_resolution)

    emit("reconstruct", *span(run_recon, args.repeats),
         mesh_resolution=args.mesh_resolution)

    # warm end-to-end
    def run_e2e():
        pipe.run(img, skip_preprocess=True,
                 mesh_resolution=args.mesh_resolution, seed=1)

    emit("end_to_end", *span(run_e2e, 1))


if __name__ == "__main__":
    main()
