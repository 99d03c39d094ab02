"""Measure the DPM-Solver++(2M) fast mode end-to-end on the TPU.

The reference-semantics bench (bench.py) keeps DDIM 77/50; this probe
measures the opt-in fast mode (sampler='dpmpp', 30/25 steps) on the same
synthetic input.  Run on a QUIET host (see CLAUDE.md).

    PYTHONPATH=/root/.axon_site:/root/repo python examples/fast_mode_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from one2345_tpu.core.config import PipelineConfig
    from one2345_tpu.pipeline.runner import One2345Pipeline

    cfg = PipelineConfig()
    cfg = cfg.replace(
        diffusion=cfg.diffusion.replace(
            sampler="dpmpp", ddim_steps_stage1=30, ddim_steps_stage2=25
        )
    )
    pipe = One2345Pipeline(cfg, use_sam=True)

    rng = np.random.default_rng(0)
    img = np.full((512, 512, 3), 255, np.uint8)
    img[128:384, 128:384] = rng.uniform(40, 200, (256, 256, 3)).astype(np.uint8)

    pipe.run(img, skip_preprocess=False, mesh_resolution=256, seed=0)  # warm-up
    runs = []
    for i in range(3):
        t0 = time.perf_counter()
        result = pipe.run(img, skip_preprocess=False, mesh_resolution=256,
                          seed=1 + i)
        runs.append((time.perf_counter() - t0, result))
    dt, result = min(runs, key=lambda r: r[0])
    print(json.dumps({
        "mode": "dpmpp 30/25",
        "secs_image_to_mesh": round(dt, 3),
        "all_runs_s": [round(r[0], 3) for r in runs],
        "vs_reference_baseline": round(45.0 / dt, 2),
        "timings": {k: round(v, 3) for k, v in result.timings.items()},
        "mesh_vertices": int(len(result.vertices)),
    }), flush=True)


if __name__ == "__main__":
    main()
