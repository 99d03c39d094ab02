"""Measure the opt-in fast modes end-to-end on the TPU.

The reference-semantics bench (bench.py) keeps DDIM 77/50 in bf16; this
probe measures the fast-mode stack on the same synthetic input:
DPM-Solver++(2M) at 30/25 steps (default), optionally with the conv-only
int8 UNet (--quant int8), or int8 alone at reference steps
(--sampler ddim --quant int8; the ddim step default is REQUESTED 75/50
= the reference's 77/50 actual timesteps).  Run on a QUIET host
(see CLAUDE.md).

    PYTHONPATH=/root/.axon_site:/root/repo python examples/fast_mode_probe.py \
        [--sampler dpmpp|ddim] [--steps S1 S2] [--quant none|int8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from one2345_tpu.core.config import PipelineConfig
    from one2345_tpu.pipeline.cli import apply_fast_modes
    from one2345_tpu.pipeline.runner import One2345Pipeline

    ap = argparse.ArgumentParser()
    ap.add_argument("--sampler", choices=["ddim", "plms", "dpmpp"], default="dpmpp")
    ap.add_argument("--steps", type=int, nargs=2, default=None, metavar=("S1", "S2"))
    ap.add_argument("--quant", choices=["none", "int8"], default="none")
    args = ap.parse_args()

    cfg = apply_fast_modes(
        PipelineConfig(), sampler=args.sampler,
        steps=tuple(args.steps) if args.steps else None, quant=args.quant,
    )
    d = cfg.diffusion
    mode = f"{args.sampler} {d.ddim_steps_stage1}/{d.ddim_steps_stage2}" + (
        f" +{args.quant}" if args.quant != "none" else "")
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
        "mode": mode,
        "secs_image_to_mesh": round(dt, 3),
        "all_runs_s": [round(r[0], 3) for r in runs],
        "vs_reference_baseline": round(45.0 / dt, 2),
        "timings": {k: round(v, 3) for k, v in result.timings.items()},
        "mesh_vertices": int(len(result.vertices)),
    }), flush=True)


if __name__ == "__main__":
    main()
