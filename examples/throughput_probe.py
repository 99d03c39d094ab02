"""Sustained serving throughput: run_many overlapped requests on the TPU.

Measures meshes/sec over N back-to-back requests (after a warm-up run) at
any sampler/steps/quant configuration; the README serving numbers come
from here.  Run on a QUIET host (see CLAUDE.md).

    PYTHONPATH=/root/.axon_site:/root/repo python examples/throughput_probe.py \
        [--sampler dpmpp|ddim] [--steps S1 S2] [--quant none|int8] [--n 6]
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
    ap.add_argument("--sampler", choices=["ddim", "plms", "dpmpp"], default="ddim")
    ap.add_argument("--steps", type=int, nargs=2, default=None, metavar=("S1", "S2"))
    ap.add_argument("--quant", choices=["none", "int8"], default="none")
    ap.add_argument("--n", type=int, default=6, help="requests in the batch")
    ap.add_argument("--in_flight", type=int, default=2)
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
    imgs = []
    for _ in range(args.n):
        img = np.full((512, 512, 3), 255, np.uint8)
        img[128:384, 128:384] = rng.uniform(40, 200, (256, 256, 3)).astype(np.uint8)
        imgs.append(img)

    pipe.run(imgs[0], skip_preprocess=False, mesh_resolution=256, seed=0)  # warm
    t0 = time.perf_counter()
    results = pipe.run_many(
        imgs, seeds=list(range(1, args.n + 1)), max_in_flight=args.in_flight,
        skip_preprocess=False, mesh_resolution=256,
    )
    dt = time.perf_counter() - t0
    print(json.dumps({
        "mode": mode,
        "requests": args.n,
        "in_flight": args.in_flight,
        "secs_per_mesh_sustained": round(dt / args.n, 3),
        "meshes_per_sec": round(args.n / dt, 4),
        "vs_reference_baseline": round(45.0 / (dt / args.n), 2),
        "mesh_vertices": [int(len(r.vertices)) for r in results],
    }), flush=True)


if __name__ == "__main__":
    main()
