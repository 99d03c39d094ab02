"""Per-stage profiler: runs the pipeline with jax.profiler traces.

    python examples/profile_pipeline.py --trace_dir /tmp/one2345_trace

Produces a TensorBoard-compatible trace of one warm end-to-end run plus the
per-stage wall-clock table (the observability the reference lacks —
SURVEY §5 lists only ad-hoc wall-clock prints).
"""

# allow `python examples/<name>.py` from the repo root without installing
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import json

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace_dir", default="/tmp/one2345_trace")
    p.add_argument("--mesh_resolution", type=int, default=256)
    args = p.parse_args()

    import jax

    from one2345_tpu.core.config import PipelineConfig
    from one2345_tpu.pipeline.runner import One2345Pipeline

    pipe = One2345Pipeline(PipelineConfig(), use_sam=False)
    rng = np.random.default_rng(0)
    img = np.ones((256, 256, 3), np.float32)
    img[64:192, 64:192] = rng.uniform(0.2, 0.8, (128, 128, 3))

    # warm-up (compiles)
    pipe.run(img, skip_preprocess=True, mesh_resolution=args.mesh_resolution, seed=0)

    with jax.profiler.trace(args.trace_dir):
        result = pipe.run(
            img, skip_preprocess=True, mesh_resolution=args.mesh_resolution, seed=1
        )
    print(json.dumps({k: round(v, 3) for k, v in result.timings.items()}, indent=2))
    print(f"trace written to {args.trace_dir} (view with TensorBoard)")


if __name__ == "__main__":
    main()
