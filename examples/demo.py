"""Example: single image -> textured 3D mesh (the reference's example.ipynb).

Run on a TPU host:

    python examples/demo.py --img_path my_object.png --out_dir exp/demo

Artifacts land in the reference-compatible layout:
    exp/demo/mesh.ply        vertex-colored mesh
    exp/demo/stage1_8/       8 first-stage views
    exp/demo/stage2_8/       32 second-stage views
    exp/demo/pose.json       camera rig (focal 280, near/far [0.5, 1.8])
"""

# allow `python examples/<name>.py` from the repo root without installing
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse

import numpy as np
from PIL import Image

from one2345_tpu.core.compile_cache import enable as enable_cache
from one2345_tpu.core.config import PipelineConfig
from one2345_tpu.pipeline.runner import One2345Pipeline


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--img_path", required=True)
    parser.add_argument("--out_dir", default="exp/demo")
    parser.add_argument("--mesh_resolution", type=int, default=256)
    parser.add_argument("--params", default=None, help="orbax checkpoint of stage params")
    args = parser.parse_args()

    enable_cache()
    params = None
    if args.params:
        from one2345_tpu.core import checkpoint

        params = checkpoint.restore(args.params)

    pipe = One2345Pipeline(PipelineConfig(), params, use_sam=params is not None)
    image = np.asarray(Image.open(args.img_path).convert("RGBA"))
    result = pipe.run(image, out_dir=args.out_dir, mesh_resolution=args.mesh_resolution)

    print(f"elevation: {result.elevation:.0f} deg")
    print(f"mesh: {result.mesh_path}  ({len(result.vertices)} verts)")
    for stage, secs in result.timings.items():
        print(f"  {stage:>14}: {secs:.2f}s")

    # evaluate against a ground-truth mesh, if you have one:
    #   from one2345_tpu.recon.mesh_extract import load_ply
    #   from one2345_tpu.eval.metrics import evaluate_mesh_pair
    #   gv, gf, _ = load_ply("gt.ply")
    #   print(evaluate_mesh_pair(result.vertices, result.faces, gv, gf))


if __name__ == "__main__":
    main()
