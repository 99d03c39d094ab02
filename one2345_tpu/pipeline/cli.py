"""CLI entry point — flag-compatible with the reference's run.py:99-119.

    python -m one2345_tpu.pipeline.cli --img_path input.png \
        --half_precision --mesh_resolution 256 --output_format .ply
"""

from __future__ import annotations

import argparse
import json
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="One-2-3-45 TPU: image -> textured mesh")
    p.add_argument("--img_path", type=str, required=True, help="Path to the input image")
    p.add_argument("--gpu_idx", type=int, default=0, help="(compat; device choice is automatic)")
    p.add_argument("--half_precision", action="store_true", help="bf16 compute")
    p.add_argument("--mesh_resolution", type=int, default=256)
    p.add_argument("--output_format", type=str, default=".ply", choices=[".ply", ".obj", ".glb"])
    p.add_argument("--out_dir", type=str, default=None, help="default: ./exp/<name>")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--params", type=str, default=None, help="orbax checkpoint dir with stage params")
    p.add_argument("--no_sam", action="store_true", help="alpha/threshold segmentation instead of SAM")
    # extensions beyond run.py's flag surface
    p.add_argument("--sampler", choices=["ddim", "plms", "dpmpp"], default="ddim",
                   help="dpmpp = DPM-Solver++(2M) fast mode (defaults to "
                        "--steps 30 25; quality unvalidated without real "
                        "weights — see diffusion/dpm_solver.py)")
    p.add_argument("--steps", type=int, nargs=2, default=None,
                   metavar=("S1", "S2"),
                   help="override stage-1/stage-2 REQUESTED denoising step "
                        "counts (reference defaults: 75 50; the schedule's "
                        "+1/divisor quirk makes requested 75 yield 77 "
                        "entries, and the sampler's drop-last quirk runs 76 "
                        "of them, matching the reference)")
    p.add_argument("--quant", choices=["none", "int8"], default="none",
                   help="int8 = W8A8 quantized UNet fast mode (stacks with "
                        "--sampler dpmpp; quality unvalidated without real "
                        "weights — see diffusion/quantize.py)")
    return p


def apply_fast_modes(cfg, sampler="ddim", steps=None, quant="none"):
    """Overlay the opt-in fast-mode knobs on a PipelineConfig.

    ``steps`` are REQUESTED counts (the schedule rounds up to the next
    divisor of 1000 plus the +1 offset — the reference's requested 75
    becomes 77 schedule entries, of which the DDIM sampler executes 76;
    see diffusion/schedule.py + diffusion/ddim.py::trim_for_sample).
    ``steps`` of None keeps the reference defaults (75, 50) for ddim/plms
    and uses (30, 25) for dpmpp."""
    if sampler not in ("ddim", "plms", "dpmpp"):
        raise ValueError(f"unknown sampler {sampler!r}: ddim|plms|dpmpp")
    if steps is None and sampler == "dpmpp":
        steps = (30, 25)
    if sampler != "ddim" or steps or quant != "none":
        d = cfg.diffusion.replace(sampler=sampler)
        if steps:
            d = d.replace(ddim_steps_stage1=steps[0], ddim_steps_stage2=steps[1])
        if quant != "none":
            d = d.replace(unet=d.unet.replace(quant=quant))
        cfg = cfg.replace(diffusion=d)
    return cfg


def build_config(args):
    from one2345_tpu.core.config import PipelineConfig

    cfg = PipelineConfig(half_precision=args.half_precision, seed=args.seed)
    return apply_fast_modes(
        cfg, sampler=args.sampler,
        steps=tuple(args.steps) if args.steps else None, quant=args.quant,
    )


def main(argv=None):
    args = build_parser().parse_args(argv)

    from one2345_tpu.core.compile_cache import enable as enable_cache

    enable_cache()

    import numpy as np
    from PIL import Image

    from one2345_tpu.pipeline.runner import One2345Pipeline

    cfg = build_config(args)
    params = None
    if args.params:
        from one2345_tpu.core import checkpoint

        params = checkpoint.restore(args.params)

    shape_id = os.path.splitext(os.path.basename(args.img_path))[0]
    out_dir = args.out_dir or os.path.join("exp", shape_id)

    pipeline = One2345Pipeline(cfg, params, use_sam=not args.no_sam)
    image = np.asarray(Image.open(args.img_path).convert("RGBA"))
    result = pipeline.run(
        image,
        out_dir=out_dir,
        mesh_resolution=args.mesh_resolution,
        output_format=args.output_format,
        seed=args.seed,
    )
    print("Mesh saved to:", result.mesh_path)
    print(json.dumps({"elevation": result.elevation, "timings": result.timings}))
    return result


if __name__ == "__main__":
    main()
