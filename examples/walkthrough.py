"""Step-by-step API walkthrough — the example.ipynb equivalent.

Runs every pipeline stage individually through the library API (instead of
the one-call `pipeline.run`) and dumps each stage's artifact, so you can
see and poke at the intermediate results exactly like the reference
notebook (/root/reference/example.ipynb: preprocess -> stage 1 ->
elevation -> stage 2 -> reconstruction):

    python examples/walkthrough.py [--img input.png] [--out exp/walkthrough]

Works on CPU (pass --tiny for toy model sizes + a coarse mesh) or TPU.
"""

# allow `python examples/<name>.py` from the repo root without installing
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--img", default=None, help="input photo (default: synthetic)")
    p.add_argument("--out", default="exp/walkthrough")
    p.add_argument("--tiny", action="store_true",
                   help="toy model sizes — seconds on CPU, for CI/smoke")
    p.add_argument("--params", default=None, help="orbax dir from convert_cli")
    args = p.parse_args(argv)

    if args.tiny:
        # keep CI off the TPU and under a minute
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from one2345_tpu.core.config import PipelineConfig
    from one2345_tpu.pipeline.runner import One2345Pipeline
    from one2345_tpu.utils.image import image_grid

    from PIL import Image

    os.makedirs(args.out, exist_ok=True)
    t_all = time.perf_counter()

    # ------------------------------------------------------------------ config
    if args.tiny:
        from one2345_tpu.core.config import (
            CLIPVisionConfig, DiffusionConfig, ReconConfig, UNetConfig,
            VAEConfig,
        )

        cfg = PipelineConfig(
            diffusion=DiffusionConfig(
                ddim_steps_stage1=3, ddim_steps_stage2=2,
                image_size=32, latent_size=4,
                unet=UNetConfig(
                    model_channels=32, channel_mult=(1, 2),
                    attention_resolutions=(1,), num_heads=4, dtype="float32",
                ),
                vae=VAEConfig(
                    base_channels=16, channel_mult=(1, 2, 2, 2), dtype="float32"
                ),
                clip=CLIPVisionConfig(
                    image_size=28, patch_size=14, width=32, layers=2,
                    heads=2, dtype="float32",
                ),
            ),
            recon=ReconConfig(mesh_resolution=24),
        )
        mesh_res = 24
    else:
        cfg = PipelineConfig()
        mesh_res = cfg.mesh_resolution

    params = None
    if args.params:
        from one2345_tpu.core import checkpoint

        params = checkpoint.restore(args.params)
    pipe = One2345Pipeline(cfg, params, use_sam=not args.tiny)

    # ------------------------------------------------------- 0. input image
    if args.img:
        raw = np.asarray(Image.open(args.img).convert("RGBA"))
    else:
        rng = np.random.default_rng(0)
        raw = np.full((512, 512, 4), 255, np.uint8)
        raw[128:384, 128:384, :3] = rng.uniform(40, 200, (256, 256, 3)).astype(np.uint8)
    print(f"input: {raw.shape[1]}x{raw.shape[0]}")

    # -------------------------------------------------------- 1. preprocess
    # SAM-segment the object, recenter on white at 256^2 (run.py:11-16).
    size = cfg.diffusion.image_size
    input_img = pipe.preprocess(raw, safety_check=False)
    Image.fromarray((input_img * 255).astype(np.uint8)).save(
        os.path.join(args.out, "1_preprocessed.png")
    )
    print(f"1. preprocess -> [{size}, {size}, 3] (1_preprocessed.png)")

    # ------------------------------------- 2. stage-1 views (first ring)
    # 4 same-elevation views at 90-degree azimuth spacing (zero123_utils
    # stage-1 view set), sampled as ONE batch.
    key = jax.random.key(0)
    k1, k2e, k2 = jax.random.split(key, 3)
    s1_first = pipe.zero123.stage1(input_img, k1, indices=[0, 1, 2, 3])
    print(f"2. stage-1 first ring -> {s1_first.shape}")

    # ----------------------------- 3. nearby views + elevation estimate
    # 4 views near view 0 feed the LoFTR pose search (run.py:28-36).
    s2_v0 = pipe.zero123.stage2(
        s1_first[:1], k2e, steps=cfg.diffusion.ddim_steps_stage2, view_ids=[0]
    )
    polar = pipe.estimate_elevation(s2_v0[0])
    print(f"3. elevation estimate: polar={polar:.0f} deg "
          f"(elevation {90 - polar:.0f})")

    # --------------------------------- 4. stage-1 second elevation ring
    # ring choice depends on the estimate (run.py:40-44) — reuse the
    # pipeline's own plan so the tutorial can't drift from production
    from one2345_tpu.pipeline.runner import select_stage1b_plan

    _, _, second = select_stage1b_plan(polar, 1)
    s1_second = pipe.zero123.stage1(input_img, jax.random.fold_in(k1, 1), indices=second)
    import jax.numpy as jnp

    stage1 = jnp.concatenate([s1_first, s1_second], axis=0)
    Image.fromarray(
        (image_grid(np.asarray(stage1), 2, 4) * 255).astype(np.uint8)
    ).save(os.path.join(args.out, "4_stage1_grid.png"))
    print(f"4. stage-1 complete -> {stage1.shape} (4_stage1_grid.png)")

    # ------------------------------------------- 5. stage-2 nearby views
    rest = pipe.zero123.stage2(
        stage1[1:], k2, steps=cfg.diffusion.ddim_steps_stage2,
        view_ids=list(range(1, 8)),
    )
    stage2 = jnp.concatenate([s2_v0, rest], axis=0)  # [8, 4, ...]
    flat = np.asarray(stage2).reshape(-1, *stage2.shape[2:])
    Image.fromarray((image_grid(flat, 4, 8) * 255).astype(np.uint8)).save(
        os.path.join(args.out, "5_stage2_grid.png")
    )
    print(f"5. stage-2 complete -> {stage2.shape} (5_stage2_grid.png)")

    # --------------------------------------------- 6. 3D reconstruction
    from one2345_tpu.geometry import cameras as cam

    camera_pack = cam.build_recon_cameras(polar)
    mesh = pipe.recon.reconstruct(
        jnp.asarray(flat), camera_pack, resolution=mesh_res,
        out_path=os.path.join(args.out, "6_mesh.ply"),
    )
    print(f"6. reconstruction -> {len(mesh['vertices'])} vertices (6_mesh.ply)")

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(
            {
                "elevation_deg": 90.0 - polar,
                "mesh_vertices": int(len(mesh["vertices"])),
                "mesh_faces": int(len(mesh["faces"])),
                "total_secs": round(time.perf_counter() - t_all, 2),
            },
            f, indent=2,
        )
    print(f"done in {time.perf_counter() - t_all:.1f}s -> {args.out}/")


if __name__ == "__main__":
    main()
