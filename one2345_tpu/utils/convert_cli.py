"""Checkpoint conversion CLI: reference .ckpt/.pth -> one orbax params tree.

    python -m one2345_tpu.utils.convert_cli \
        --zero123 zero123-xl.ckpt --sam sam_vit_h_4b8939.pth \
        --loftr indoor_ds_new.ckpt --recon ckpt_215000.pth \
        --out params/

The output directory loads via `--params` on the pipeline CLI or
`checkpoint.restore(...)` (the TPU replacement for download_ckpt.py +
the reference's three ad-hoc loading paths).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Convert reference checkpoints to orbax")
    p.add_argument("--zero123", type=str, default=None, help="zero123-xl.ckpt")
    p.add_argument("--sam", type=str, default=None, help="sam_vit_h_4b8939.pth")
    p.add_argument("--loftr", type=str, default=None, help="indoor_ds_new.ckpt")
    p.add_argument("--recon", type=str, default=None, help="ckpt_215000.pth")
    p.add_argument("--safety", type=str, default=None,
                   help="HF stable-diffusion-safety-checker state dict (.pt/.bin)")
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args(argv)

    from one2345_tpu.core import checkpoint
    from one2345_tpu.utils import convert_weights as cw

    tree = {}
    if args.zero123:
        print(f"converting {args.zero123} ...")
        tree["zero123"] = cw.convert_zero123(cw.load_torch_state_dict(args.zero123))
    if args.sam:
        print(f"converting {args.sam} ...")
        tree["sam"] = cw.convert_sam(cw.load_torch_state_dict(args.sam))
    if args.loftr:
        print(f"converting {args.loftr} ...")
        tree["loftr"] = cw.convert_loftr(cw.load_torch_state_dict(args.loftr))
    if args.recon:
        print(f"converting {args.recon} ...")
        import torch

        ckpt = torch.load(args.recon, map_location="cpu", weights_only=False)
        tree["recon"] = cw.convert_recon(ckpt)
    if args.safety:
        print(f"converting {args.safety} ...")
        from one2345_tpu.segmentation.safety import convert_safety_checker

        checker = convert_safety_checker(cw.load_torch_state_dict(args.safety))
        tree["safety"] = {
            "concept_embeds": checker.concept_embeds,
            "concept_thresholds": checker.concept_thresholds,
            "special_embeds": checker.special_embeds,
            "special_thresholds": checker.special_thresholds,
            # thresholds above are already x1.2-scaled — load with scale 1
            "threshold_scale": 1.0,
        }
    if not tree:
        p.error("nothing to convert — pass at least one checkpoint path")

    checkpoint.save(args.out, tree)
    print(f"saved {sorted(tree)} -> {args.out}")


if __name__ == "__main__":
    main()
