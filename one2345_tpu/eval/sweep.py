"""Eval sweep CLI: directory of (pred, GT) meshes -> CD / F-score table.

The GSO/Objaverse protocol driver the reference lacks: it only ships the
Blender render harness (render/launch_render_eval.py:19-43) and keeps the
metric numbers in the paper.  This walks two directories, pairs meshes by
stem (ignoring `_ours` / `_gt` / `_pred` suffixes, matching the in-tree
example pair render/examples/{ours/backpack_ours.obj,
objaverse/backpack_gt.glb}), computes Chamfer + F-score per pair, and emits
one JSON table.

    python -m one2345_tpu.eval.sweep --pred_dir exp/preds --gt_dir data/gso \
        [--out results.json] [--n_points 16384] [--threshold 0.05] \
        [--render_dir renders/]

`--render_dir` additionally saves the 24-view eval renders of each
prediction (render/single_render_eval.py protocol, in-tree rasterizer).
"""

from __future__ import annotations

import json
import os

import numpy as np

MESH_EXTS = (".ply", ".obj", ".glb")
_SUFFIXES = ("_ours", "_gt", "_pred", "_gen")


def load_obj(path: str):
    """Minimal OBJ loader: v (with optional vertex colors) + f (any of the
    v, v/vt, v/vt/vn, v//vn forms; fans polygons into triangles)."""
    verts, colors, faces = [], [], []
    with open(path) as fh:
        for line in fh:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(x) for x in parts[1:4]])
                if len(parts) >= 7:
                    colors.append([float(x) for x in parts[4:7]])
            elif line.startswith("f "):
                idx = [int(p.split("/")[0]) for p in line.split()[1:]]
                idx = [i - 1 if i > 0 else len(verts) + i for i in idx]
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    v = np.asarray(verts, np.float32)
    f = np.asarray(faces, np.int32) if faces else np.zeros((0, 3), np.int32)
    c = np.asarray(colors, np.float32) if len(colors) == len(verts) else None
    return v, f, c


def load_mesh(path: str):
    """(verts [N,3], faces [M,3], colors [N,3]|None) from .ply/.obj/.glb."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".ply":
        from one2345_tpu.recon.mesh_extract import load_ply

        v, f, c = load_ply(path)
    elif ext == ".obj":
        v, f, c = load_obj(path)
    elif ext == ".glb":
        from one2345_tpu.recon.gltf import load_glb

        v, f, c = load_glb(path)
    else:
        raise ValueError(f"unsupported mesh format: {path}")
    return (
        np.asarray(v, np.float32),
        np.asarray(f, np.int32),
        None if c is None else np.asarray(c, np.float32),
    )


def _stem(name: str) -> str:
    s = os.path.splitext(name)[0]
    for suf in _SUFFIXES:
        if s.endswith(suf):
            s = s[: -len(suf)]
    return s


def discover_pairs(pred_dir: str, gt_dir: str) -> list[tuple[str, str, str]]:
    """[(key, pred_path, gt_path)] matched by suffix-stripped stem."""

    def index(d):
        out = {}
        for root, _, files in os.walk(d):
            for f in sorted(files):
                if f.lower().endswith(MESH_EXTS):
                    out.setdefault(_stem(f), os.path.join(root, f))
        return out

    preds = index(pred_dir)
    gts = index(gt_dir)
    return [(k, preds[k], gts[k]) for k in sorted(preds) if k in gts]


def run_sweep(
    pred_dir: str,
    gt_dir: str,
    n_points: int = 16384,
    threshold: float = 0.05,
    render_dir: str | None = None,
    clip_scorer=None,
) -> dict:
    """:param clip_scorer: optional `eval.clip_metric.ClipScorer` — adds
    the paper's third metric (24-view CLIP similarity) per mesh pair."""
    from one2345_tpu.eval.metrics import evaluate_mesh_pair

    pairs = discover_pairs(pred_dir, gt_dir)
    rows = []
    for key, ppath, gpath in pairs:
        pv, pf, pc = load_mesh(ppath)
        gv, gf, gc = load_mesh(gpath)
        m = evaluate_mesh_pair(pv, pf, gv, gf, n_points=n_points,
                               fscore_threshold=threshold)
        # rasterize the prediction's 24 eval views at most once — both the
        # CLIP metric and --render_dir consume them, WITH vertex colors
        # (the paper's CLIP similarity compares rendered appearance)
        pred_views = None
        if clip_scorer is not None or render_dir:
            from one2345_tpu.eval.render_harness import render_eval_views

            pred_views = render_eval_views(pv, pf, pc)
        if clip_scorer is not None:
            gt_views = render_eval_views(gv, gf, gc)
            m["clip_sim"] = clip_scorer.similarity_from_renders(
                pred_views, gt_views
            )
        rows.append({"name": key, "pred": ppath, "gt": gpath, **m})
        if render_dir:
            _save_renders(key, pred_views, render_dir)
    summary = {}
    if rows:
        metrics = ["chamfer_l2", "chamfer_l1", "f_score"]
        if clip_scorer is not None:
            metrics.append("clip_sim")
        for metric in metrics:
            summary[metric] = float(np.mean([r[metric] for r in rows]))
    return {
        "n_pairs": len(rows),
        "threshold": threshold,
        "n_points": n_points,
        "summary": summary,
        "per_mesh": rows,
    }


def _save_renders(key: str, views, render_dir: str):
    from PIL import Image

    out = os.path.join(render_dir, key)
    os.makedirs(out, exist_ok=True)
    for i, v in enumerate(views):
        Image.fromarray((np.clip(v, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(out, f"{i:03d}.png")
        )


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--pred_dir", required=True)
    p.add_argument("--gt_dir", required=True)
    p.add_argument("--out", default=None, help="write the JSON table here")
    p.add_argument("--n_points", type=int, default=16384)
    p.add_argument("--threshold", type=float, default=0.05)
    p.add_argument("--render_dir", default=None,
                   help="save 24-view eval renders per prediction")
    p.add_argument("--clip_params", default=None, nargs="?", const="",
                   help="add the 24-view CLIP-similarity metric; pass an "
                        "orbax dir from convert_cli for real ViT-L/14 "
                        "weights (bare flag = random weights, protocol "
                        "check only)")
    args = p.parse_args(argv)

    clip_scorer = None
    if args.clip_params is not None:
        from one2345_tpu.eval.clip_metric import ClipScorer

        params = None
        if args.clip_params:
            from one2345_tpu.core import checkpoint

            tree = checkpoint.restore(args.clip_params)
            params = tree.get("zero123", tree).get("clip")
            if params is None:
                # a real-checkpoint run must not silently degrade to the
                # random tower (only the bare flag means protocol-check mode)
                raise SystemExit(
                    f"--clip_params {args.clip_params}: checkpoint has no "
                    "'clip' (or 'zero123/clip') subtree — pass a convert_cli "
                    "output dir, or use the bare flag for random weights"
                )
        clip_scorer = ClipScorer(params)

    table = run_sweep(args.pred_dir, args.gt_dir, args.n_points,
                      args.threshold, args.render_dir, clip_scorer=clip_scorer)
    text = json.dumps(table, indent=2)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(text)
    print(text)
    return table


if __name__ == "__main__":
    main()
