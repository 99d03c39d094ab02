"""CLIP view-similarity metric (the paper's third metric, arXiv 2306.16928).

The reference repo ships no metric code at all (SURVEY §6: CD / F-score /
CLIP-similarity live only in the paper).  eval/metrics.py covers CD and
F-score; this module adds the third: render prediction and GT through the
same 24-view protocol (render_harness), CLIP-embed every view with the
in-tree ViT-L/14 tower (diffusion/clip.py — the same module the diffusion
conditioning uses, so converted reference weights apply), and average the
per-view cosine similarity of matched viewpoints.
"""

from __future__ import annotations

import numpy as np

from one2345_tpu.core.config import CLIPVisionConfig


class ClipScorer:
    """Embeds image batches with CLIP ViT-L/14 and scores mesh pairs.

    :param params: flax variables for `CLIPVisionTower` (e.g.
        `checkpoint.restore(dir)["zero123"]["clip"]`); random init when
        None — correct protocol, meaningless absolute numbers.
    """

    def __init__(self, params=None, config: CLIPVisionConfig | None = None,
                 seed: int = 0):
        import jax
        import jax.numpy as jnp

        from one2345_tpu.diffusion.clip import CLIPVisionTower

        self.config = config or CLIPVisionConfig()
        c = self.config
        self.tower = CLIPVisionTower(
            image_size=c.image_size, patch_size=c.patch_size, width=c.width,
            layers=c.layers, heads=c.heads, embed_dim=c.embed_dim,
            dtype=jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32,
        )
        if params is None:
            params = jax.jit(self.tower.init)(
                jax.random.key(seed),
                jnp.zeros((1, c.image_size, c.image_size, 3)),
            )
        self.params = params
        self._embed_jit = jax.jit(self.tower.apply)

    def embed(self, images: np.ndarray) -> np.ndarray:
        """[N, H, W, 3] float [0, 1] -> [N, D] L2-normalized embeddings."""
        import jax.numpy as jnp

        from one2345_tpu.diffusion.clip import preprocess_for_clip

        x = jnp.asarray(images, jnp.float32) * 2.0 - 1.0  # [-1, 1]
        emb = np.asarray(
            self._embed_jit(
                self.params, preprocess_for_clip(x, self.config.image_size)
            ),
            np.float32,
        )
        return emb / (np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)

    def similarity_from_renders(self, pred: np.ndarray, gt: np.ndarray) -> float:
        """Mean cosine similarity of matched views ([V, H, W, 3] each)."""
        assert pred.shape[0] == gt.shape[0], (pred.shape, gt.shape)
        ep, eg = self.embed(pred), self.embed(gt)
        return float(np.mean(np.sum(ep * eg, axis=-1)))

    def similarity(self, pred_mesh, gt_mesh, res: int = 224) -> float:
        """24-view protocol similarity between two (verts, faces[, colors])
        mesh tuples."""
        from one2345_tpu.eval.render_harness import render_eval_views

        def renders(mesh):
            v, f = mesh[0], mesh[1]
            c = mesh[2] if len(mesh) > 2 and mesh[2] is not None else None
            return render_eval_views(v, f, c, res=res)

        return self.similarity_from_renders(renders(pred_mesh), renders(gt_mesh))
