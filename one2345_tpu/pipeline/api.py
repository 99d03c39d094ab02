"""Service API surface — the reference's Gradio endpoint contract.

Parity target: demo/app.py endpoints documented in README.md:170-215
(`/preprocess`, `/estimate_elevation`, `/generate_mesh`) plus the per-view
retry semantics of the demo UI (stage1_run is_rerun, demo/app.py:276-322).

The web framework itself is optional (gradio is not in this image); this
module exposes the operations as plain callables so any HTTP layer can wrap
them, and `build_gradio_app` wires a UI when gradio is importable.
"""

from __future__ import annotations

import numpy as np

from one2345_tpu.pipeline.runner import One2345Pipeline


class One2345Service:
    """Stateful service with the demo's three endpoints + per-view retry."""

    def __init__(self, pipeline: One2345Pipeline | None = None):
        self.pipeline = pipeline or One2345Pipeline()
        self._session: dict = {}

    # ---- /preprocess (demo/app.py preprocess_run:388)
    def preprocess(self, image: np.ndarray) -> np.ndarray:
        """Segment + recenter; returns the 256^2 white-bg input image."""
        out = self.pipeline.preprocess(image)
        self._session["input_256"] = out
        return out

    # ---- /estimate_elevation (demo/app.py stage1_run:276 + elevation)
    def estimate_elevation(self, image: np.ndarray | None = None, seed: int = 0) -> float:
        """Run stage-1 view 0..3 + its nearby views, estimate elevation.
        Caches stage-1/stage-2 results for generate_mesh."""
        import jax

        cfg = self.pipeline.config
        input_256 = image if image is not None else self._session["input_256"]
        key = jax.random.key(seed)
        k1, k2 = jax.random.split(key)
        s1_all = np.asarray(self.pipeline.zero123.stage1(input_256, k1))
        s2_v0 = np.asarray(
            self.pipeline.zero123.stage2(
                s1_all[:1], k2, steps=cfg.diffusion.ddim_steps_stage2
            )
        )
        polar = self.pipeline.estimate_elevation(s2_v0[0])
        self._session.update(
            input_256=input_256, stage1_all=s1_all, stage2_v0=s2_v0, polar=polar
        )
        return 90.0 - polar  # the demo reports elevation above the equator

    # ---- per-view retry (demo/app.py stage1_run(is_rerun):306-322)
    def regenerate_view(self, view_idx: int, seed: int = 0) -> np.ndarray:
        """Re-sample a single stage-1 view (and refresh its nearby views)."""
        import jax

        s1 = np.array(self._session["stage1_all"])  # writable copy
        self._session["stage1_all"] = s1
        key = jax.random.key(seed)
        new_view = np.asarray(
            self.pipeline.zero123.stage1(
                self._session["input_256"], key, indices=[view_idx]
            )
        )[0]
        s1[view_idx] = new_view
        if view_idx == 0:
            self._session["stage2_v0"] = np.asarray(
                self.pipeline.zero123.stage2(s1[:1], jax.random.fold_in(key, 1))
            )
        return new_view

    # ---- /generate_mesh (demo/app.py stage2_run:324)
    def generate_mesh(
        self, out_dir: str | None = None, mesh_resolution: int = 256, seed: int = 0
    ) -> dict:
        import jax

        from one2345_tpu.geometry import cameras as cam

        cfg = self.pipeline.config
        polar = self._session["polar"]
        s1_all = self._session["stage1_all"]
        sel = list(range(8)) if polar <= 75 else list(range(4)) + list(range(8, 12))
        stage1_images = s1_all[sel]
        rest = np.asarray(
            self.pipeline.zero123.stage2(
                stage1_images[1:], jax.random.key(seed),
                steps=cfg.diffusion.ddim_steps_stage2,
            )
        )
        stage2_images = np.concatenate([self._session["stage2_v0"], rest], axis=0)
        camera_pack = cam.build_recon_cameras(polar)
        src = stage2_images.reshape(-1, *stage2_images.shape[2:])
        out_path = f"{out_dir}/mesh.ply" if out_dir else None
        if out_dir:
            import os

            os.makedirs(out_dir, exist_ok=True)
        return self.pipeline.recon.reconstruct(
            src, camera_pack, resolution=mesh_resolution, out_path=out_path
        )


def build_gradio_app(service: One2345Service | None = None):
    """Optional Gradio UI (gated: gradio is not baked into this image)."""
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover
        raise ImportError("gradio is not installed in this environment") from e

    service = service or One2345Service()
    with gr.Blocks(title="One-2-3-45 TPU") as demo:
        inp = gr.Image(label="Input image", type="numpy")
        pre = gr.Image(label="Preprocessed (256x256)")
        elev = gr.Number(label="Estimated elevation (deg)")
        mesh_file = gr.Model3D(label="Mesh")
        b1 = gr.Button("Preprocess")
        b2 = gr.Button("Estimate elevation")
        b3 = gr.Button("Generate mesh")
        b1.click(service.preprocess, inp, pre, api_name="preprocess")
        b2.click(lambda: service.estimate_elevation(), None, elev, api_name="estimate_elevation")

        def _gen():
            out = service.generate_mesh(out_dir="exp/gradio")
            return out.get("path")

        b3.click(_gen, None, mesh_file, api_name="generate_mesh")
    return demo
