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

from one2345_tpu.pipeline.runner import One2345Pipeline, UnsafeImageError


def _unsafe_placeholder(size: int) -> np.ndarray:
    """Flat mid-gray stand-in for the demo's unsafe.png (app.py:383)."""
    return np.full((size, size, 3), 0.5, np.float32)


class One2345Service:
    """Stateful service with the demo's three endpoints + per-view retry."""

    def __init__(self, pipeline: One2345Pipeline | None = None):
        self.pipeline = pipeline or One2345Pipeline()
        self._session: dict = {}

    # ---- bbox initializer for the slider flow (demo/app.py init_bbox:418)
    def init_bbox(self, image: np.ndarray) -> dict:
        """Estimate the foreground bbox of the (thumbnailed) input.

        :return: {'bbox': (x0, y0, x1, y1) in the 512-thumb frame,
                  'preview': uint8 RGB with the box drawn}
        """
        from PIL import Image

        from one2345_tpu.utils import image as img_utils

        pil = img_utils.thumbnail(Image.fromarray(image), 512)
        arr = np.asarray(pil)
        if arr.shape[-1] == 4:
            rgb = (img_utils.composite_white(arr.astype(np.float32) / 255.0) * 255
                   ).astype(np.uint8)
        else:
            rgb = arr.copy()
        # prefer SAM's own object proposal (the demo seeds its sliders from
        # rembg, app.py:418); saliency fallback when SAM is off/degenerate
        box = None
        if self.pipeline.use_sam:
            try:
                # set_image memoizes by content: the follow-up /preprocess
                # on the same thumb reuses this encoding
                box = self.pipeline.sam.seed_bbox(self.pipeline.sam.set_image(rgb))
            except Exception as e:  # noqa: BLE001 — degrade, but loudly
                import logging

                logging.getLogger(__name__).warning(
                    "SAM bbox seeding failed (%s: %s); using saliency fallback",
                    type(e).__name__, e,
                )
                box = None
        x0, y0, x1, y1 = box if box is not None else img_utils.estimate_bbox(rgb)
        preview = rgb.copy()
        color = np.array([88, 191, 131], np.uint8)  # app.py:398 box color
        t = max(2, max(preview.shape) // 200)
        preview[y0:y0 + t, x0:x1] = color
        preview[max(y1 - t, 0):y1, x0:x1] = color
        preview[y0:y1, x0:x0 + t] = color
        preview[y0:y1, max(x1 - t, 0):x1] = color
        return {"bbox": (int(x0), int(y0), int(x1), int(y1)), "preview": preview}

    # ---- /preprocess (demo/app.py preprocess_run:388)
    def preprocess(
        self, image: np.ndarray, bbox: tuple[int, int, int, int] | None = None
    ) -> np.ndarray:
        """NSFW gate -> segment (optional bbox-slider prompt) -> recenter.
        A flagged image returns the unsafe placeholder (app.py:376-391) and
        sets session['unsafe']."""
        try:
            out = self.pipeline.preprocess(image, bbox=bbox)
        except UnsafeImageError:
            # wipe ALL cached stage state: downstream endpoints must not
            # silently serve the previous request's image/views/mesh
            self._session.clear()
            self._session["unsafe"] = True
            return _unsafe_placeholder(self.pipeline.config.diffusion.image_size)
        self._session.clear()
        self._session["input_256"] = out
        return out

    @property
    def last_input_unsafe(self) -> bool:
        return bool(self._session.get("unsafe", False))

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

    def selected_view_indices(self) -> list[int]:
        """The 8 stage-1 view ids the mesh is built from — elevation-
        dependent (run.py:41-54): ring 4..7 below 75 deg polar, 8..11 above."""
        polar = self._session.get("polar", 90.0)
        return list(range(8)) if polar <= 75 else list(range(4)) + list(range(8, 12))

    # ---- per-view retry (demo/app.py stage1_run(is_rerun):306-322)
    def regenerate_view(self, view_idx: int, seed: int | None = None) -> np.ndarray:
        """Re-sample a single stage-1 view (and refresh its nearby views)."""
        return self.regenerate_views([view_idx], seed)[0]

    def regenerate_views(
        self, view_idxs: list[int], seed: int | None = None
    ) -> np.ndarray:
        """Re-sample the selected stage-1 views — the demo's 'Regenerate
        selected view(s)' checkboxes (app.py:276-322 is_rerun path).

        With no explicit seed each call draws from a fresh per-session
        counter, so repeated retries of a bad view produce NEW candidates
        (matching the demo's re-randomized retry)."""
        import jax

        if seed is None:
            seed = 1000 + self._session.get("retry_count", 0)
            self._session["retry_count"] = self._session.get("retry_count", 0) + 1
        s1 = np.array(self._session["stage1_all"])  # writable copy
        self._session["stage1_all"] = s1
        key = jax.random.key(seed)
        new_views = np.asarray(
            self.pipeline.zero123.stage1(
                self._session["input_256"], key, indices=list(view_idxs)
            )
        )
        for k, idx in enumerate(view_idxs):
            s1[idx] = new_views[k]
        if 0 in view_idxs:
            self._session["stage2_v0"] = np.asarray(
                self.pipeline.zero123.stage2(s1[:1], jax.random.fold_in(key, 1))
            )
        return new_views

    # ---- regenerate-mesh chaining (demo/app.py regen_mesh_btn:622-626)
    def regenerate_mesh(
        self, out_dir: str | None = None, mesh_resolution: int = 256, seed: int = 0
    ) -> dict:
        """Re-run stage 2 + reconstruction from the (possibly retried)
        cached stage-1 views."""
        return self.generate_mesh(out_dir, mesh_resolution, seed)

    # ---- camera-pose visualization (demo/app.py CameraVisualizer:112,
    #      calc_cam_cone_pts_3d:48) as frontend-agnostic polyline data
    def camera_visualization(self, polar: float | None = None) -> dict:
        """Frustum-cone polylines for the input view + the 8 stage-1 views.

        :return: {'input_cone': [16,3], 'view_cones': [8,16,3],
                  'image': the preprocessed input or None}
        """
        from one2345_tpu.geometry import cameras as cam
        from one2345_tpu.utils.image import camera_cone_points

        polar = self._session.get("polar", 90.0) if polar is None else polar
        pack = cam.build_recon_cameras(float(polar))
        input_cone = camera_cone_points(np.asarray(pack["c2ws"][0]))
        view_c2ws = np.linalg.inv(np.asarray(pack["target_w2cs"]))  # stage-1 ring
        cones = np.stack([camera_cone_points(c) for c in view_c2ws])
        return {
            "input_cone": input_cone,
            "view_cones": cones,
            "image": self._session.get("input_256"),
        }

    # ---- /generate_mesh (demo/app.py stage2_run:324)
    def generate_mesh(
        self, out_dir: str | None = None, mesh_resolution: int = 256, seed: int = 0
    ) -> dict:
        import jax

        from one2345_tpu.geometry import cameras as cam

        cfg = self.pipeline.config
        s1_all = self._session["stage1_all"]
        sel = self.selected_view_indices()
        stage1_images = s1_all[sel]
        rest = np.asarray(
            self.pipeline.zero123.stage2(
                stage1_images[1:], jax.random.key(seed),
                steps=cfg.diffusion.ddim_steps_stage2,
            )
        )
        stage2_images = np.concatenate([self._session["stage2_v0"], rest], axis=0)
        camera_pack = cam.build_recon_cameras(self._session["polar"])
        src = stage2_images.reshape(-1, *stage2_images.shape[2:])
        out_path = f"{out_dir}/mesh.ply" if out_dir else None
        if out_dir:
            import os

            os.makedirs(out_dir, exist_ok=True)
        return self.pipeline.recon.reconstruct(
            src, camera_pack, resolution=mesh_resolution, out_path=out_path
        )


def build_gradio_app(service: One2345Service | None = None):
    """Optional Gradio UI mirroring the reference demo surface
    (demo/app.py:441-626): bbox sliders with live preview, per-view retry
    checkboxes + regenerate-mesh chaining, camera-cone pose plot.

    Gated: gradio is not baked into this image — the service methods above
    carry all the logic so any frontend can wrap them."""
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover
        raise ImportError("gradio is not installed in this environment") from e

    service = service or One2345Service()
    with gr.Blocks(title="One-2-3-45 TPU") as demo:
        with gr.Row():
            with gr.Column():
                inp = gr.Image(label="Input image", type="numpy")
                bbox_preview = gr.Image(label="Foreground bbox")
                with gr.Row():
                    x_min = gr.Slider(0, 512, 0, step=1, label="bbox x_min")
                    y_min = gr.Slider(0, 512, 0, step=1, label="bbox y_min")
                with gr.Row():
                    x_max = gr.Slider(0, 512, 512, step=1, label="bbox x_max")
                    y_max = gr.Slider(0, 512, 512, step=1, label="bbox y_max")
                pre = gr.Image(label="Preprocessed (256x256)")
            with gr.Column():
                elev = gr.Number(label="Estimated elevation (deg)")
                cam_plot = gr.Plot(label="Camera poses")
                views = gr.Gallery(label="Stage-1 views", columns=4)
                retry = gr.CheckboxGroup(
                    [str(i) for i in range(8)], label="Retry view(s)"
                )
                mesh_file = gr.Model3D(label="Mesh")
        b1 = gr.Button("Preprocess")
        b2 = gr.Button("Estimate elevation & views")
        b3 = gr.Button("Generate mesh")
        b4 = gr.Button("Regenerate selected view(s)")
        b5 = gr.Button("Regenerate nearby views and mesh")

        def _init_bbox(image):
            out = service.init_bbox(image)
            x0, y0, x1, y1 = out["bbox"]
            return out["preview"], x0, y0, x1, y1

        inp.change(_init_bbox, inp, [bbox_preview, x_min, y_min, x_max, y_max])

        def _pre(image, x0, y0, x1, y1):
            return service.preprocess(image, bbox=(int(x0), int(y0), int(x1), int(y1)))

        b1.click(_pre, [inp, x_min, y_min, x_max, y_max], pre, api_name="preprocess")

        def _cam_figure():
            import plotly.graph_objects as go

            viz = service.camera_visualization()
            fig = go.Figure()
            for cone, name in [(viz["input_cone"], "input")] + [
                (c, f"view {i}") for i, c in enumerate(viz["view_cones"])
            ]:
                fig.add_trace(
                    go.Scatter3d(
                        x=cone[:, 0], y=cone[:, 1], z=cone[:, 2],
                        mode="lines", name=name,
                    )
                )
            return fig

        def _estimate():
            e = service.estimate_elevation()
            s1 = service._session["stage1_all"]
            sel = service.selected_view_indices()
            gallery = [(np.clip(s1[i] * 255, 0, 255)).astype(np.uint8) for i in sel]
            return e, _cam_figure(), gallery

        b2.click(_estimate, None, [elev, cam_plot, views], api_name="estimate_elevation")

        def _gen():
            out = service.generate_mesh(out_dir="exp/gradio")
            return out.get("path")

        b3.click(_gen, None, mesh_file, api_name="generate_mesh")

        def _retry(selected):
            # checkbox labels are gallery SLOTS (0..7); map to the actual
            # elevation-dependent view ids (8..11 in the high branch)
            sel = service.selected_view_indices()
            service.regenerate_views([sel[int(s)] for s in selected])
            s1 = service._session["stage1_all"]
            return [(np.clip(s1[i] * 255, 0, 255)).astype(np.uint8) for i in sel]

        b4.click(_retry, retry, views)

        def _regen_mesh():
            out = service.regenerate_mesh(out_dir="exp/gradio")
            return out.get("path")

        b5.click(_regen_mesh, None, mesh_file)
    return demo
