"""Image preprocessing: bbox prediction, recenter/rescale, compositing.

Parity targets: utils/utils.py:10-77 (pred_bbox via rembg +
image_preprocess_nosave recenter/rescale) and run.py:11-16 (preprocess).

rembg (onnxruntime u2net) is not in this image; the bbox prompt comes from a
saliency threshold or, preferably, from a SAM mask — the bbox only seeds
SAM's box prompt, so a coarse estimate suffices (it is re-segmented anyway).
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def bbox_from_mask(mask: np.ndarray) -> tuple[int, int, int, int]:
    """(x_min, y_min, x_max, y_max) of the nonzero region (pred_bbox
    semantics, utils/utils.py:10-19)."""
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        h, w = mask.shape
        return 0, 0, w - 1, h - 1
    return int(xs.min()), int(ys.min()), int(xs.max()), int(ys.max())


def estimate_bbox(image: np.ndarray) -> tuple[int, int, int, int]:
    """Coarse foreground bbox without rembg (pred_bbox stand-in,
    utils/utils.py:10-19): per-pixel COLOR distance from the median border
    color, Otsu-thresholded, largest connected component.

    Unlike the earlier gray-contrast version this handles dark and lightly
    textured backgrounds too: the border median estimates whatever the
    background is, Otsu adapts the threshold to the actual contrast
    distribution, and the largest-component pick rejects texture speckle.
    The bbox only seeds SAM's box prompt, so coarse is fine — prefer
    `SamStage.seed_bbox` (the object segmented by SAM itself) when a SAM
    stage is available."""
    import cv2

    img = image[..., :3].astype(np.float32)
    border = np.concatenate([img[0], img[-1], img[:, 0], img[:, -1]], axis=0)
    bg = np.median(border, axis=0)
    dist = np.linalg.norm(img - bg, axis=-1)
    peak = float(dist.max())
    if peak < 12.0:  # blank frame — no object to find
        h, w = dist.shape
        return 0, 0, w - 1, h - 1
    d8 = np.clip(dist * (255.0 / peak), 0, 255).astype(np.uint8)
    _, fg = cv2.threshold(d8, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    fg = cv2.morphologyEx(fg, cv2.MORPH_OPEN, np.ones((5, 5), np.uint8))
    n, labels, stats, _ = cv2.connectedComponentsWithStats(fg)
    if n > 1:
        best = 1 + int(np.argmax(stats[1:, cv2.CC_STAT_AREA]))
        fg = labels == best
    return bbox_from_mask(fg > 0)


def thumbnail(img: Image.Image, size: int = 512) -> Image.Image:
    """run.py:12 — bound the input to 512^2 before segmentation."""
    img = img.copy()
    img.thumbnail([size, size], Image.Resampling.LANCZOS)
    return img


def recenter_rescale(
    rgba: np.ndarray, ratio: float = 0.75, out_size: int = 256
) -> np.ndarray:
    """Crop to the alpha bbox, pad to square with the object filling
    ``ratio`` of the side, resize to 256 and composite on white.

    Mirrors image_preprocess_nosave (utils/utils.py:50-77, rescale=True,
    lower_contrast off as in run.py:13).  Returns [256, 256, 3] float in [0,1].
    """
    import cv2

    alpha = rgba[..., 3]
    x, y, w, h = cv2.boundingRect((alpha > 0).astype(np.uint8))
    if w == 0 or h == 0:
        x, y, w, h = 0, 0, rgba.shape[1], rgba.shape[0]
    side = int(max(w, h) / ratio)
    padded = np.zeros((side, side, 4), dtype=np.uint8)
    cy, cx = side // 2, side // 2
    padded[cy - h // 2 : cy - h // 2 + h, cx - w // 2 : cx - w // 2 + w] = rgba[
        y : y + h, x : x + w
    ]
    out = np.asarray(
        Image.fromarray(padded).resize((out_size, out_size), Image.LANCZOS),
        dtype=np.float32,
    ) / 255.0
    rgb = out[..., :3] * out[..., 3:] + (1.0 - out[..., 3:])
    return rgb


def composite_white(rgba: np.ndarray) -> np.ndarray:
    """[H,W,4] float [0,1] -> [H,W,3] alpha-blended onto white
    (One2345_eval_new_data.py:199-200)."""
    return rgba[..., :3] * rgba[..., 3:] + (1.0 - rgba[..., 3:])


def image_grid(images: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Tile [N, H, W, 3] images into a [rows*H, cols*W, 3] grid
    (utils/utils.py:21-29 image_grid)."""
    n, h, w, c = images.shape
    assert n == rows * cols
    return (
        images.reshape(rows, cols, h, w, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rows * h, cols * w, c)
    )


def camera_cone_points(
    c2w: np.ndarray, fov_deg: float = 50.0, scale: float = 0.3
) -> np.ndarray:
    """[16, 3] polyline tracing a camera frustum cone for visualization
    (demo/app.py calc_cam_cone_pts_3d:48 semantics: apex + 4 corners +
    connecting edges, expressed in world space)."""
    half = np.tan(np.radians(fov_deg) / 2.0) * scale
    corners = np.array(
        [
            [-half, -half, scale], [half, -half, scale],
            [half, half, scale], [-half, half, scale],
        ]
    )
    apex = np.zeros(3)
    order = [apex, corners[0], corners[1], apex, corners[1], corners[2], apex,
             corners[2], corners[3], apex, corners[3], corners[0],
             corners[0], corners[1], corners[2], corners[3]]
    pts = np.stack(order)
    return pts @ c2w[:3, :3].T + c2w[:3, 3]
