"""LoFTR match visualization — the elevation stage's debugging tool.

Parity target: elevation_estimate/utils/plotting.py:154
(make_matching_figure): the two grayscale images side by side, matched
keypoints drawn as dots and connected by confidence-colored lines.
"""

from __future__ import annotations

import numpy as np


def make_matching_figure(
    img0: np.ndarray,
    img1: np.ndarray,
    kpts0: np.ndarray,
    kpts1: np.ndarray,
    conf: np.ndarray | None = None,
    valid: np.ndarray | None = None,
    dpi: int = 75,
    path: str | None = None,
    text: list[str] | None = None,
):
    """Draw matched keypoints between two images.

    :param img0/img1: [H, W] grayscale in [0,1] or [H, W, 3]
    :param kpts0/kpts1: [K, 2] (x, y) pixel coordinates
    :param conf: [K] match confidence -> jet colormap of the lines
    :param valid: [K] bool mask (the fixed-top-K matcher pads; pass
        MatchResult.valid to drop padding rows)
    :param path: save the figure there (and close it) when given
    :return: the matplotlib figure (None if saved to path)
    """
    import matplotlib

    if path is not None:
        matplotlib.use("Agg")
    import matplotlib.cm as cm
    import matplotlib.pyplot as plt

    kpts0 = np.asarray(kpts0, np.float32)
    kpts1 = np.asarray(kpts1, np.float32)
    if valid is not None:
        valid = np.asarray(valid, bool)
        kpts0, kpts1 = kpts0[valid], kpts1[valid]
        conf = None if conf is None else np.asarray(conf)[valid]
    color = (
        cm.jet(np.clip(np.asarray(conf, np.float32), 0, 1))
        if conf is not None and len(conf)
        else np.tile([[0.0, 1.0, 0.0, 1.0]], (len(kpts0), 1))
    )

    fig, axes = plt.subplots(1, 2, figsize=(10, 6), dpi=dpi)
    for ax, im in zip(axes, (img0, img1)):
        ax.imshow(im, cmap="gray" if np.ndim(im) == 2 else None)
        ax.get_yaxis().set_ticks([])
        ax.get_xaxis().set_ticks([])
        for spine in ax.spines.values():
            spine.set_visible(False)
    plt.tight_layout(pad=1)

    if len(kpts0) > 0:
        fig.canvas.draw()
        tf = fig.transFigure.inverted()
        fk0 = tf.transform(axes[0].transData.transform(kpts0))
        fk1 = tf.transform(axes[1].transData.transform(kpts1))
        from matplotlib.lines import Line2D

        fig.lines = [
            Line2D((fk0[i, 0], fk1[i, 0]), (fk0[i, 1], fk1[i, 1]),
                   transform=fig.transFigure, c=color[i], linewidth=1)
            for i in range(len(kpts0))
        ]
        axes[0].scatter(kpts0[:, 0], kpts0[:, 1], c=color, s=4)
        axes[1].scatter(kpts1[:, 0], kpts1[:, 1], c=color, s=4)

    if text:
        axes[0].text(
            0.01, 0.99, "\n".join(text), transform=axes[0].transAxes,
            fontsize=15, va="top", ha="left", color="k",
        )

    if path is not None:
        fig.savefig(path, bbox_inches="tight", pad_inches=0)
        plt.close(fig)
        return None
    return fig


def save_match_figures(
    images: np.ndarray, matches: dict, out_dir: str, prefix: str = "match"
):
    """One figure per matched pair.

    :param images: [N, H, W(, 3)] the nearby views fed to the matcher
    :param matches: {(i, j): MatchResult} as produced by the elevation
        solver's pairwise matching
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for (i, j), m in matches.items():
        p = os.path.join(out_dir, f"{prefix}_{i}_{j}.png")
        conf = np.asarray(m.conf)
        n_ok = int(np.asarray(m.valid).sum())
        make_matching_figure(
            images[i], images[j], np.asarray(m.kpts0), np.asarray(m.kpts1),
            conf, np.asarray(m.valid), path=p,
            text=[f"pair ({i},{j})", f"{n_ok} matches"],
        )
        paths.append(p)
    return paths
