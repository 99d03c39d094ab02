"""Elevation estimation by pose-hypothesis search over LoFTR matches.

Parity target: elevation_estimate/utils/elev_est_api.py — 6 pairwise LoFTR
matchings of the 4 nearby views of stage-1 view 0, then for each candidate
elevation build the 5-pose hypothesis (elev, elev±10 @ az 30, elev @ az
20/40), triangulate pair (0,1), transfer matches to views 2/3 by
nearest-neighbour in view-0 pixel space, and score confidence-weighted
reprojection error; coarse 10-degree sweep over [30,150) then fine 1-degree
sweep (get_elev_est:172-193, find_optim_elev:148-169, ba_error_general:
121-145).

TPU re-design: the reference loops over elevations in Python and calls
cv2.triangulatePoints per pair; here the DLT triangulation is a batched
4x4 SVD and the whole error-vs-elevation sweep is one `vmap`-over-elevation
jit.  Matches are fixed-K slates with validity masks (see loftr.py).

Known divergence (deliberate): the reference's background filter indexes
`mask0[y0, x1]` mixing coordinates of both images (elev_est_api.py:89) —
an apparent bug; we index `mask0[y0, x0]`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PAIRS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def pose_hypothesis(elev_deg: jnp.ndarray) -> jnp.ndarray:
    """[4, 4, 4] opencv-convention c2w poses for the 4 nearby views at a
    candidate elevation (gen_pose_hypothesis, elev_est_api.py:110-118):
    views are (elev-10, elev+10 @ az 30) and (elev @ az 20, 40)."""
    polar = jnp.radians(
        jnp.stack([elev_deg - 10.0, elev_deg + 10.0, elev_deg, elev_deg])
    )
    azim = jnp.radians(jnp.array([30.0, 30.0, 20.0, 40.0]))

    # jax version of spherical look-at (cameras.spherical_look_at_poses is numpy)
    centers = 1.2 * jnp.stack(
        [jnp.sin(azim) * jnp.sin(polar), -jnp.cos(azim) * jnp.sin(polar), jnp.cos(polar)],
        axis=-1,
    )
    fwd = centers / (jnp.linalg.norm(centers, axis=-1, keepdims=True) + 1e-10)
    up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), fwd.shape)
    right = jnp.cross(up, fwd)
    right = right / (jnp.linalg.norm(right, axis=-1, keepdims=True) + 1e-10)
    up2 = jnp.cross(fwd, right)
    up2 = up2 / (jnp.linalg.norm(up2, axis=-1, keepdims=True) + 1e-10)
    R = jnp.stack([right, up2, fwd], axis=-1)  # columns
    # blender -> opencv: negate up/backward columns (elev_est_api.py:116-117)
    R = R * jnp.array([1.0, -1.0, -1.0])[None, None, :]
    poses = jnp.tile(jnp.eye(4)[None], (4, 1, 1))
    poses = poses.at[:, :3, :3].set(R)
    poses = poses.at[:, :3, 3].set(centers)
    return poses


def triangulate_dlt(P0, P1, pts0, pts1):
    """Batched two-view DLT triangulation (cv2.triangulatePoints parity).

    :param P0, P1: [3, 4] projection matrices; :param pts0, pts1: [K, 2]
    :return: [K, 3] world points
    """
    A = jnp.stack(
        [
            pts0[:, 0, None] * P0[2][None] - P0[0][None],
            pts0[:, 1, None] * P0[2][None] - P0[1][None],
            pts1[:, 0, None] * P1[2][None] - P1[0][None],
            pts1[:, 1, None] * P1[2][None] - P1[1][None],
        ],
        axis=1,
    )  # [K, 4, 4]
    _, _, vh = jnp.linalg.svd(A)
    X = vh[:, -1, :]  # [K, 4]
    return X[:, :3] / (X[:, 3:4] + jnp.where(jnp.abs(X[:, 3:4]) < 1e-12, 1e-12, 0.0))


def _chain_error(K_mat, k0_01, k1_01, conf01, valid01, others, poses):
    """Reprojection error for one rotation of the 4-view chain
    (ba_error_general).  ``others`` = [(k0, k1, conf, valid)] for pairs
    (0,2) and (0,3) of the rotated chain; ``poses`` = [4,4,4]."""
    P0 = K_mat @ jnp.linalg.inv(poses[0])[:3, :4]
    P1 = K_mat @ jnp.linalg.inv(poses[1])[:3, :4]
    Xref = triangulate_dlt(P0, P1, k0_01, k1_01)  # [K, 3]

    err_total = 0.0
    for (k0_x, k1_x, conf_x, valid_x), pose_x in zip(others, [poses[2], poses[3]]):
        # nearest view-0 keypoint transfer (<1 px)
        d = jnp.linalg.norm(k0_01[:, None, :] - k0_x[None, :, :], axis=-1)
        d = jnp.where(valid_x[None, :], d, 1e9)
        idx = jnp.argmin(d, axis=1)  # [K]
        dmin = jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0]
        keep = (dmin < 1.0) & valid01

        w2c = jnp.linalg.inv(pose_x)
        Xc = Xref @ w2c[:3, :3].T + w2c[:3, 3][None]
        xh = Xc @ K_mat.T
        x_img = xh[:, :2] / jnp.maximum(jnp.abs(xh[:, 2:3]), 1e-9) * jnp.sign(
            xh[:, 2:3]
        )
        tgt = k1_x[idx]
        conf = conf_x[idx] * keep.astype(jnp.float32)
        e = jnp.linalg.norm(tgt - x_img, axis=-1)
        err_total = err_total + jnp.sum(e * conf) / (jnp.sum(conf) + 1e-8)
    return err_total


def elevation_error(elev_deg, K_mat, match_pack):
    """Total chain error at one candidate elevation (find_optim_elev inner
    loop: 3 rotations of the 4-view chain)."""
    poses_all = pose_hypothesis(elev_deg)  # [4,4,4]

    def pack(i, j):
        if (i, j) in match_pack:
            return match_pack[(i, j)]
        k0, k1, c, v = match_pack[(j, i)]
        return (k1, k0, c, v)

    err = 0.0
    for start in range(3):
        ids = [(start + i) % 4 for i in range(4)]
        poses = poses_all[jnp.array(ids)]
        p01 = pack(ids[0], ids[1])
        others = [pack(ids[0], ids[2]), pack(ids[0], ids[3])]
        err = err + _chain_error(
            K_mat, p01[0], p01[1], p01[2], p01[3], others, poses
        )
    return err


@functools.partial(jax.jit, static_argnums=(3,))
def _sweep(elevs, K_mat, packed, n_pairs):
    match_pack = {
        PAIRS[i]: tuple(x[i] for x in packed) for i in range(n_pairs)
    }
    return jax.vmap(lambda e: elevation_error(e, K_mat, match_pack))(elevs)


@functools.partial(jax.jit, static_argnums=(2,))
def _sweep_two_stage(K_mat, packed, n_pairs):
    """Coarse 10-degree sweep over [30,150) + fine 1-degree sweep around
    its argmin (get_elev_est:172-193) fused into ONE device program —
    both grids are static shapes, so the coarse->fine handoff needs no
    host round-trip and only the final scalar is fetched."""
    match_pack = {
        PAIRS[i]: tuple(x[i] for x in packed) for i in range(n_pairs)
    }
    err_fn = jax.vmap(lambda e: elevation_error(e, K_mat, match_pack))
    coarse = jnp.arange(30.0, 150.0, 10.0)
    e1 = coarse[jnp.argmin(err_fn(coarse))]
    fine = e1 - 10.0 + jnp.arange(0.0, 20.0, 1.0)
    return fine[jnp.argmin(err_fn(fine))]


class ElevationEstimator:
    """4 nearby views -> elevation in degrees (elev_est_api semantics)."""

    def __init__(self, matcher=None, focal: float = 280.0, image_size: int = 256):
        from one2345_tpu.elevation.loftr import LoFTRMatcher

        self.matcher = matcher or LoFTRMatcher()
        self.K = np.array(
            [[focal, 0, image_size / 2.0], [0, focal, image_size / 2.0], [0, 0, 1]],
            np.float32,
        )
        self.image_size = image_size

    @functools.partial(jax.jit, static_argnums=0)
    def _match_views_jit(self, params, images, masks):
        """Device-resident matching: grayscale + 480^2 resize + 6-pair LoFTR
        + foreground filtering all in one program.  The pipeline hands the
        stage-2 views over as device arrays, so only the fixed-K keypoint
        slates (~0.1 MB) ever cross the ~20 MB/s device<->host tunnel —
        the previous host path moved ~14 MB (view fetch + 12 gray uploads).

        :param masks: [4, H, W] float/bool foreground (precomputed; the
            alpha>245 fallback is applied by the caller)
        """
        H, W = images.shape[1:3]
        # cv2.COLOR_RGB2GRAY weights (get_feature_matching grayscale)
        wvec = jnp.asarray([0.299, 0.587, 0.114], images.dtype)
        gray = jnp.tensordot(images, wvec, axes=[[-1], [0]])  # [4, H, W]
        gray480 = jax.image.resize(gray, (4, 480, 480), method="linear")

        i0 = jnp.asarray([i for i, _ in PAIRS])
        i1 = jnp.asarray([j for _, j in PAIRS])
        res = self.matcher.match_pairs(
            params, jnp.take(gray480, i0, axis=0), jnp.take(gray480, i1, axis=0)
        )
        scale = jnp.asarray([W / 480.0, H / 480.0], jnp.float32)
        k0s = res.kpts0 * scale[None, None]
        k1s = res.kpts1 * scale[None, None]

        def fg_at(mask, kpts):  # row-gather lookup of the fg mask at kpts
            xi = jnp.clip(kpts.astype(jnp.int32), 0, jnp.asarray([W - 1, H - 1]))
            lin = xi[:, 1] * W + xi[:, 0]
            return jnp.take(mask.reshape(-1) > 0, lin, axis=0)

        keep = jax.vmap(fg_at)(jnp.take(masks, i0, axis=0), k0s) & jax.vmap(
            fg_at
        )(jnp.take(masks, i1, axis=0), k1s)
        valid = res.valid & keep
        return k0s, k1s, res.conf * valid, valid

    @staticmethod
    def _foreground(imgs, masks):
        """Foreground mask for match filtering: caller-supplied masks, or
        the near-white background threshold (elev_est_api mask handling)."""
        if masks is None:
            return ~jnp.all(imgs > 245.0 / 255.0, axis=-1)
        return jnp.asarray(masks) > 0

    def match_views(self, images, masks=None):
        """6 pairwise matchings at 480x480 grayscale, rescaled to the
        original frame + foreground filtering (get_feature_matching).

        Accepts numpy or device arrays; all preprocessing runs on device."""
        assert images.shape[0] == 4
        imgs = jnp.asarray(images, jnp.float32)
        fg = self._foreground(imgs, masks)
        k0s, k1s, confs, valids = jax.device_get(
            self._match_views_jit(self.matcher.params, imgs, fg)
        )
        return [
            (k0s[p], k1s[p], confs[p], valids[p]) for p in range(len(PAIRS))
        ]

    def save_match_visualizations(
        self, images: np.ndarray, out_dir: str,
        masks: np.ndarray | None = None,
    ) -> list[str]:
        """Dump one matching figure per pair — the reference's elevation
        debugging tool (elevation_estimate/utils/plotting.py:154)."""
        from one2345_tpu.elevation.loftr import MatchResult
        from one2345_tpu.elevation.plotting import save_match_figures

        packed = self.match_views(images, masks)
        matches = {
            pair: MatchResult(k0, k1, conf, valid)
            for pair, (k0, k1, conf, valid) in zip(PAIRS, packed)
        }
        return save_match_figures(images, matches, out_dir)

    def estimate(self, images: np.ndarray, masks: np.ndarray | None = None):
        """:param images: [4, H, W, 3] float [0,1] (nearby views of view 0)
        :return: elevation in degrees, or None when no pair matched.

        The match slates stay on device and feed the fused coarse+fine
        sweep directly; only the 6 per-pair validity counts and the final
        elevation scalar cross the (slow) device<->host link."""
        imgs = jnp.asarray(images, jnp.float32)
        fg = self._foreground(imgs, masks)
        arrs = self._match_views_jit(self.matcher.params, imgs, fg)
        n_valid = np.asarray(jnp.sum(arrs[3], axis=1))  # [6] tiny fetch
        if (n_valid == 0).any():
            return None
        return float(_sweep_two_stage(jnp.asarray(self.K), arrs, len(PAIRS)))
