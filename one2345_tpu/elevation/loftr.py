"""LoFTR detector-free feature matcher (indoor_ds config), TPU fixed-shape.

Parity target: the vendored LoFTR at /root/reference/elevation_estimate/loftr/
(ResNet-FPN 8_2 backbone, sine position encoding, 4x(self,cross) linear-
attention coarse transformer, dual-softmax coarse matching with mutual-NN,
5x5-window fine refinement with expected-coordinate regression).

TPU re-design: the reference emits a *variable* number of matches via boolean
indexing (coarse_matching.get_coarse_match); here matching returns a fixed
``max_matches`` top-K slate with a validity mask, so the whole matcher is one
jit with static shapes.  Both images of a pair run through the backbone as a
single batch.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class MatchResult(NamedTuple):
    kpts0: jnp.ndarray  # [K, 2] pixel coords in image0 (480x480 frame)
    kpts1: jnp.ndarray  # [K, 2]
    conf: jnp.ndarray  # [K]
    valid: jnp.ndarray  # [K] bool


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.planes, (3, 3), (self.stride,) * 2, padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(y)
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), (self.stride,) * 2, use_bias=False, dtype=self.dtype, name="down_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="down_bn")(x)
        return nn.relu(x + y)


class ResNetFPN_8_2(nn.Module):
    """1/8 coarse (256ch) + 1/2 fine (128ch) features
    (loftr/backbone/resnet_fpn.py:44-120)."""

    initial_dim: int = 128
    block_dims: Sequence[int] = (128, 196, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from one2345_tpu.nn.layers import resize_bilinear_align_corners

        dt = self.dtype
        h = nn.Conv(self.initial_dim, (7, 7), (2, 2), padding=3, use_bias=False, dtype=dt, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, dtype=dt, name="bn1")(h)
        x0 = nn.relu(h)
        x1 = BasicBlock(self.block_dims[0], 1, dt, name="layer1_0")(x0, train)
        x1 = BasicBlock(self.block_dims[0], 1, dt, name="layer1_1")(x1, train)
        x2 = BasicBlock(self.block_dims[1], 2, dt, name="layer2_0")(x1, train)
        x2 = BasicBlock(self.block_dims[1], 1, dt, name="layer2_1")(x2, train)
        x3 = BasicBlock(self.block_dims[2], 2, dt, name="layer3_0")(x2, train)
        x3 = BasicBlock(self.block_dims[2], 1, dt, name="layer3_1")(x3, train)

        x3_out = nn.Conv(self.block_dims[2], (1, 1), use_bias=False, dtype=dt, name="layer3_outconv")(x3)
        up3 = jax.vmap(lambda im: resize_bilinear_align_corners(im, x2.shape[1:3]))(x3_out)
        x2_out = nn.Conv(self.block_dims[2], (1, 1), use_bias=False, dtype=dt, name="layer2_outconv")(x2) + up3
        x2_out = nn.Conv(self.block_dims[2], (3, 3), padding=1, use_bias=False, dtype=dt, name="layer2_outconv2_0")(x2_out)
        x2_out = nn.BatchNorm(use_running_average=not train, dtype=dt, name="layer2_outconv2_bn")(x2_out)
        x2_out = jax.nn.leaky_relu(x2_out, 0.01)
        x2_out = nn.Conv(self.block_dims[1], (3, 3), padding=1, use_bias=False, dtype=dt, name="layer2_outconv2_1")(x2_out)

        up2 = jax.vmap(lambda im: resize_bilinear_align_corners(im, x1.shape[1:3]))(x2_out)
        x1_out = nn.Conv(self.block_dims[1], (1, 1), use_bias=False, dtype=dt, name="layer1_outconv")(x1) + up2
        x1_out = nn.Conv(self.block_dims[1], (3, 3), padding=1, use_bias=False, dtype=dt, name="layer1_outconv2_0")(x1_out)
        x1_out = nn.BatchNorm(use_running_average=not train, dtype=dt, name="layer1_outconv2_bn")(x1_out)
        x1_out = jax.nn.leaky_relu(x1_out, 0.01)
        x1_out = nn.Conv(self.block_dims[0], (3, 3), padding=1, use_bias=False, dtype=dt, name="layer1_outconv2_1")(x1_out)

        return x3_out, x1_out  # coarse 1/8 (256), fine 1/2 (128)


def sine_position_encoding(h: int, w: int, d_model: int) -> np.ndarray:
    """2D sine encoding [h, w, d_model] (utils/position_encoding.py with
    temp_bug_fix=True, positions starting at 1)."""
    pe = np.zeros((d_model, h, w), np.float32)
    y_pos = np.cumsum(np.ones((h, w)), axis=0)
    x_pos = np.cumsum(np.ones((h, w)), axis=1)
    div = np.exp(np.arange(0, d_model // 2, 2) * (-np.log(10000.0) / (d_model // 2)))
    div = div[:, None, None]
    pe[0::4] = np.sin(x_pos[None] * div)
    pe[1::4] = np.cos(x_pos[None] * div)
    pe[2::4] = np.sin(y_pos[None] * div)
    pe[3::4] = np.cos(y_pos[None] * div)
    return np.moveaxis(pe, 0, -1)


def linear_attention(q, k, v, eps=1e-6):
    """elu+1 feature-map linear attention (loftr_module/linear_attention.py:
    14-48) — O(N d^2), ideal for the 3600-token coarse stage."""
    Q = jax.nn.elu(q) + 1.0
    K = jax.nn.elu(k) + 1.0
    S = v.shape[1]
    v = v / S
    KV = jnp.einsum("nshd,nshv->nhdv", K, v)
    Z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, jnp.sum(K, axis=1)) + eps)
    return jnp.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * S


class LoFTREncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, source):
        dt = self.dtype
        B, L, C = x.shape
        dh = self.d_model // self.nhead
        q = nn.Dense(self.d_model, use_bias=False, dtype=dt, name="q_proj")(x)
        k = nn.Dense(self.d_model, use_bias=False, dtype=dt, name="k_proj")(source)
        v = nn.Dense(self.d_model, use_bias=False, dtype=dt, name="v_proj")(source)
        q = q.reshape(B, L, self.nhead, dh)
        k = k.reshape(B, -1, self.nhead, dh)
        v = v.reshape(B, -1, self.nhead, dh)
        msg = linear_attention(q, k, v).reshape(B, L, self.d_model)
        msg = nn.Dense(self.d_model, use_bias=False, dtype=dt, name="merge")(msg)
        msg = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(msg).astype(dt)
        h = jnp.concatenate([x, msg], axis=-1)
        h = nn.Dense(self.d_model * 2, use_bias=False, dtype=dt, name="mlp0")(h)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, use_bias=False, dtype=dt, name="mlp2")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(h).astype(dt)
        return x + h


class LocalFeatureTransformer(nn.Module):
    d_model: int
    nhead: int
    n_pairs: int  # number of (self, cross) pairs
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat0, feat1):
        for i in range(self.n_pairs):
            self_layer = LoFTREncoderLayer(self.d_model, self.nhead, self.dtype, name=f"self_{i}")
            cross_layer = LoFTREncoderLayer(self.d_model, self.nhead, self.dtype, name=f"cross_{i}")
            feat0 = self_layer(feat0, feat0)
            feat1 = self_layer(feat1, feat1)
            # SEQUENTIAL cross updates (transformer.py:95-97): feat1 attends
            # to the feat0 already updated THIS iteration, not the previous
            # one — the parallel form drifts ~0.04% per pair and compounds
            # (caught by tests/test_chain_parity.py::test_loftr_full_forward_parity)
            feat0 = cross_layer(feat0, feat1)
            feat1 = cross_layer(feat1, feat0)
        return feat0, feat1


class LoFTRModules(nn.Module):
    """All LoFTR submodules under one param tree.

    ``dtype`` is the conv/attention compute dtype (params stay f32).  The
    matching heads downstream (dual-softmax confidences, fine expected-
    coordinate heatmap) always run f32 in the matcher."""

    d_coarse: int = 256
    d_fine: int = 128
    nhead: int = 8
    window: int = 5
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNetFPN_8_2(dtype=self.dtype)
        self.coarse_transformer = LocalFeatureTransformer(self.d_coarse, self.nhead, 4, self.dtype, name="coarse_tf")
        self.fine_transformer = LocalFeatureTransformer(self.d_fine, self.nhead, 1, self.dtype, name="fine_tf")
        self.down_proj = nn.Dense(self.d_fine, dtype=self.dtype, name="down_proj")
        self.merge_feat = nn.Dense(self.d_fine, dtype=self.dtype, name="merge_feat")

    def __call__(self, images):
        """Init helper: traces EVERY submodule so the param tree is complete."""
        coarse, fine = self.backbone(images)
        hc = coarse.shape[1] * coarse.shape[2]
        c = coarse.reshape(images.shape[0], hc, self.d_coarse)
        c0, c1 = self.coarse_transformer(c, c)
        w2 = self.window * self.window
        win = jnp.zeros((1, w2, self.d_fine), fine.dtype) + fine[:1, 0, 0, :][:, None, :]
        win = self.fuse_fine(win, c0[:1, 0, :])
        f0, f1 = self.fine_transformer(win, win)
        return c0, f0

    def extract(self, images):
        return self.backbone(images)

    def coarse(self, f0, f1):
        return self.coarse_transformer(f0, f1)

    def fine(self, f0, f1):
        return self.fine_transformer(f0, f1)

    def fuse_fine(self, fine_win, coarse_feat):
        """Concat coarse context into fine windows (fine_preprocess.py:50-58)."""
        c = self.down_proj(coarse_feat)  # [M, d_fine]
        c = jnp.broadcast_to(c[:, None, :], fine_win.shape[:2] + (self.d_fine,))
        return self.merge_feat(jnp.concatenate([fine_win, c], axis=-1))


class LoFTRMatcher:
    """Jitted end-to-end matcher with fixed top-K output."""

    def __init__(self, params=None, image_size: int = 480, max_matches: int = 1024,
                 threshold: float = 0.2, border: int = 2, seed: int = 0,
                 dtype=jnp.float32):
        self.modules = LoFTRModules(dtype=dtype)
        self.image_size = image_size
        self.max_matches = max_matches
        self.threshold = threshold
        self.border = border
        if params is None:
            params = jax.jit(self.modules.init)(
                jax.random.key(seed), jnp.zeros((1, 64, 64, 1))
            )
        self.params = params

    @functools.partial(jax.jit, static_argnums=0)
    def match_pair(self, params, img0, img1) -> MatchResult:
        """img0/img1: [H, W] grayscale in [0, 1] -> fixed-K matches.

        Mirrors LoFTR.forward (loftr.py:29-76) with dual-softmax coarse
        matching (coarse_matching.py:109-180) and s2d fine matching
        (fine_matching.py:15-74).
        """
        H = W = self.image_size
        imgs = jnp.stack([img0, img1])[..., None]  # [2, H, W, 1]
        coarse, fine = self.modules.apply(params, imgs, method=LoFTRModules.extract)
        hc, wc = coarse.shape[1:3]
        hf, wf = fine.shape[1:3]
        d_c = coarse.shape[-1]

        pe = jnp.asarray(sine_position_encoding(hc, wc, d_c))
        c = (coarse + pe[None]).reshape(2, hc * wc, d_c)
        c0, c1 = self.modules.apply(params, c[:1], c[1:2], method=LoFTRModules.coarse)

        # ---- dual-softmax confidence (always f32: the mutual-NN max
        # comparisons and the 0.2 threshold need more than bf16's 8-bit
        # mantissa when the backbone runs half precision)
        n0 = c0[0].astype(jnp.float32) / d_c**0.5
        n1 = c1[0].astype(jnp.float32) / d_c**0.5
        sim = (n0 @ n1.T) / 0.1
        conf = jax.nn.softmax(sim, axis=0) * jax.nn.softmax(sim, axis=1)

        # threshold + mutual nearest + border removal
        L = hc * wc
        maxrow = conf == jnp.max(conf, axis=1, keepdims=True)
        maxcol = conf == jnp.max(conf, axis=0, keepdims=True)
        ok = (conf > self.threshold) & maxrow & maxcol
        ii = jnp.arange(L)
        iy, ix = ii // wc, ii % wc
        b = self.border
        inb = (iy >= b) & (iy < hc - b) & (ix >= b) & (ix < wc - b)
        ok = ok & inb[:, None] & inb[None, :]

        scores = jnp.where(ok, conf, 0.0)  # [L, L]
        K = self.max_matches
        # mutual-NN leaves at most ONE valid entry per row (it must be its
        # row's max), so reduce rows first and top_k over L=3600 row maxima
        # instead of sorting the 13M-entry dense matrix (measured 167 ms ->
        # sub-ms on a v5e; identical selection up to exact-tie rows)
        row_val = jnp.max(scores, axis=1)
        row_arg = jnp.argmax(scores, axis=1)
        topv, i_ids = jax.lax.top_k(row_val, K)
        j_ids = row_arg[i_ids]
        valid = topv > 0.0

        scale_c = H // hc  # 8
        k0 = jnp.stack([(i_ids % wc) * scale_c, (i_ids // wc) * scale_c], axis=-1)
        k1 = jnp.stack([(j_ids % wc) * scale_c, (j_ids // wc) * scale_c], axis=-1)

        # ---- fine refinement: 5x5 windows on the 1/2-res maps
        Wn = self.modules.window
        stride = hf // hc  # 4
        d_f = fine.shape[-1]
        pad = Wn // 2
        fpad = jnp.pad(fine, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

        def gather_window(fmap, ids):
            # row gathers on the flattened map (multi-axis indexing is
            # pathological for the TPU compiler — see geometry/sampling.py)
            Hp, Wp = fmap.shape[0], fmap.shape[1]
            flat = fmap.reshape(Hp * Wp, d_f)
            cy = (ids // wc) * stride
            cx = (ids % wc) * stride
            dy, dx = jnp.meshgrid(jnp.arange(Wn), jnp.arange(Wn), indexing="ij")
            lin = (cy[:, None, None] + dy[None]) * Wp + (cx[:, None, None] + dx[None])
            return jnp.take(flat, lin.reshape(-1), axis=0).reshape(-1, Wn * Wn, d_f)

        win0 = gather_window(fpad[0], i_ids)
        win1 = gather_window(fpad[1], j_ids)
        win0 = self.modules.apply(params, win0, c0[0][i_ids], method=LoFTRModules.fuse_fine)
        win1 = self.modules.apply(params, win1, c1[0][j_ids], method=LoFTRModules.fuse_fine)
        win0, win1 = self.modules.apply(params, win0, win1, method=LoFTRModules.fine)

        center = win0[:, (Wn * Wn) // 2, :].astype(jnp.float32)
        simf = jnp.einsum("mc,mrc->mr", center, win1.astype(jnp.float32)) / d_f**0.5
        heat = jax.nn.softmax(simf, axis=-1).reshape(-1, Wn, Wn)
        gy, gx = jnp.meshgrid(
            jnp.linspace(-1.0, 1.0, Wn), jnp.linspace(-1.0, 1.0, Wn), indexing="ij"
        )
        ex = jnp.sum(heat * gx[None], axis=(1, 2))
        ey = jnp.sum(heat * gy[None], axis=(1, 2))
        scale_f = H // hf  # 2
        k1f = k1 + jnp.stack([ex, ey], axis=-1) * (Wn // 2) * scale_f

        return MatchResult(
            kpts0=k0.astype(jnp.float32),
            kpts1=k1f.astype(jnp.float32),
            conf=topv,
            valid=valid,
        )

    @functools.partial(jax.jit, static_argnums=0)
    def match_pairs(self, params, imgs0, imgs1) -> MatchResult:
        """Batched matching: [P, H, W] x [P, H, W] -> MatchResult with a
        leading pair axis (all 6 elevation pairs in ONE device program)."""
        body = functools.partial(type(self).match_pair.__wrapped__, self, params)
        return jax.vmap(body)(imgs0, imgs1)
