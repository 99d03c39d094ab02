"""Shared Flax building blocks.

Notable departures from the reference, by design:

- `inplace_abn.InPlaceABN` (CUDA fused BN+LeakyReLU, memory-saving in-place
  trick; reconstruction/models/featurenet.py:11-37) becomes a plain
  Conv + BatchNorm + LeakyReLU(0.01) — XLA fuses the elementwise chain into
  the conv epilogue, so the memory trick buys nothing on TPU.
- torchsparse's `spnn.BatchNorm` normalizes over *active* voxels only; the
  dense-masked equivalent is `MaskedBatchNorm`, which computes statistics
  under an occupancy mask.
- `nn.utils.weight_norm` on the SDF MLP (sparse_sdf_network.py:100-101)
  becomes `WNDense` (explicit direction/magnitude parametrization).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

LEAKY_SLOPE = 0.01  # inplace_abn default activation slope


def leaky_relu(x):
    return jax.nn.leaky_relu(x, LEAKY_SLOPE)


class ConvBnAct(nn.Module):
    """Conv(2D/3D by kernel rank) + BatchNorm + LeakyReLU(0.01).

    Parity target: ConvBnReLU / ConvBnReLU3D (featurenet.py:13-37) whose
    `norm_act=InPlaceABN` is batch-norm followed by leaky-relu.
    """

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    act: Callable | None = leaky_relu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Explicit symmetric padding (k//2 per side), NOT "SAME": for
        # stride-2 convs on even-sized inputs XLA's SAME pads (1, 2) while
        # torch Conv2d(k, s=2, p=k//2) pads symmetrically — the reference's
        # strided FPN convs (featurenet.py:13-37) sample different taps.
        x = nn.Conv(
            self.features,
            tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=[(k // 2, k // 2) for k in self.kernel_size],
            use_bias=False,
            dtype=self.dtype,
        )(x)
        # momentum 0.9 = torch BatchNorm's default (momentum=0.1 blend-in),
        # not flax's 0.99
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        if self.act is not None:
            x = self.act(x)
        return x


class MaskedBatchNorm(nn.Module):
    """BatchNorm whose statistics are computed over masked (active) elements.

    ``x`` is [..., C], ``mask`` broadcastable [..., 1] with {0,1} entries.
    Matches the statistics torchsparse's BatchNorm sees: only active voxels
    participate (inactive ones don't exist in the sparse tensor).
    """

    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((C,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((C,)))
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        if train:
            m = mask.astype(jnp.float32)
            count = jnp.maximum(jnp.sum(m), 1.0)
            xf = x.astype(jnp.float32)
            mean = jnp.sum(xf * m, axis=tuple(range(x.ndim - 1))) / count
            var = (
                jnp.sum(m * (xf - mean) ** 2, axis=tuple(range(x.ndim - 1))) / count
            )
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype) + bias.astype(x.dtype)
        return y * mask.astype(y.dtype)


class WNDense(nn.Module):
    """Weight-normalized dense layer: W = g * V / ||V||_row.

    Row norm is over the input dim (matching torch weight_norm's default
    dim=0 on a [out, in] matrix).  `kernel_init` initializes the direction V
    (and its row norms initialize g), reproducing torch semantics where
    weight_norm wraps an already-initialized layer.
    """

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        v = self.param("v", self.kernel_init, (in_dim, self.features))
        # g initialized to ||v|| so the initial effective weight equals v
        g = self.param(
            "g", lambda key, shape: jnp.linalg.norm(v, axis=0), (self.features,)
        )
        b = self.param("bias", self.bias_init, (self.features,))
        w = v * (g / (jnp.linalg.norm(v, axis=0) + 1e-12))
        return x.astype(self.dtype) @ w.astype(self.dtype) + b.astype(self.dtype)


def positional_encoding(x: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """NeRF-style (x, sin 2^k x, cos 2^k x) embedding, input included.

    Matches models/embedder.py:63-97: out_dim = in * (2*n_freqs + 1), with
    frequency bands 2^0..2^(n-1) and per-frequency [sin, cos] ordering.
    """
    out = [x]
    for k in range(n_freqs):
        f = 2.0**k
        out.append(jnp.sin(f * x))
        out.append(jnp.cos(f * x))
    return jnp.concatenate(out, axis=-1)


def resize_bilinear_align_corners(img: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (F.interpolate parity).

    ``img`` is [H, W, C].  jax.image.resize uses half-pixel centers, which
    differs from the align_corners grids used throughout the reference
    (featurenet upsample-add, fused pyramid concat), so this explicit
    gather-based version is used instead.
    """
    H, W = img.shape[0], img.shape[1]
    oh, ow = out_hw
    ys = jnp.linspace(0.0, H - 1.0, oh)
    xs = jnp.linspace(0.0, W - 1.0, ow)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ty = (ys - y0)[:, None, None]
    tx = (xs - x0)[None, :, None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    a = img[y0][:, x0]
    b = img[y0][:, x1]
    c = img[y1][:, x0]
    d = img[y1][:, x1]
    top = a * (1 - tx) + b * tx
    bot = c * (1 - tx) + d * tx
    return top * (1 - ty) + bot * ty
