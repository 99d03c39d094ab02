"""Cost-volume regularization U-Net — dense masked replacement of torchsparse.

The reference regularizes the sparse cost volume with a torchsparse CUDA
sparse-conv U-Net (tsparse/modules.py:259-304, SparseCostRegNet).  On TPU the
active set (frustum-culled 96^3 lattice) is dense enough (~50%+) that a dense
conv3d with occupancy masking is both simpler and faster — conv3d maps
straight onto the MXU, while hash-based gather/scatter would be
bandwidth-bound.  The masking reproduces sparse-conv semantics exactly:

- submanifold conv (ks=3, s=1): inactive neighbours contribute zero
  (features are pre-masked) and inactive outputs are re-masked;
- strided conv (ks=3, s=2): the coarse site is active iff any fine site in
  its 2^3 block is active (torchsparse's spdownsample), i.e. maxpool(mask);
- transposed conv (ks=3, s=2): output sites are the cached fine-level
  active set — mask with the fine mask;
- BatchNorm statistics run over active voxels only (MaskedBatchNorm).

Layout: volumes are [X, Y, Z, C] (channels-last), masks [X, Y, Z, 1].
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from one2345_tpu.nn.layers import MaskedBatchNorm


def _mask_down(mask: jnp.ndarray) -> jnp.ndarray:
    """Maxpool k2 s2 over [X,Y,Z,1] occupancy."""
    X, Y, Z, _ = mask.shape
    m = mask.reshape(X // 2, 2, Y // 2, 2, Z // 2, 2, 1)
    return m.max(axis=(1, 3, 5))


def _upsample2x_zero(x: jnp.ndarray) -> jnp.ndarray:
    """Insert zeros: out[2i] = x[i] along each spatial axis -> [2X,2Y,2Z,C]."""
    X, Y, Z, C = x.shape
    out = jnp.zeros((X, 2, Y, 2, Z, 2, C), x.dtype)
    out = out.at[:, 0, :, 0, :, 0, :].set(x)
    return out.reshape(2 * X, 2 * Y, 2 * Z, C)


class _MConvBnRelu(nn.Module):
    """Masked conv3d (ks=3) + masked BN + ReLU; optional stride 2."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask_in, mask_out, train: bool = False):
        x = x * mask_in.astype(x.dtype)
        x = nn.Conv(
            self.features,
            (3, 3, 3),
            strides=(self.stride,) * 3,
            padding=((1, 1),) * 3,
            use_bias=False,
            dtype=self.dtype,
        )(x[None])[0]
        x = MaskedBatchNorm(dtype=self.dtype)(x, mask_out, train)
        return nn.relu(x)


class _MDeconvBnRelu(nn.Module):
    """Masked transposed conv3d (ks=3, s=2) + masked BN + ReLU.

    Implemented as zero-upsampling followed by a ks=3 conv (equivalent to
    torch ConvTranspose3d(k=3, s=2, p=1, output_padding=1) up to a kernel
    flip, which only matters for weight conversion).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask_in, mask_out, train: bool = False):
        x = x * mask_in.astype(x.dtype)
        x = _upsample2x_zero(x)
        x = nn.Conv(
            self.features,
            (3, 3, 3),
            padding=((1, 1),) * 3,
            use_bias=False,
            dtype=self.dtype,
        )(x[None])[0]
        x = MaskedBatchNorm(dtype=self.dtype)(x, mask_out, train)
        return nn.relu(x)


class CostRegNet(nn.Module):
    """Dense-masked port of SparseCostRegNet (d_in=32 -> d_out=16).

    Encoder 16-16/32-32/64-64 with stride-2 downsamples, decoder with
    additive skips (tsparse/modules.py:259-304 channel plan).
    """

    d_out: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, volume, mask, train: bool = False):
        """volume: [X,Y,Z,C_in]; mask: [X,Y,Z,1] -> [X,Y,Z,d_out] (masked)."""
        dt = self.dtype
        m0 = mask
        m1 = _mask_down(m0)
        m2 = _mask_down(m1)
        m3 = _mask_down(m2)

        conv0 = _MConvBnRelu(self.d_out, dtype=dt)(volume, m0, m0, train)
        conv1 = _MConvBnRelu(16, 2, dtype=dt)(conv0, m0, m1, train)
        conv2 = _MConvBnRelu(16, dtype=dt)(conv1, m1, m1, train)
        conv3 = _MConvBnRelu(32, 2, dtype=dt)(conv2, m1, m2, train)
        conv4 = _MConvBnRelu(32, dtype=dt)(conv3, m2, m2, train)
        conv5 = _MConvBnRelu(64, 2, dtype=dt)(conv4, m2, m3, train)
        conv6 = _MConvBnRelu(64, dtype=dt)(conv5, m3, m3, train)

        x = conv4 + _MDeconvBnRelu(32, dtype=dt)(conv6, m3, m2, train)
        x = conv2 + _MDeconvBnRelu(16, dtype=dt)(x, m2, m1, train)
        x = conv0 + _MDeconvBnRelu(self.d_out, dtype=dt)(x, m1, m0, train)
        return x * m0.astype(x.dtype)
