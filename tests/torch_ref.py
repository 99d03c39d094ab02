"""Helpers for numeric parity tests against the mounted torch reference.

Imports reference modules from /root/reference with lightweight stubs for
the CUDA-only pip dependencies that are absent in this environment:

- ``inplace_abn.InPlaceABN`` -> BatchNorm + LeakyReLU(0.01).  The official
  mapillary implementation uses ``|gamma| + eps`` as the effective scale
  (invertibility of the in-place op requires gamma != 0); the stub and
  `convert_weights._convbn` encode the same rule so converted checkpoints
  keep parity.
- ``kornia`` -> only `dsnt.spatial_expectation2d` and `create_meshgrid`
  (LoFTR fine matching, elevation_estimate/loftr/utils/fine_matching.py:5-6).
- ``torchsparse`` -> inert placeholders, enough to import
  reconstruction/models/sparse_sdf_network.py for its pure-torch classes
  (LatentSDFLayer).  The sparse-conv *semantics* are vendored separately in
  `dense_sparseconv3d` below (torchsparse v1.4 get_kernel_offsets: odd
  kernels enumerate ``[[x,y,z] for z in r for y in r for x in r]``).

All stubs are installed into sys.modules before reference imports.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REF = "/root/reference"


def _install_kornia_stub():
    if "kornia" in sys.modules:
        return
    import torch

    kornia = types.ModuleType("kornia")
    geometry = types.ModuleType("kornia.geometry")
    subpix = types.ModuleType("kornia.geometry.subpix")
    dsnt = types.ModuleType("kornia.geometry.subpix.dsnt")
    utils = types.ModuleType("kornia.utils")
    grid_mod = types.ModuleType("kornia.utils.grid")

    def create_meshgrid(height, width, normalized_coordinates=True, device=None, dtype=None):
        if normalized_coordinates:
            xs = torch.linspace(-1.0, 1.0, width, device=device, dtype=dtype)
            ys = torch.linspace(-1.0, 1.0, height, device=device, dtype=dtype)
        else:
            xs = torch.arange(width, device=device, dtype=dtype or torch.float32)
            ys = torch.arange(height, device=device, dtype=dtype or torch.float32)
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        return torch.stack([gx, gy], dim=-1)[None]  # [1, H, W, 2] (x, y)

    def spatial_expectation2d(heatmap, normalized_coordinates=True):
        B, C, H, W = heatmap.shape
        grid = create_meshgrid(H, W, normalized_coordinates, heatmap.device,
                               heatmap.dtype).reshape(1, 1, H * W, 2)
        p = heatmap.reshape(B, C, H * W, 1)
        return (p * grid).sum(dim=2)  # [B, C, 2]

    dsnt.spatial_expectation2d = spatial_expectation2d
    grid_mod.create_meshgrid = create_meshgrid
    utils.create_meshgrid = create_meshgrid
    subpix.dsnt = dsnt
    geometry.subpix = subpix
    kornia.geometry = geometry
    kornia.utils = utils
    for name, mod in [
        ("kornia", kornia),
        ("kornia.geometry", geometry),
        ("kornia.geometry.subpix", subpix),
        ("kornia.geometry.subpix.dsnt", dsnt),
        ("kornia.utils", utils),
        ("kornia.utils.grid", grid_mod),
    ]:
        sys.modules[name] = mod


def _install_inplace_abn_stub():
    if "inplace_abn" in sys.modules:
        return
    import torch
    import torch.nn as tnn

    class InPlaceABN(tnn.Module):
        """BN (eval: running stats) + LeakyReLU(0.01), gamma := |gamma|+eps."""

        def __init__(self, num_features, eps=1e-5, momentum=0.1,
                     activation="leaky_relu", activation_param=0.01, **kw):
            super().__init__()
            self.eps = eps
            self.slope = activation_param
            self.weight = tnn.Parameter(torch.ones(num_features))
            self.bias = tnn.Parameter(torch.zeros(num_features))
            self.register_buffer("running_mean", torch.zeros(num_features))
            self.register_buffer("running_var", torch.ones(num_features))

        def forward(self, x):
            shape = (1, -1) + (1,) * (x.dim() - 2)
            gamma = self.weight.abs() + self.eps
            y = (x - self.running_mean.view(shape)) * torch.rsqrt(
                self.running_var.view(shape) + self.eps
            )
            y = y * gamma.view(shape) + self.bias.view(shape)
            return torch.nn.functional.leaky_relu(y, self.slope)

    mod = types.ModuleType("inplace_abn")
    mod.InPlaceABN = InPlaceABN
    sys.modules["inplace_abn"] = mod


def _install_torchsparse_stub():
    if "torchsparse" in sys.modules:
        return

    def mk(name):
        m = types.ModuleType(name)
        sys.modules[name] = m
        return m

    ts = mk("torchsparse")
    tensor = mk("torchsparse.tensor")
    nn_mod = mk("torchsparse.nn")
    nn_utils = mk("torchsparse.nn.utils")
    nn_func = mk("torchsparse.nn.functional")
    utils_mod = mk("torchsparse.utils")

    import torch.nn as tnn

    class _Inert(tnn.Module):
        """Constructible but not executable (import-time placeholder)."""

        def __init__(self, *a, **kw):
            super().__init__()

        def forward(self, *a, **kw):
            raise RuntimeError("torchsparse stub: not executable")

    for cls in ("SparseTensor", "PointTensor"):
        setattr(tensor, cls, type(cls, (), {}))
        setattr(ts, cls, getattr(tensor, cls))

    for cls in ("Conv3d", "BatchNorm", "ReLU", "LeakyReLU"):
        setattr(nn_mod, cls, type(cls, (_Inert,), {}))
    nn_utils.get_kernel_offsets = lambda *a, **kw: None
    nn_func.sphash = None
    nn_func.sphashquery = None
    nn_func.spvoxelize = None
    nn_func.spdevoxelize = None
    nn_func.calc_ti_weights = None
    ts.nn = nn_mod
    ts.tensor = tensor
    utils_mod.make_ntuple = lambda x, ndim=3: (x,) * ndim if np.isscalar(x) else x
    nn_mod.utils = nn_utils
    nn_mod.functional = nn_func


def _install_omegaconf_stub():
    """openaimodel.py:479 imports ListConfig only for an isinstance check."""
    if "omegaconf" in sys.modules:
        return
    omegaconf = types.ModuleType("omegaconf")
    listconfig = types.ModuleType("omegaconf.listconfig")

    class ListConfig(list):
        pass

    listconfig.ListConfig = ListConfig
    omegaconf.ListConfig = ListConfig
    omegaconf.listconfig = listconfig
    sys.modules["omegaconf"] = omegaconf
    sys.modules["omegaconf.listconfig"] = listconfig


def _install_yacs_stub():
    """loftr/utils/cvpr_ds_config.py only needs an attr-dict CfgNode."""
    if "yacs" in sys.modules:
        return
    yacs = types.ModuleType("yacs")
    config = types.ModuleType("yacs.config")

    class CfgNode(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    config.CfgNode = CfgNode
    yacs.config = config
    sys.modules["yacs"] = yacs
    sys.modules["yacs.config"] = config


def install_stubs():
    _install_kornia_stub()
    _install_inplace_abn_stub()
    _install_torchsparse_stub()
    _install_omegaconf_stub()
    _install_yacs_stub()


def add_ref_paths():
    for p in (REF, f"{REF}/elevation_estimate", f"{REF}/reconstruction"):
        if p not in sys.path:
            sys.path.insert(0, p)


def setup():
    install_stubs()
    add_ref_paths()


# --------------------------------------------------------------------------
# Vendored torchsparse v1.4 semantics (dense equivalents, numpy)
# --------------------------------------------------------------------------


def kernel_offsets_odd(k: int) -> np.ndarray:
    """torchsparse get_kernel_offsets for odd kernels: x varies fastest
    (``[[x, y, z] for z in r for y in r for x in r]``, MinkowskiEngine-
    compatible layout)."""
    r = np.arange(-(k // 2), k // 2 + 1)
    return np.array([[x, y, z] for z in r for y in r for x in r], np.int64)


def dense_sparseconv3d(vol, w, stride=1, transposed=False):
    """Dense all-active equivalent of torchsparse spnn.Conv3d.

    vol: [X, Y, Z, Cin] float; w: torchsparse kernel [K, Cin, Cout].
    stride 1: out[p] = sum_k vol[p + off_k] @ w[k]
    stride 2: out at even sites p: sum_k vol[p + off_k] @ w[k], then
              downsampled to the coarse lattice.
    transposed (from coarse to fine, stride 2): the kmap transpose of the
    downsample conv: out[p + off_k] += in[p] @ w[k] for coarse sites p.
    """
    X, Y, Z, Ci = vol.shape
    K, Ci2, Co = w.shape
    assert Ci == Ci2
    k = round(K ** (1 / 3))
    offs = kernel_offsets_odd(k)

    if not transposed:
        step = stride
        out = np.zeros((X // step, Y // step, Z // step, Co), np.float64)
        for kk in range(K):
            ox, oy, oz = offs[kk]
            for ix in range(0, X, step):
                for iy in range(0, Y, step):
                    for iz in range(0, Z, step):
                        jx, jy, jz = ix + ox, iy + oy, iz + oz
                        if 0 <= jx < X and 0 <= jy < Y and 0 <= jz < Z:
                            out[ix // step, iy // step, iz // step] += (
                                vol[jx, jy, jz] @ w[kk]
                            )
        return out
    assert stride == 2
    out = np.zeros((X * 2, Y * 2, Z * 2, Co), np.float64)
    for kk in range(K):
        ox, oy, oz = offs[kk]
        for ix in range(X):
            for iy in range(Y):
                for iz in range(Z):
                    qx, qy, qz = 2 * ix + ox, 2 * iy + oy, 2 * iz + oz
                    if 0 <= qx < 2 * X and 0 <= qy < 2 * Y and 0 <= qz < 2 * Z:
                        out[qx, qy, qz] += vol[ix, iy, iz] @ w[kk]
    return out
