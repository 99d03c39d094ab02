"""Device-mesh + sharding helpers.

The reference's only parallelism is single-process `torch.nn.DataParallel`
(reconstruction/exp_runner_generic_blender_val.py:151) with manual
CUDA_VISIBLE_DEVICES placement (run.py:61).  The TPU-native equivalent is a
`jax.sharding.Mesh` over ICI with named axes:

- ``data``  : scene/batch data parallelism (training) and the view x CFG
  batch of the diffusion sampler (inference),
- ``model`` : optional parameter sharding (FSDP-style) for the 860M-param
  UNet when training on small per-chip memory.

All collectives (psum of grads, all-gather of per-view features) are inserted
by XLA from sharding annotations — there is no hand-written NCCL analogue.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    axis_names: Sequence[str] = ("data",),
    axis_sizes: Sequence[int] | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a device mesh over the available chips.

    With the default single axis, all devices form a 1-D ``data`` ring over
    ICI.  ``axis_sizes`` lets callers carve e.g. (data=2, model=4).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = [n] + [1] * (len(axis_names) - 1)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(f"mesh {tuple(axis_sizes)} != {n} devices")
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Shard the leading axis of every leaf across ``axis`` of the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (e.g. params) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_spec(axis: str = "data") -> P:
    return P(axis)


def replicated_spec() -> P:
    return P()


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``n`` (for sharding-friendly pads)."""
    return ((n + m - 1) // m) * m
