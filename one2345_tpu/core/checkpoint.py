"""One checkpoint format for the whole framework (orbax).

The reference maintains three independent mechanisms: dict-of-state_dicts
.pth files for the reconstruction nets (exp_runner_generic_blender_val.py:
485-512), Lightning checkpoints for Zero123 (yaml lightning block), and an
ad-hoc HF download script (download_ckpt.py).  Here every stage's params are
a pytree saved/restored through a single orbax `PyTreeCheckpointer`.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


def save(path: str, tree: Any) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)


def restore(path: str, template: Any | None = None) -> Any:
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if template is None:
        return ckptr.restore(path)
    return ckptr.restore(path, args=ocp.args.PyTreeRestore(item=template))


def latest_step_dir(root: str, prefix: str = "step_") -> str | None:
    """Resolve the newest `step_XXXXXX` checkpoint dir under ``root``
    (parity with the reference's latest-by-sort resume,
    exp_runner_generic_blender_val.py:135-149)."""
    if not os.path.isdir(root):
        return None
    steps = sorted(
        d for d in os.listdir(root) if d.startswith(prefix) and d[len(prefix):].isdigit()
    )
    return os.path.join(root, steps[-1]) if steps else None
