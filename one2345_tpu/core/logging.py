"""Metrics / artifact logging (observability subsystem).

The reference scatters logging across TensorBoard SummaryWriter (train
runner :270-327), loguru, icecream and raw prints.  Here: one JSONL metrics
stream (machine-readable, greppable, no heavyweight deps) + image/mesh
artifact dumps, with an optional TensorBoard mirror when tensorboardX is
importable.
"""

from __future__ import annotations

import json
import os
import time

class MetricsLogger:
    def __init__(self, log_dir: str, name: str = "metrics"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}.jsonl")
        self._fh = open(self.path, "a", buffering=1)
        self._tb = None
        try:  # optional mirror
            from tensorboardX import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(log_dir)
        except ImportError:
            pass

    def log(self, step: int, **scalars: float) -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        self._fh.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                try:
                    self._tb.add_scalar(k, float(v), step)
                except (TypeError, ValueError):
                    pass

    def log_image(self, step: int, name: str, image) -> str:
        """Save a [H, W, 3] float image artifact (val_step panel dumps)."""
        import numpy as np
        from PIL import Image

        img_dir = os.path.join(os.path.dirname(self.path), "images")
        os.makedirs(img_dir, exist_ok=True)
        path = os.path.join(img_dir, f"{name}_{step:08d}.png")
        arr = np.clip(np.asarray(image) * 255, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(path)
        return path

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()
