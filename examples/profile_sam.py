"""Per-phase timing of the SAM preprocessing stage on the TPU.

Breaks SamStage.set_image + predict_box into upload / encode / decode /
host-resize phases at production shapes (1024^2 ViT-H, 512-thumb input)
so the next optimization is picked from measurement, not guesswork.
Run on a QUIET host (see CLAUDE.md on concurrent-load distortion):

    python examples/profile_sam.py
"""

# allow `python examples/<name>.py` from the repo root without installing
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np


def sync(x):
    """Drain the axon stream with a real fetch (see CLAUDE.md on
    block_until_ready lying right after compile).  Slice ON DEVICE before
    fetching — np.asarray(x) would pull the whole array through the
    ~20 MB/s tunnel and dominate every timing."""
    import jax.numpy as jnp

    np.asarray(jnp.ravel(x)[:1])
    return x


def main():
    import jax
    import jax.numpy as jnp

    from one2345_tpu.core.config import SamConfig
    from one2345_tpu.segmentation.sam import SamStage

    print("devices:", jax.devices(), flush=True)
    stage = SamStage(SamConfig(), seed=0)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (512, 512, 3), np.uint8)

    # --- raw upload cost at both payload sizes
    for name, arr in (
        ("H2D uint8 1024^2x3 (3 MB)", np.zeros((1024, 1024, 3), np.uint8)),
        ("H2D float32 1024^2x3 (12.6 MB)", np.zeros((1024, 1024, 3), np.float32)),
    ):
        jnp.asarray(arr).block_until_ready()  # first transfer path warm-up
        t = time.perf_counter()
        for _ in range(3):
            sync(jnp.asarray(arr))
        print(f"{name}: {(time.perf_counter() - t) / 3 * 1e3:.1f} ms", flush=True)

    # --- encoder alone (warm)
    size = stage.config.image_size
    u8 = jnp.asarray(np.zeros((size, size, 3), np.uint8))
    emb = stage._encode(stage.params, u8, jnp.int32(size), jnp.int32(size))
    sync(emb)
    t = time.perf_counter()
    for _ in range(3):
        sync(stage._encode(stage.params, u8, jnp.int32(size), jnp.int32(size)))
    print(f"encode (ViT-H 1024^2, warm): {(time.perf_counter() - t) / 3 * 1e3:.1f} ms",
          flush=True)

    # --- full set_image (resize + upload + encode), memo defeated per run
    stage.set_image(img)  # warm compile
    times = []
    for i in range(3):
        im2 = rng.integers(0, 255, (512, 512, 3), np.uint8)
        t = time.perf_counter()
        cache = stage.set_image(im2)
        sync(cache["embedding"])
        times.append(time.perf_counter() - t)
    print(f"set_image e2e: {min(times) * 1e3:.1f} ms", flush=True)

    # --- decode + host mask resize
    stage.predict_box(cache, (50, 50, 450, 450))  # warm
    t = time.perf_counter()
    for _ in range(3):
        stage.predict_box(cache, (50, 50, 450, 450))
    print(f"predict_box (decode + fetch + resize): {(time.perf_counter() - t) / 3 * 1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
