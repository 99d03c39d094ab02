"""Persistent XLA compilation cache.

TPU compiles of the larger pipeline graphs run minutes (and under the axon
tunnel every jit is a remote-compile HTTP round trip).  Enabling the
persistent cache makes warm process starts skip compilation entirely —
bench.py and the CLI both call `enable()` at startup.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/one2345_tpu_xla")


def enable(cache_dir: str | None = None) -> str | None:
    import jax

    # the axon remote-compile backend neither benefits from nor tolerates
    # the persistent cache (reads fail with "TPU backend setup/compile
    # error"); only enable it for local backends
    try:
        if jax.devices()[0].platform == "tpu" and "axon" in str(
            jax.devices()[0].client.platform_version
        ).lower():
            return None
    except Exception:
        pass
    path = cache_dir or os.environ.get("ONE2345_COMPILE_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return path
