"""Test env: CPU backend with 8 virtual devices so sharding tests run
anywhere (the JAX analogue of a fake multi-chip backend).

NOTE: under the axon TPU plugin, setting JAX_PLATFORMS/JAX_PLATFORM_NAME via
os.environ inside the process is NOT honored — only an exported env var or
`jax.config.update` forces the CPU backend.  conftest imports before any
test module touches jax, and backends initialize lazily, so the config
update below reliably wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
