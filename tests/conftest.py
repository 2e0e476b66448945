"""Test configuration: run JAX on a virtual 8-device CPU mesh so the full
multi-chip sharding paths compile and execute without TPU hardware.

NOTE: in this environment the JAX_PLATFORMS env var is overridden by the TPU
(axon) harness; JAX_PLATFORM_NAME and jax.config both work — use both, before
any jax import.
"""

import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# persistent compilation cache: repeated suite runs skip XLA recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_dgdm")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
