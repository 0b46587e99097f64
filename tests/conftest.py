"""Test configuration: run on a virtual 8-device CPU mesh.

The XLA flag must be set before the backend initializes; the platform
override goes through jax.config (the JAX_PLATFORMS env var is pinned to
the TPU plugin in this environment and must be overridden explicitly).
"""

import os
import tempfile

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# Persistent compilation cache shared by the whole run INCLUDING kernel
# subprocesses (tutorial notebooks, multihost workers): repeat runs skip
# recompilation of the big jitted programs.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(tempfile.gettempdir(), "gapflow-jax-cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
