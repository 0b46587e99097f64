"""Test configuration: run on a virtual 8-device CPU mesh.

The XLA flag must be set before the backend initializes; the platform
override goes through jax.config (the JAX_PLATFORMS env var is pinned to
the TPU plugin in this environment and must be overridden explicitly).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
