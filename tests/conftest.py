"""Test configuration: run everything on CPU with a virtual 8-device mesh.

Multi-chip sharding logic is tested the standard JAX way — N virtual CPU
devices via --xla_force_host_platform_device_count (SURVEY.md §4). The session
environment may pre-register a TPU platform plugin and set JAX_PLATFORMS, so
we override through jax.config (which wins over the env) before any backend
initializes.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
