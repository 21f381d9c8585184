"""Test configuration: run on CPU with 8 virtual devices for mesh tests.

The environment pre-registers a TPU backend (and sets JAX_PLATFORMS) from
sitecustomize, so env vars alone don't stick — use jax.config.update, which
wins as long as no backend has been initialized yet.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
