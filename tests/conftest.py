"""Test harness setup: force CPU JAX with 8 virtual devices.

Multi-chip sharding logic is tested on a virtual 8-device CPU mesh (the
driver separately dry-run-compiles the multi-chip path); benchmarks run on
real TPU.  The environment may pre-register a TPU plugin and pin
JAX_PLATFORMS via sitecustomize, so we override through jax.config after
import (before any backend is initialized).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
