"""Test harness setup: force CPU JAX with 8 virtual devices.

Multi-chip sharding logic is tested on a virtual 8-device CPU mesh (the
driver separately dry-run-compiles the multi-chip path); benchmarks run on
real TPU.  Must run before the first `import jax` anywhere in the test
session, hence module-level in conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")
