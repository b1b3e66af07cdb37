"""Root conftest: force CPU + a fake 8-device mesh for all tests.

Tests exercise sharding/collective code paths on a virtual 8-device CPU
backend (`--xla_force_host_platform_device_count=8`), the standard JAX trick
for testing multi-chip code without a pod (SURVEY.md §4.2).  Benchmarks run
on the real TPU chip separately (bench.py).

Note: this VM's sitecustomize registers the axon TPU plugin in every Python
process and forces JAX_PLATFORMS=axon, so env vars alone are not enough —
we must call jax.config.update *before* the backend initializes (backends
are lazy, so doing it at conftest import time is early enough as long as no
test module touches jax at import time before conftest runs — pytest
imports conftest first).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
