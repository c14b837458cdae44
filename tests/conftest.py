"""Test env: force the CPU backend with 8 virtual devices so pjit/sharding paths
are exercised without a TPU slice (JAX's standard multi-device test trick).

Note: this machine's sitecustomize force-registers the 'axon' TPU PJRT plugin
and exports JAX_PLATFORMS=axon, so a plain setdefault is not enough — we
overwrite the env var AND pin jax_platforms via jax.config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(2024)
