"""Test config: hermetic CPU backend with a virtual 8-device mesh.

Mirrors the reference's approach of testing cross-arch behavior without the
target hardware (QEMU user-mode in its CI, .github/workflows/build-and-test.yml)
— here we emulate a multi-chip TPU topology with XLA host devices. Real-TPU
runs happen through bench.py, not the unit suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# jax may already be imported (sitecustomize pre-imports it with the TPU
# platform); the config update still wins as long as no backend is live.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
