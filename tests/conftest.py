"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic (parallel/, train/) is exercised on
xla_force_host_platform_device_count=8 per the standard JAX multi-host
testing recipe; real-TPU performance is measured separately by bench.py.

Note: this image preloads jax in every interpreter via sitecustomize (TPU
tunnel plugin), so plain env vars set here are too late — we must use
jax.config.update, which works as long as no backend has been initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Tests always run on the virtual CPU mesh, never through the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
# x64 enabled so golden parity tests can run both frameworks in float64
# (float32 LayerNorm chains amplify accumulation-order noise past any
# useful tolerance on random-init tiny models).
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng(request):
    """Per-test deterministic RandomState, seeded from the test id: the
    data a test sees no longer depends on which tests ran before it (a
    session-scoped stream made assertions order-dependent — same-file vs
    full-suite runs drew different data)."""
    import zlib

    return np.random.RandomState(zlib.crc32(request.node.nodeid.encode()) & 0x7FFFFFFF)


@pytest.fixture(scope="session", autouse=True)
def _check_cpu_mesh():
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
