"""Test configuration: force an 8-device virtual CPU mesh.

All sharding/collective code is exercised on a host-platform mesh so the
suite runs anywhere (SURVEY.md §4: CPU-mesh fake-backend tests).

Note: this environment pre-imports jax at interpreter startup (sitecustomize)
with the TPU platform selected, so env vars alone are not enough — we also
override via jax.config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from jax.sharding import Mesh
    import numpy as np

    devices = np.asarray(jax.devices()).reshape(4, 2)
    return Mesh(devices, axis_names=("data", "model"))
