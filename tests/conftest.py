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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The suite jit-compiles ~350 programs; with all of them live, XLA-CPU
    deterministically segfaults inside backend_compile while building the
    (largest) donated remat train step near the end of the run.  Each
    module's functions are lru-cached within the module, so clearing at
    module boundaries costs only the rare cross-module recompile."""
    yield
    jax.clear_caches()


# ---------------------------------------------------------------------------
# Quick subset: `pytest -m quick` (<5 min) for iteration; the full suite
# (~18 min, compile-heavy jit/scan/pallas tests) stays the CI gate.
# Modules are listed rather than individual tests so new tests in a fast
# module inherit the marker automatically.
# ---------------------------------------------------------------------------

_QUICK_MODULES = {
    "test_conversation", "test_kvconfig", "test_mm_utils",
    "test_image_processing", "test_eval", "test_eval_scorers",
    "test_gpt_review", "test_lmms_eval", "test_lmms_eval_aggregations",
    "test_igvlm", "test_data_pipeline", "test_serve_units",
    "test_pooling", "test_splice", "test_quant", "test_serving",
    "test_native_image_ops", "test_prefix_cache", "test_losses",
    "test_paged_attention", "test_spec_batched", "test_constrained",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quick: fast subset (pure-python + small-jit modules), "
                   "run with `pytest -m quick`")


def pytest_collection_modifyitems(config, items):
    for item in items:
        module = item.nodeid.split("::")[0].rsplit("/", 1)[-1]
        if module.removesuffix(".py") in _QUICK_MODULES:
            item.add_marker(pytest.mark.quick)
