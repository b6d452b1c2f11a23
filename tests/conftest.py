"""Test config: force an 8-device virtual CPU platform before JAX initialises.

Mirrors the reference's "Gloo on one host" trick for cluster-free distributed testing
(SURVEY.md §4): all sharding/collective tests run on a virtual CPU mesh.
"""
import os

# The ambient environment force-registers a TPU plugin and pins JAX_PLATFORMS at
# interpreter startup (sitecustomize), so the env var alone is NOT enough: the
# config update below (after import) is what actually re-selects the CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", (
    "test suite must run on the virtual CPU mesh; got " + jax.default_backend()
)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: multi-process / long-running tests")
