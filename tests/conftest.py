"""Test config: force an 8-device virtual CPU platform before JAX initialises.

Mirrors the reference's "Gloo on one host" trick for cluster-free distributed testing
(SURVEY.md §4): all sharding/collective tests run on a virtual CPU mesh.
"""
import os

# Force-override: the ambient environment pins JAX_PLATFORMS to the TPU tunnel; unit
# tests must run on the virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
