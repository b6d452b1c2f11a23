"""Multi-process distributed bring-up: the reference's Gloo-on-one-host trick
(SURVEY.md §4, MQGCN.py:100-109) as a real 2-process jax.distributed test."""
import os
import sys

import pytest

from dgll_tpu.parallel.launch import launch_local


@pytest.mark.slow
def test_two_process_cpu_mesh_psum():
    env = {
        # CPU-only in the children: disable the ambient TPU plugin hook and give
        # each process 2 virtual CPU devices -> a 2-proc x 2-dev global mesh.
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    }
    results = launch_local(
        2, [sys.executable, "-m", "dgll_tpu.parallel.launch"], env=env, timeout=240
    )
    out = "".join(r.stdout for r in results)
    assert "MULTIPROC_OK procs=2 devices=4" in out, out
