"""Trustworthy TPU timing for remote-attached devices.

On this environment's relay-attached TPU, ``block_until_ready`` can return before
execution finishes, so naive timing loops report dispatch latency, not compute.
The reliable pattern: build a K-step *dependent chain* (each step consumes the
previous output) and force it with a single scalar device-to-host read, then fit the
per-step slope from two chain lengths (eliminating the constant RTT/launch overhead).
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def chain_time(step: Callable, x0, k_small: int = 5, k_large: int = 20,
               repeats: int = 2) -> float:
    """Per-step seconds of ``x = step(x)`` in steady state (slope fit).

    ``step`` must return something of the same structure as its input and contain a
    real data dependency on it.
    """
    def run(k: int) -> float:
        x = x0
        t0 = time.perf_counter()
        for _ in range(k):
            x = step(x)
        leaf = jax.tree.leaves(x)[0]
        _ = float(jnp.ravel(leaf)[0])  # scalar D2H forces the chain
        return time.perf_counter() - t0

    run(2)  # warm
    ts, tl = min(run(k_small) for _ in range(repeats)), min(
        run(k_large) for _ in range(repeats)
    )
    return max((tl - ts) / (k_large - k_small), 1e-9)
