"""Feature quantization / binarization.

The reference architecture's "Quantization/Binarization" block (README / drawio —
SURVEY.md §0 lists it in the capability surface). TPU-native design: features are
stored int8 (or sign-binarized) with per-column scales; dequantisation fuses into the
post-gather compute under jit. Quadruples HBM feature-cache capacity and halves
gather traffic on byte-bound paths.

Includes a Pallas stochastic-rounding quantizer (VPU PRNG) with an XLA fallback for
CPU/interpret paths.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class QuantizedFeatures:
    values: jax.Array    # [N, D] int8
    scale: jax.Array     # [D] float32 (per-column)
    n: int = struct.field(pytree_node=False, default=0)
    d: int = struct.field(pytree_node=False, default=0)

    def gather(self, ids, dtype=jnp.float32) -> jax.Array:
        q = jnp.take(self.values, ids, axis=0)
        return q.astype(dtype) * self.scale.astype(dtype)[None, :]

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        return self.values.astype(dtype) * self.scale.astype(dtype)[None, :]


def quantize_int8(x, stochastic: bool = False, seed: int = 0) -> QuantizedFeatures:
    """Per-column symmetric int8 quantisation (host or device input)."""
    x = jnp.asarray(x, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=0), 1e-12) / 127.0
    y = x / scale[None, :]
    if stochastic:
        key = jax.random.key(seed)
        y = y + jax.random.uniform(key, y.shape, minval=-0.5, maxval=0.5)
    q = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    return QuantizedFeatures(values=q, scale=scale, n=int(x.shape[0]), d=int(x.shape[1]))


def binarize(x) -> Tuple[jax.Array, jax.Array]:
    """Sign binarization with per-column mean-magnitude scale (XNOR-style).

    Returns (signs int8 in {-1, +1}, scale [D]); reconstruct as ``signs * scale``.
    """
    x = jnp.asarray(x, jnp.float32)
    scale = jnp.mean(jnp.abs(x), axis=0)
    signs = jnp.where(x >= 0, 1, -1).astype(jnp.int8)
    return signs, scale


def quantization_error(x, qf: QuantizedFeatures) -> float:
    x = jnp.asarray(x, jnp.float32)
    err = jnp.abs(qf.dequantize() - x)
    return float(jnp.mean(err) / jnp.maximum(jnp.mean(jnp.abs(x)), 1e-12))


# ---------------------------------------------------------------- pallas kernel
def quantize_int8_pallas(x: jax.Array, seed: int = 0, interpret: bool = False
                         ) -> QuantizedFeatures:
    """Stochastic-rounding int8 quantizer as a Pallas TPU kernel.

    Row-blocked; per-column scales are computed with XLA (one pass), the
    round+clip+pack runs on the VPU with the on-core PRNG.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=0), 1e-12) / 127.0

    blk = 256
    n_pad = ((n + blk - 1) // blk) * blk
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))

    # the on-core PRNG has no CPU/interpret lowering; feed precomputed noise there
    use_device_prng = not interpret

    def kernel(seed_ref, x_ref, inv_scale_ref, *rest):
        if use_device_prng:
            (q_ref,) = rest
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
            bits = pltpu.prng_random_bits(x_ref.shape)
            # uniform in [-0.5, 0.5) from the top 24 bits
            u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24)) - 0.5
        else:
            u_ref, q_ref = rest
            u = u_ref[:]
        y = x_ref[:] * inv_scale_ref[0][None, :]
        q = jnp.clip(jnp.floor(y + 0.5 + u), -127, 127)
        q_ref[:] = q.astype(jnp.int8)

    in_specs = [
        pl.BlockSpec((blk, d), lambda i, s: (i, 0)),
        pl.BlockSpec((1, d), lambda i, s: (0, 0)),
    ]
    args = [jnp.asarray([seed], jnp.int32), x, (1.0 / scale).reshape(1, d)]
    if not use_device_prng:
        in_specs.append(pl.BlockSpec((blk, d), lambda i, s: (i, 0)))
        args.append(
            jax.random.uniform(jax.random.key(seed), (n_pad, d), minval=-0.5,
                               maxval=0.5)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // blk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((blk, d), lambda i, s: (i, 0)),
    )
    q = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.int8),
        interpret=interpret,
    )(*args)
    return QuantizedFeatures(values=q[:n], scale=scale, n=int(n), d=int(d))
