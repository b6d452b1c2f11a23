"""Pallas kernel: broadcast destination rows to edge slots (chunked layout).

``out[k] = a[dst_k]`` for every edge slot — the gather-free dual of the chunked SpMM
scatter (rows are materialised on the MXU as ``S0^T @ A_block``). This is the shared
backward primitive: d(msg) of an SpMM and d(msg) of an SDDMM both need per-edge
destination rows.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgll_tpu.ops.chunked import R_BLOCK, ChunkedCSR


def _expand_kernel(row_block_ref, dstl_ref, a_ref, out_ref, *, eb: int):
    c = pl.program_id(1)
    cm = c % 8
    dstl = dstl_ref[pl.ds(cm, 1), :]                       # [1, EB]
    rows = jax.lax.broadcasted_iota(jnp.int32, (R_BLOCK, eb), 0)
    S0 = (rows == dstl).astype(a_ref.dtype)                # [R, EB]
    out_ref[:] = jax.lax.dot_general(
        S0, a_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def expand_rows_chunked(
    c: ChunkedCSR, a: jax.Array, ft: int = 128, interpret: bool = False
) -> jax.Array:
    """[n_chunk*EB, F] with row ``k = ci*EB + e`` equal to ``a[dst of slot]``.

    Padding slots replicate row 0 of their block — mask downstream via
    ``c.weight != 0`` when it matters.
    """
    f = a.shape[-1]
    assert f % ft == 0 and a.shape[0] == c.n_rows

    kernel = functools.partial(_expand_kernel, eb=c.eb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(f // ft, c.n_chunk),
        in_specs=[
            pl.BlockSpec((8, c.eb), lambda j, ci, rb: (ci // 8, 0)),
            pl.BlockSpec((R_BLOCK, ft), lambda j, ci, rb: (rb[ci], j)),
        ],
        out_specs=pl.BlockSpec((c.eb, ft), lambda j, ci, rb: (ci, j)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c.n_chunk * c.eb, f), a.dtype),
        interpret=interpret,
    )(c.row_block, c.dst_local, a)
