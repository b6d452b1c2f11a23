"""Pallas SDDMM: per-edge dot products over the chunked layout.

The compiled replacement for the reference's sparse-GAT score machinery
(``/root/reference/dgll/nn/Convolution/gatconv.py:60-81`` ``SpecialSpmmFunction``):
``e[k] = <a[dst_k], b[src_k]>`` for every edge, emitted chunk-major so the scores
feed straight back into the chunked SpMM as dynamic weights (GAT aggregation).

Key trick: the destination-side rows are *not* gathered from HBM — each chunk's
``a[dst]`` rows are materialised on the MXU as ``S0^T @ A_block`` where ``S0`` is the
chunk's 0/1 scatter matrix and ``A_block`` the resident [128, F] row-block tile; only
the source side needs a real gather, and that gather is shared with the aggregation
pass of the same layer.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgll_tpu.ops.chunked import R_BLOCK, ChunkedCSR


def _sddmm_kernel(row_block_ref, dstl_ref, a_ref, msgb_ref, out_ref, *, eb: int):
    c = pl.program_id(0)
    cm = c % 8
    dstl = dstl_ref[pl.ds(cm, 1), :]                      # [1, EB]
    rows = jax.lax.broadcasted_iota(jnp.int32, (R_BLOCK, eb), 0)
    S0 = (rows == dstl).astype(a_ref.dtype)               # [R, EB]
    # a-rows per edge slot via MXU: [EB, F] = S0^T @ A_block (contraction on dim 0
    # expressed via dot_general so Mosaic feeds the MXU without an explicit transpose)
    a_edges = jax.lax.dot_general(
        S0, a_ref[:], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    e = jnp.sum(a_edges * msgb_ref[:].astype(jnp.float32), axis=-1)  # [EB]
    out_ref[pl.ds(cm, 1), :] = e[None, :].astype(out_ref.dtype)


def sddmm_chunked_pallas(
    c: ChunkedCSR,
    a: jax.Array,
    msg_b: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Edge scores [n_chunk, EB]: ``<a[dst], b[src]>`` per edge slot.

    ``a`` is the full destination-side feature matrix [c.n_rows, F] (row blocks are
    streamed, never gathered); ``msg_b [n_chunk*EB, F]`` are the pre-gathered
    source-side rows (share them with ``spmm_chunked_pallas``). Padding slots produce
    garbage scores — mask with ``c.weight != 0`` downstream.
    """
    f = a.shape[-1]
    assert a.shape[0] == c.n_rows, (a.shape, c.n_rows)
    assert msg_b.shape == (c.n_chunk * c.eb, f), msg_b.shape

    kernel = functools.partial(_sddmm_kernel, eb=c.eb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # row_block
        grid=(c.n_chunk,),
        in_specs=[
            pl.BlockSpec((8, c.eb), lambda ci, rb: (ci // 8, 0)),     # dst_local
            pl.BlockSpec((R_BLOCK, f), lambda ci, rb: (rb[ci], 0)),   # a row block
            pl.BlockSpec((c.eb, f), lambda ci, rb: (ci, 0)),          # msg_b chunk
        ],
        out_specs=pl.BlockSpec((8, c.eb), lambda ci, rb: (ci // 8, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c.n_chunk_meta, c.eb), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * c.n_chunk * R_BLOCK * c.eb * f + 2 * c.n_chunk * c.eb * f,
            bytes_accessed=c.n_chunk * c.eb * f * msg_b.dtype.itemsize,
            transcendentals=0,
        ),
    )(c.row_block, c.dst_local, a, msg_b)
    # out rides the metadata layout; grid rows >= n_chunk are uninitialised Pallas
    # output memory — zero them here so the padded-tail contract holds at the
    # producer rather than relying on downstream `c.weight != 0` masking
    return jnp.where(jnp.arange(c.n_chunk_meta)[:, None] < c.n_chunk, out, 0.0)


def sddmm_chunked_xla(c: ChunkedCSR, a: jax.Array, msg_b: jax.Array) -> jax.Array:
    """XLA reference of the same contraction (CPU path / kernel oracle)."""
    nc = c.n_chunk
    dg = (c.row_block[:nc, None] * R_BLOCK + c.dst_local[:nc]).reshape(-1)
    a_edges = jnp.take(a, dg, axis=0)
    e = jnp.sum(a_edges.astype(jnp.float32) * msg_b.astype(jnp.float32), axis=-1)
    e = e.reshape(nc, c.eb)
    return jnp.pad(e, ((0, c.n_chunk_meta - nc), (0, 0)))


def edge_softmax_chunked(c: ChunkedCSR, scores: jax.Array) -> jax.Array:
    """Per-destination softmax over chunked scores [n_chunk, EB] -> weights.

    Padding slots (weight 0 in the layout) are excluded. Small segment ops over
    E scalars — XLA path (the [E]-sized tensors are tiny next to features).
    """
    valid = c.weight != 0
    dst_global = c.row_block[:, None] * R_BLOCK + c.dst_local
    flat_dst = dst_global.reshape(-1)
    flat_scores = jnp.where(valid.reshape(-1), scores.reshape(-1), -jnp.inf)
    mx = jax.ops.segment_max(flat_scores, flat_dst, num_segments=c.n_rows)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    ex = jnp.where(valid.reshape(-1),
                   jnp.exp(flat_scores - mx[flat_dst]), 0.0)
    den = jax.ops.segment_sum(ex, flat_dst, num_segments=c.n_rows)
    alpha = ex / jnp.maximum(den, 1e-16)[flat_dst]
    return alpha.reshape(c.n_chunk_meta, c.eb)


def edge_softmax_chunked_heads(c: ChunkedCSR, scores: jax.Array) -> jax.Array:
    """Per-destination softmax with a trailing head axis: ``scores [n_meta*EB, H]``
    -> alpha of the same shape (all heads in one set of segment ops)."""
    valid = (c.weight != 0).reshape(-1)
    dst_global = (c.row_block[:, None] * R_BLOCK + c.dst_local).reshape(-1)
    s = jnp.where(valid[:, None], scores, -jnp.inf)
    mx = jax.ops.segment_max(s, dst_global, num_segments=c.n_rows)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    ex = jnp.where(valid[:, None], jnp.exp(s - mx[dst_global]), 0.0)
    den = jax.ops.segment_sum(ex, dst_global, num_segments=c.n_rows)
    return ex / jnp.maximum(den, 1e-16)[dst_global]
