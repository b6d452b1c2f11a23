"""Pallas TPU kernel: chunked one-hot segment-matmul SpMM with fused bias+ReLU.

The compiled-kernel heart of the framework — hardware-native replacement for the
reference's fused CUDA GCN kernel (``/root/reference/dgll/FusedKernel/gcn_fused_kernel.cu``,
``gcn_extension.cpp``): computes ``act(A @ M [+ bias])`` where A is the chunked sparse
adjacency (``dgll_tpu/ops/chunked.py``) and M the gathered/weighted source-row matrix.

Design (per grid step, grid = (feat_tiles, n_chunk), chunk-major inner):

* scalar-prefetched ``row_block[c]`` drives the output BlockSpec index map, so
  consecutive chunks of one row block *revisit* the same [128, Ft] output tile in VMEM
  and accumulate there — scatter-free aggregation;
* the scatter matrix ``S[r, e] = w[c, e] * [dst_local[c, e] == r]`` is built in-kernel
  on the VPU (broadcasted iota compare) and applied with one [128, EB] x [EB, Ft] MXU
  matmul in fp32 accumulation;
* on a row block's last chunk, bias add + activation are fused into the final store.

Backward runs the same kernel over the transpose layout (dx = A^T g), with the
activation mask applied to g beforehand — see ``spmm_chunked`` custom VJP.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgll_tpu.ops.chunked import R_BLOCK, ChunkedCSR


def _kernel(row_block_ref, dstl_ref, w_ref, msg_ref, bias_ref, out_ref, acc_ref,
            *, eb: int, ft: int, activation: Optional[str], has_bias: bool):
    c = pl.program_id(1)
    n_chunk = pl.num_programs(1)

    rb = row_block_ref[c]
    is_first = jnp.logical_or(c == 0, row_block_ref[jnp.maximum(c - 1, 0)] != rb)
    is_last = jnp.logical_or(
        c == n_chunk - 1, row_block_ref[jnp.minimum(c + 1, n_chunk - 1)] != rb
    )

    # dstl/w arrive in (8, EB) blocks (TPU min sublane tile); select this chunk's row
    cm = c % 8
    dstl = dstl_ref[pl.ds(cm, 1), :]   # [1, EB]
    w = w_ref[pl.ds(cm, 1), :]         # [1, EB]
    rows = jax.lax.broadcasted_iota(jnp.int32, (R_BLOCK, eb), 0)
    S = jnp.where(rows == dstl, w, 0.0).astype(msg_ref.dtype)
    part = jnp.dot(S, msg_ref[:], preferred_element_type=jnp.float32)  # [R, Ft]

    @pl.when(is_first)
    def _():
        acc_ref[:] = part

    @pl.when(jnp.logical_not(is_first))
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(is_last)
    def _():
        acc = acc_ref[:]
        if has_bias:
            acc = acc + bias_ref[0].astype(jnp.float32)[None, :]
        if activation == "relu":
            acc = jnp.maximum(acc, 0.0)
        out_ref[:] = acc.astype(out_ref.dtype)


def spmm_chunked_pallas(
    c: ChunkedCSR,
    msg: jax.Array,
    bias: Optional[jax.Array] = None,
    activation: Optional[str] = None,
    ft: int = 128,
    out_dtype=None,
    interpret: bool = False,
    weights: Optional[jax.Array] = None,
) -> jax.Array:
    """act(A @ msg + bias) from pre-gathered messages ``msg [n_chunk*EB, F]``.

    ``msg`` row ``c*EB + e`` must be ``x[c.src[c, e]]`` (unweighted — weights are folded
    into the in-kernel scatter matrix). F must be a multiple of ``ft``.
    ``weights`` overrides the layout's static edge weights (runtime values, e.g.
    attention coefficients) — same [n_chunk, EB] shape, zeros on padding.
    """
    f = msg.shape[-1]
    assert f % ft == 0, (f, ft)
    assert msg.shape[0] == c.n_chunk * c.eb, (msg.shape, c.n_chunk, c.eb)
    out_dtype = out_dtype or msg.dtype
    has_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((f,), msg.dtype)
    if weights is None:
        weights = c.weight
    # weights ride the metadata layout (sublane-padded rows; grid reads < n_chunk)
    assert weights.shape == (c.n_chunk_meta, c.eb), weights.shape

    grid = (f // ft, c.n_chunk)
    kernel = functools.partial(
        _kernel, eb=c.eb, ft=ft, activation=activation, has_bias=has_bias
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # row_block
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, c.eb), lambda j, ci, rb: (ci // 8, 0)),            # dst_local
            pl.BlockSpec((8, c.eb), lambda j, ci, rb: (ci // 8, 0)),            # weight
            # msg stays rank-2 [n_chunk*EB, F]: rank-3 reshape of a gather output
            # costs a full HBM copy on TPU; blocking rows (ci*EB, EB) is the same data
            pl.BlockSpec((c.eb, ft), lambda j, ci, rb: (ci, j)),                # msg
            pl.BlockSpec((1, ft), lambda j, ci, rb: (0, j)),                    # bias
        ],
        out_specs=pl.BlockSpec((R_BLOCK, ft), lambda j, ci, rb: (rb[ci], j)),
        scratch_shapes=[pltpu.VMEM((R_BLOCK, ft), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c.n_rows, f), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * c.n_chunk * R_BLOCK * c.eb * f,
            bytes_accessed=c.n_chunk * c.eb * (f * msg.dtype.itemsize + 8),
            transcendentals=0,
        ),
    )(c.row_block, c.dst_local, weights, msg, bias.reshape(1, f))


def _gather_msg(c: ChunkedCSR, x: jax.Array) -> jax.Array:
    # only the compute chunks (odd count -> gather row count ≢ 0 mod 1024, the
    # fast XLA gather path); trailing metadata pad chunks are never read
    return jnp.take(x, c.src[: c.n_chunk].reshape(-1), axis=0)


def zero_cotangent(tree):
    """Zero cotangents for a pytree with integer leaves (float0 where required) —
    used to mark the chunked layouts as constants inside custom VJPs (they must be
    regular args so traced layouts can flow through jitted layers)."""
    import numpy as np

    def z(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(x.shape, jax.dtypes.float0)

    return jax.tree.map(z, tree)


def _cast_msg(x, msg_dtype):
    """Cast BEFORE the gather so the [E_pad, F] message traffic (the dominant HBM
    cost — write + kernel re-read) moves at the narrow width; one extra [N, F]
    pass over x is far cheaper than the edge-sized saving."""
    if msg_dtype is not None and x.dtype != msg_dtype:
        return x.astype(msg_dtype)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _spmm_chunked(activation, interpret, msg_dtype,
                  c: ChunkedCSR, ct: ChunkedCSR, x, bias):
    return spmm_chunked_pallas(c, _gather_msg(c, _cast_msg(x, msg_dtype)), bias,
                               activation, out_dtype=x.dtype, interpret=interpret)


def _fwd(activation, interpret, msg_dtype, c, ct, x, bias):
    out = spmm_chunked_pallas(c, _gather_msg(c, _cast_msg(x, msg_dtype)), bias,
                              activation, out_dtype=x.dtype, interpret=interpret)
    mask = (out > 0) if activation == "relu" else None
    return out, (c, ct, mask, x.shape[0], bias is not None)


def _bwd(activation, interpret, msg_dtype, residuals, g):
    c, ct, mask, n_in, had_bias = residuals
    if activation == "relu":
        g = jnp.where(mask, g, 0.0)
    # dx = A^T g: transpose layout's sources are A's destination rows (< c.n_rows),
    # so g (already padded to c.n_rows) gathers directly.
    dx_full = spmm_chunked_pallas(ct, _gather_msg(ct, _cast_msg(g, msg_dtype)),
                                  None, None, out_dtype=g.dtype,
                                  interpret=interpret)
    dx = dx_full[:n_in]
    db = jnp.sum(g, axis=0) if had_bias else None
    return zero_cotangent(c), zero_cotangent(ct), dx, db


_spmm_chunked.defvjp(_fwd, _bwd)


def spmm_chunked(c: ChunkedCSR, ct: ChunkedCSR, x, bias=None, activation=None,
                 interpret: bool = False, msg_dtype=None):
    """act(A @ x + bias) with custom VJP; ``ct`` is the transpose layout (A^T).

    Returns the full padded row space ``[c.n_rows, F]`` (slice to real rows at call
    sites). Differentiable in ``x`` and ``bias``; backward runs the same kernel over
    the transpose layout: dx = A^T (act'(out) * g) — the structural twin of the
    reference backward kernel (``gcn_fused_kernel.cu:77-188``) minus the atomics.

    ``msg_dtype=jnp.bfloat16`` moves the edge-sized message matrix (and the
    in-kernel MXU inputs) at half width with fp32 accumulation — the HBM-traffic
    analog of the reference kernel reading X through ``__half``-free fp32 but at
    TPU-native bf16 throughput. Output stays in ``x.dtype``.
    """
    if msg_dtype is not None:
        msg_dtype = jnp.dtype(msg_dtype)
    return _spmm_chunked(activation, interpret, msg_dtype, c, ct, x, bias)
