"""Pallas TPU kernel: window-fused SpMM — the gather rides the MXU.

``act(A @ x [+ bias])`` over the windowed layout (``dgll_tpu/ops/windowed.py``)
with NO row gather and NO [E, F] message round-trip: per grid step the pipeline
streams one aligned [WIN_ROWS, Ft] block of ``x`` (selected by the
scalar-prefetched ``win_block``) into VMEM at block-DMA bandwidth, the kernel
rebuilds each 128-edge sub-chunk's messages with a one-hot [SUB, SUB] MXU
matmul against a dynamically-sliced 128-row sub-window, and the classic
scatter-matmul ``S @ msg`` accumulates into the revisited output tile.

Hardware rationale (measured, ``benchmarks/results/pallas_probe_r4.json``):
XLA row-gather ~4-11 ns/row and per-row DMA ~40 ns/row vs streamed block DMA
~0.9 ns/row + one-hot MXU gather ~2.4 ns/row. Fusing this way replaces the r3
path's dominant cost (the gather was 72-80 % of kernel time) with streaming +
MXU work. TPU-native equivalent of the reference CUDA kernel's direct
``X[col]`` global-memory reads (``gcn_fused_kernel.cu:5-74``).

``spmm_hybrid`` composes this with the classic gather kernel for the residual
(non-local) edges and carries the custom VJP (backward = the same kernels over
the transpose layouts).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgll_tpu.ops.chunked import R_BLOCK
from dgll_tpu.ops.pallas.segment_matmul import (
    _cast_msg,
    _gather_msg,
    spmm_chunked_pallas,
    zero_cotangent,
)
from dgll_tpu.ops.windowed import SUB, WIN_ROWS, HybridCSR, WindowedCSR


def _kernel(row_block_ref, win_block_ref, sub_off_ref,
            *refs, eb: int, ft: int, n_sub: int,
            activation: Optional[str], has_bias: bool):
    # refs: srcl_0..srcl_{n_sub-1}, dstl_0.., w_0.., xwin, bias, out, acc
    srcl_refs = refs[:n_sub]
    dstl_refs = refs[n_sub:2 * n_sub]
    w_refs = refs[2 * n_sub:3 * n_sub]
    xwin_ref, bias_ref, out_ref, acc_ref = refs[3 * n_sub:]

    c = pl.program_id(1)
    n_chunk = pl.num_programs(1)

    rb = row_block_ref[c]
    is_first = jnp.logical_or(c == 0, row_block_ref[jnp.maximum(c - 1, 0)] != rb)
    is_last = jnp.logical_or(
        c == n_chunk - 1, row_block_ref[jnp.minimum(c + 1, n_chunk - 1)] != rb
    )
    cm = c % 8
    dt = xwin_ref.dtype

    # Per sub-chunk: every metadata read is a FULL-LANE [1, SUB] row (Mosaic
    # cannot sublane-broadcast a lane-sliced vector — the metadata is stored as
    # per-sub-chunk planes precisely so no lane slicing happens here).
    # T_k = S_k @ GT_k^T is the chunk's weighted dense adjacency tile over the
    # 128-row sub-window; part = sum_k T_k @ xsub — the gather never happens,
    # the one-hot contraction rides the MXU.
    part = jnp.zeros((R_BLOCK, ft), jnp.float32)
    rows_out = jax.lax.broadcasted_iota(jnp.int32, (R_BLOCK, SUB), 0)
    rws = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)        # [row, edge]
    for k in range(n_sub):
        off = pl.multiple_of(sub_off_ref[c * n_sub + k], 16)
        xsub = xwin_ref[pl.ds(off, SUB), :]                        # [SUB, ft]
        srcl_k = srcl_refs[k][pl.ds(cm, 1), :]                      # [1, SUB]
        dstl_k = dstl_refs[k][pl.ds(cm, 1), :]
        w_k = w_refs[k][pl.ds(cm, 1), :]
        S_k = jnp.where(rows_out == dstl_k, w_k, 0.0).astype(dt)    # [R, SUB]
        GT = (rws == srcl_k).astype(dt)                             # pad=-1 -> 0
        T = jax.lax.dot_general(
            S_k, GT, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                           # [R, SUBrows]
        part = part + jnp.dot(T.astype(dt), xsub,
                              preferred_element_type=jnp.float32)

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


def spmm_windowed_pallas(
    c: WindowedCSR,
    x: jax.Array,
    bias: Optional[jax.Array] = None,
    activation: Optional[str] = None,
    ft: int = 128,
    out_dtype=None,
    interpret: bool = False,
    weights: Optional[jax.Array] = None,
) -> jax.Array:
    """act(A @ x + bias), gather-free. ``x`` must cover ``c.n_cols`` padded rows."""
    f = x.shape[-1]
    assert f % ft == 0, (f, ft)
    assert x.shape[0] == c.n_cols, (x.shape, c.n_cols)
    out_dtype = out_dtype or x.dtype
    has_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((f,), x.dtype)
    if weights is None:
        weights = c.weight
    assert weights.shape == (c.n_sub, c.n_chunk_meta, SUB), weights.shape

    n_sub = c.n_sub
    grid = (f // ft, c.n_chunk)
    kernel = functools.partial(
        _kernel, eb=c.eb, ft=ft, n_sub=n_sub,
        activation=activation, has_bias=has_bias,
    )
    meta_spec = pl.BlockSpec((8, SUB), lambda j, ci, rb, wb, so: (ci // 8, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # row_block, win_block, sub_off
        grid=grid,
        in_specs=(
            [meta_spec] * (3 * n_sub)   # srcl_k, dstl_k, w_k planes
            + [
                pl.BlockSpec((WIN_ROWS, ft),
                             lambda j, ci, rb, wb, so: (wb[ci], j)),  # x window
                pl.BlockSpec((1, ft), lambda j, ci, rb, wb, so: (0, j)),  # bias
            ]
        ),
        out_specs=pl.BlockSpec((R_BLOCK, ft), lambda j, ci, rb, wb, so: (rb[ci], j)),
        scratch_shapes=[
            pltpu.VMEM((R_BLOCK, ft), jnp.float32),
        ],
    )
    planes = ([c.src_local[k] for k in range(n_sub)]
              + [c.dst_local[k] for k in range(n_sub)]
              + [weights[k] for k in range(n_sub)])
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c.n_rows, f), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * c.n_chunk * f * (n_sub * SUB * SUB + R_BLOCK * c.eb),
            bytes_accessed=c.n_chunk * (WIN_ROWS * f * x.dtype.itemsize + c.eb * 12),
            transcendentals=0,
        ),
    )(c.row_block, c.win_block, c.sub_off.reshape(-1),  # 1-D: 2-D SMEM lane-pads 32x
      *planes, x, bias.reshape(1, f))


def _pad_cols(x: jax.Array, n_cols_pad: int) -> jax.Array:
    if x.shape[0] == n_cols_pad:
        return x
    return jnp.pad(x, ((0, n_cols_pad - x.shape[0]), (0, 0)))


def _hybrid_forward(h: HybridCSR, x, bias, activation, interpret, msg_dtype):
    xc = _cast_msg(x, msg_dtype)
    if h.res is None:
        out = spmm_windowed_pallas(
            h.win, _pad_cols(xc, h.win.n_cols), bias, activation,
            out_dtype=x.dtype, interpret=interpret)
    else:
        out = spmm_windowed_pallas(
            h.win, _pad_cols(xc, h.win.n_cols), None, None,
            out_dtype=jnp.float32, interpret=interpret)
        res = spmm_chunked_pallas(
            h.res, _gather_msg(h.res, xc), None, None,
            out_dtype=jnp.float32, interpret=interpret)
        out = out + res[: h.win.n_rows]
        if bias is not None:
            out = out + bias.astype(out.dtype)[None, :]
        if activation == "relu":
            out = jnp.maximum(out, 0.0)
        out = out.astype(x.dtype)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _spmm_hybrid(activation, interpret, msg_dtype, h: HybridCSR, ht: HybridCSR,
                 x, bias):
    return _hybrid_forward(h, x, bias, activation, interpret, msg_dtype)


def _fwd(activation, interpret, msg_dtype, h, ht, x, bias):
    out = _hybrid_forward(h, x, bias, activation, interpret, msg_dtype)
    mask = (out > 0) if activation == "relu" else None
    return out, (h, ht, mask, x.shape[0], bias is not None)


def _bwd(activation, interpret, msg_dtype, residuals, g):
    h, ht, mask, n_in, had_bias = residuals
    if activation == "relu":
        g = jnp.where(mask, g, 0.0)
    dx = _hybrid_forward(ht, g, None, None, interpret, msg_dtype)[:n_in]
    db = jnp.sum(g, axis=0) if had_bias else None
    return zero_cotangent(h), zero_cotangent(ht), dx, db


_spmm_hybrid.defvjp(_fwd, _bwd)


def spmm_hybrid(h: HybridCSR, ht: HybridCSR, x, bias=None, activation=None,
                interpret: Optional[bool] = None, msg_dtype=None):
    """act(A @ x + bias) with custom VJP over hybrid (windowed + residual)
    layouts; ``ht`` is the transpose pair. Returns the padded row space
    ``[h.win.n_rows, F]``. ``msg_dtype=bfloat16`` streams the x windows (and
    the residual messages) at half width with fp32 accumulation.
    """
    if msg_dtype is not None:
        msg_dtype = jnp.dtype(msg_dtype)
    if interpret is None:
        interpret = h.win.interpret  # layout placement decides, as spmm_chunked's callers do
    return _spmm_hybrid(activation, interpret, msg_dtype, h, ht, x, bias)
