"""Differentiable chunked sparse attention ops + the full sparse GAT layer.

Composes the three Pallas primitives (SpMM scatter, SDDMM dot, expand-rows
broadcast) into custom-VJP ops, then a full-graph GAT attention layer with ONE
feature gather per layer (source rows are gathered once and reused for scores and
aggregation — the reference's sparse path gathers per op, ``gatconv.py:111-148``).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dgll_tpu.ops.chunked import R_BLOCK, ChunkedCSR
from dgll_tpu.ops.pallas.expand_rows import expand_rows_chunked
from dgll_tpu.ops.pallas.sddmm import (
    edge_softmax_chunked,
    edge_softmax_chunked_heads,
    sddmm_chunked_pallas,
)
from dgll_tpu.ops.pallas.segment_matmul import spmm_chunked_pallas, zero_cotangent


def _valid01(c: ChunkedCSR):
    return (c.weight != 0).astype(jnp.float32)


# -------------------------------------------------- spmm over premultiplied msgs
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _spmm_msg(interpret, c: ChunkedCSR, ct: ChunkedCSR, msg):
    return spmm_chunked_pallas(c, msg, weights=_valid01(c), interpret=interpret)


def _spmm_msg_fwd(interpret, c, ct, msg):
    proto = jnp.zeros((0,), msg.dtype)  # dtype carrier (residuals must be arrays)
    return _spmm_msg(interpret, c, ct, msg), (c, ct, proto)


def _spmm_msg_bwd(interpret, res, g):
    c, ct, proto = res
    dmsg = expand_rows_chunked(c, g.astype(proto.dtype), interpret=interpret)
    dmsg = dmsg * _valid01(c)[: c.n_chunk].reshape(-1, 1).astype(proto.dtype)
    return zero_cotangent(c), zero_cotangent(ct), dmsg


_spmm_msg.defvjp(_spmm_msg_fwd, _spmm_msg_bwd)


def spmm_msg(c: ChunkedCSR, ct: ChunkedCSR, msg, interpret=False):
    """out[i] = sum_{slots k with dst_k = i} msg_k — unit-weight scatter for messages
    already premultiplied by attention/edge weights (differentiable in msg; the VJP
    is one expand-rows launch, no sddmm)."""
    return _spmm_msg(interpret, c, ct, msg)


# ---------------------------------------------------------- spmm w/ dyn weights
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _spmm_dyn(interpret, c: ChunkedCSR, ct: ChunkedCSR, msg, weights):
    return spmm_chunked_pallas(c, msg, weights=weights, interpret=interpret)


def _spmm_dyn_fwd(interpret, c, ct, msg, weights):
    out = spmm_chunked_pallas(c, msg, weights=weights, interpret=interpret)
    return out, (c, ct, msg, weights)


def _spmm_dyn_bwd(interpret, res, g):
    c, ct, msg, weights = res
    g_edges = expand_rows_chunked(c, g.astype(msg.dtype), interpret=interpret)
    # msg rides the compute grid (n_chunk rows of eb); weights the metadata layout
    dmsg = weights[: c.n_chunk].reshape(-1, 1).astype(msg.dtype) * g_edges
    dw = sddmm_chunked_pallas(c, g.astype(msg.dtype), msg, interpret=interpret)
    dw = jnp.where(c.weight != 0, dw, 0.0)
    return zero_cotangent(c), zero_cotangent(ct), dmsg, dw


_spmm_dyn.defvjp(_spmm_dyn_fwd, _spmm_dyn_bwd)


def spmm_dyn(c: ChunkedCSR, ct: ChunkedCSR, msg, weights, interpret=False):
    """out[i] = sum_{slots k with dst_k=i} weights_k * msg_k  (differentiable in
    msg and weights — attention aggregation)."""
    return _spmm_dyn(interpret, c, ct, msg, weights)


# ------------------------------------------------------------------------ sddmm
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sddmm(interpret, c: ChunkedCSR, ct: ChunkedCSR, a, msg):
    return sddmm_chunked_pallas(c, a, msg, interpret=interpret)


def _sddmm_fwd(interpret, c, ct, a, msg):
    return sddmm_chunked_pallas(c, a, msg, interpret=interpret), (c, ct, a, msg)


def _sddmm_bwd(interpret, res, g):
    c, ct, a, msg = res
    g = jnp.where(c.weight != 0, g, 0.0)
    # da[i] = sum_k g_k * msg_k  -> scatter with dynamic weights g
    da = spmm_chunked_pallas(c, msg, weights=g, interpret=interpret).astype(a.dtype)
    # dmsg_k = g_k * a[dst_k]
    a_edges = expand_rows_chunked(c, a, interpret=interpret)
    dmsg = g[: c.n_chunk].reshape(-1, 1).astype(msg.dtype) * a_edges
    return zero_cotangent(c), zero_cotangent(ct), da, dmsg


_sddmm.defvjp(_sddmm_fwd, _sddmm_bwd)


def sddmm(c: ChunkedCSR, ct: ChunkedCSR, a, msg, interpret=False):
    """e_k = <a[dst_k], msg_k> per edge slot (differentiable in a and msg)."""
    return _sddmm(interpret, c, ct, a, msg)


# ------------------------------------------------------------- full GAT layer
def gat_attention_chunked(
    c: ChunkedCSR,
    ct: ChunkedCSR,
    h: jax.Array,
    a_src: jax.Array,
    a_dst: jax.Array,
    negative_slope: float = 0.2,
    interpret: bool = False,
) -> jax.Array:
    """Single-head sparse GAT aggregation over the chunked full graph.

    ``h [c.n_rows, F]`` (projected features, row-padded), ``a_src``/``a_dst`` [F].
    One HBM feature gather (source rows), scores/softmax/aggregation on kernels.
    Fully differentiable (custom VJPs above + XLA softmax).
    """
    from dgll_tpu.ops.pallas.edge_ops import (
        edge_softmax_chunked_fast,
        rows_to_edges_d,
    )

    nc, nm = c.n_chunk, c.n_chunk_meta
    msg = jnp.take(h, c.src[:nc].reshape(-1), axis=0)     # the one gather
    sc_src = msg @ a_src.astype(msg.dtype)                # [E] no gather
    sc_src = jnp.pad(sc_src, (0, (nm - nc) * c.eb))       # to the metadata layout
    s_dst = h @ a_dst.astype(h.dtype)                     # [n_rows]
    # dst-score broadcast + softmax ride the chunk kernels (edge_ops.py) —
    # the XLA take/segment forms cost ~10x on TPU (gat_profile_r4.json)
    sc_dst = rows_to_edges_d(c, s_dst, interpret).reshape(-1)
    e = sc_src + sc_dst
    e = jnp.where(e > 0, e, negative_slope * e)
    alpha = edge_softmax_chunked_fast(c, e[:, None], interpret)[:, 0]
    return spmm_dyn(c, ct, msg, alpha.reshape(nm, c.eb), interpret)


def gat_attention_chunked_fused(
    c: ChunkedCSR,
    ct: ChunkedCSR,
    h: jax.Array,
    a_src: jax.Array,
    a_dst: jax.Array,
    negative_slope: float = 0.2,
    interpret: bool = False,
    drop_mask: jax.Array = None,
) -> jax.Array:
    """Round-5 fused sparse GAT: 3 launches fwd / 4 bwd (``gat_fused.py``).

    ``h [n_rows, H*F]`` (projected, row-padded), ``a_src``/``a_dst`` [H, F].
    One gather; scores' dst-broadcast + the 4-launch softmax collapse into one
    online-stats sweep + one alpha pass. ``drop_mask`` enables attention
    dropout through the kernel path. Returns ``[n_rows, H, F]``.
    """
    from dgll_tpu.ops.pallas.gat_fused import gat_attention_fused

    assert h.shape[0] == c.n_rows, (h.shape, c.n_rows)
    return gat_attention_fused(c, ct, h, a_src, a_dst, negative_slope,
                               interpret, drop_mask=drop_mask)


def gat_attention_chunked_multihead(
    c: ChunkedCSR,
    ct: ChunkedCSR,
    h: jax.Array,
    a_src: jax.Array,
    a_dst: jax.Array,
    negative_slope: float = 0.2,
    interpret: bool = False,
) -> jax.Array:
    """Multi-head sparse GAT: ``h [n_rows, H*F]``, ``a_src``/``a_dst`` [H, F].

    ONE gather, ONE softmax (all heads batched through the segment ops), ONE
    kernel launch: per-edge attention premultiplies the gathered messages
    (``msg * alpha`` head-wise on the VPU, fused by XLA), so aggregation is a
    single unit-weight chunked scatter at the full H*F width. The MXU-tileability
    condition is therefore ``(H*F) % 128 == 0`` — reachable for reference-style
    many-small-head configs — instead of per-head ``F % 128 == 0``. Returns
    ``[n_rows, H, F]`` (concat or mean at the call site).
    """
    n_heads, f = a_src.shape
    nc, nm = c.n_chunk, c.n_chunk_meta
    e_rows = nc * c.eb
    msg = jnp.take(h, c.src[:nc].reshape(-1), axis=0)      # [E, H*F] one gather

    msg_hf = msg.reshape(e_rows, n_heads, f)
    sc_src = jnp.einsum("ehf,hf->eh", msg_hf, a_src.astype(msg.dtype))
    sc_src = jnp.pad(sc_src, ((0, (nm - nc) * c.eb), (0, 0)))  # metadata layout
    s_dst = jnp.einsum("nhf,hf->nh", h.reshape(-1, n_heads, f), a_dst.astype(h.dtype))
    # dst-score broadcast + softmax ride the chunk kernels (edge_ops.py),
    # all heads batched per launch — the XLA take/segment forms cost ~10x on
    # TPU and per-head launches are grid-overhead-bound (gat_profile_r4.json)
    from dgll_tpu.ops.pallas.edge_ops import (
        edge_softmax_chunked_multi,
        rows_to_edges_multi,
    )

    sc_dst = rows_to_edges_multi(c, s_dst, interpret)      # [Emeta, H]
    e = sc_src + sc_dst
    e = jnp.where(e > 0, e, negative_slope * e)
    alpha = edge_softmax_chunked_multi(c, e, interpret)    # [Emeta, H]

    msg_w = (msg_hf * alpha[:e_rows, :, None].astype(msg.dtype)).reshape(e_rows, -1)
    out = spmm_msg(c, ct, msg_w, interpret)                # one launch, width H*F
    return out.reshape(-1, n_heads, f)
