"""Chunked CSR layout: the host-side prep for the Pallas segment-matmul SpMM.

The TPU has no fast scatter (no atomics; XLA lowers ``segment_sum`` to a serialized
scatter-add). The TPU-native aggregation is to turn the scatter into MXU matmuls:

* edges (sorted by destination) are cut at 128-row ("row block") boundaries and packed
  into fixed-size chunks of ``EB`` edges;
* per chunk, a one-hot matrix ``S[r, e] = w_e * [dst_e == r]`` is built **in-kernel**
  and ``S @ M`` (M = gathered source rows) produces the chunk's contribution to its
  row block — a [128, EB] x [EB, F] matmul on the systolic array;
* consecutive chunks of the same row block accumulate by output-block revisiting.

This file: the layout + its construction + a pure-XLA reference implementation
(used on CPU and in tests). The Pallas kernel lives in
``dgll_tpu/ops/pallas/segment_matmul.py``.

Capability parity: this is the compiled-kernel replacement for the reference's fused
CUDA GCN kernel (``/root/reference/dgll/FusedKernel/gcn_fused_kernel.cu:5-74``) —
same role (the hot aggregation), hardware-appropriate decomposition (MXU one-hot
matmul instead of warp-per-column shared-memory tiling).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

R_BLOCK = 128  # output rows per block (MXU tile height)


@struct.dataclass
class ChunkedCSR:
    """Edges packed into [n_chunk, EB] slots; chunk c feeds row block row_block[c]."""

    src: jax.Array        # [n_chunk, EB] int32 global source ids (0 on padding)
    dst_local: jax.Array  # [n_chunk, EB] int32 in [0, R_BLOCK) (0 on padding)
    weight: jax.Array     # [n_chunk, EB] float32 (0 on padding)
    row_block: jax.Array  # [n_chunk] int32, non-decreasing
    # Optional (build_chunked_pair): maps each TRANSPOSE-layout compute slot to
    # the slot of the same edge in THIS layout (pads -> n_chunk*eb, a zero
    # row). Lets per-edge cotangents scatter through the transpose layout's
    # compiled kernel instead of XLA's serialized scatter-add (the GAT
    # backward's dominant cost at edge scale).
    t_slot_perm: Optional[jax.Array] = None   # [ct.n_chunk * eb] int32
    n_chunk: int = struct.field(pytree_node=False, default=0)
    eb: int = struct.field(pytree_node=False, default=512)
    n_rows: int = struct.field(pytree_node=False, default=0)  # padded to R_BLOCK
    n_cols: int = struct.field(pytree_node=False, default=0)
    # Whether the Pallas kernel must run in interpret mode for this layout's placement
    # (True off-TPU). Static metadata, so it is visible at trace time even when the
    # layout is a jit argument — dispatch never keys on the process-global backend.
    interpret: bool = struct.field(pytree_node=False, default=False)

    @property
    def n_row_blocks(self) -> int:
        return self.n_rows // R_BLOCK

    @property
    def n_chunk_meta(self) -> int:
        """Rows of the metadata arrays (``n_chunk`` rounded up to the sublane tile 8;
        trailing rows are all-padding and outside the compute grid)."""
        return self.src.shape[0]


def _target_platform(device=None) -> str:
    """Platform the layout's arrays will compute on: explicit device > configured
    default device > default backend."""
    if device is not None:
        return device.platform
    d = jax.config.jax_default_device
    if d is not None and hasattr(d, "platform"):
        return d.platform
    return jax.default_backend()


def build_chunked(
    src: np.ndarray,
    dst: np.ndarray,
    n_rows: int,
    n_cols: int,
    weight: Optional[np.ndarray] = None,
    eb: int = 512,
) -> ChunkedCSR:
    """Pack a COO edge list (any order) into the chunked layout (host, numpy)."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    w = np.ones(len(src), np.float32) if weight is None else np.asarray(weight, np.float32)

    order = np.argsort(dst, kind="stable")
    src, dst, w = src[order], dst[order], w[order]

    nb = -(-n_rows // R_BLOCK)
    n_rows_pad = nb * R_BLOCK
    blk = dst // R_BLOCK
    counts = np.bincount(blk, minlength=nb)
    # every row block gets >= 1 chunk (an all-padding chunk writes zeros), so the
    # kernel's output-revisiting covers every output row exactly once
    chunks_per_blk = np.maximum(-(-counts // eb), 1)
    # pad total chunk count to a multiple of 8: the kernel streams chunk metadata in
    # (8, EB) sublane-tiled blocks; trailing pad chunks carry weight 0 and the last
    # row block id (non-decreasing, zero contribution)
    n_chunk = int(chunks_per_blk.sum())
    # Make the compute-chunk count ODD: the message gather then has
    # n_chunk*eb ≡ eb (mod 1024) rows, dodging XLA's slow gather path for row
    # counts ≡ 0 (mod 1024) (measured 2.5x slower on v5e). The extra chunk is
    # all-padding on the last row block. Metadata rows are padded up to the
    # (8, EB) sublane tile separately; those trailing rows sit OUTSIDE the grid.
    if n_chunk % 2 == 0:
        n_chunk += 1
    n_meta = ((n_chunk + 7) // 8) * 8

    # Pad slots carry weight 0, so their source id is free — spread them over the
    # row space instead of all-0: a clump of identical gather indices serializes on
    # the hot row's HBM bank.
    S = (np.arange(n_meta * eb, dtype=np.int64).reshape(n_meta, eb)
         % max(n_cols, 1)).astype(np.int32)
    D = np.zeros((n_meta, eb), np.int32)
    W = np.zeros((n_meta, eb), np.float32)
    RB = np.zeros(n_meta, np.int32)

    e0 = 0
    c = 0
    for b in range(nb):
        cnt = int(counts[b])
        for k in range(int(chunks_per_blk[b])):
            lo = e0 + k * eb
            hi = min(e0 + (k + 1) * eb, e0 + cnt)
            m = hi - lo
            # edge order within a chunk is free (the scatter matmul sums over
            # slots) — sort by source so the kernel-feeding gather reads
            # ascending runs instead of random rows (HBM row-buffer locality)
            o = lo + np.argsort(src[lo:hi], kind="stable")
            S[c, :m] = src[o]
            D[c, :m] = dst[o] - b * R_BLOCK
            W[c, :m] = w[o]
            RB[c] = b
            c += 1
        e0 += cnt
    RB[c:] = nb - 1  # trailing pad chunks
    # host numpy leaves by design; move with chunked_to_device once
    return ChunkedCSR(
        src=S,
        dst_local=D,
        weight=W,
        row_block=RB,
        n_chunk=n_chunk,
        eb=eb,
        n_rows=n_rows_pad,
        n_cols=n_cols,
        interpret=_target_platform() != "tpu",
    )


def _slot_keys(lay: ChunkedCSR, swap: bool):
    nc = lay.n_chunk
    src = np.asarray(lay.src)[:nc].reshape(-1).astype(np.int64)
    dst = (np.asarray(lay.row_block)[:nc, None] * R_BLOCK
           + np.asarray(lay.dst_local)[:nc]).reshape(-1).astype(np.int64)
    valid = np.asarray(lay.weight)[:nc].reshape(-1) != 0
    return (dst, src, valid) if swap else (src, dst, valid)


def build_slot_perm(a: ChunkedCSR, at: ChunkedCSR) -> np.ndarray:
    """``perm[j]`` = slot in ``a`` holding the edge at transpose slot ``j``.

    Both layouts hold the same (src, dst) multiset (a's slots keyed (src, dst),
    at's keyed swapped); matching by lexsorted keys pairs duplicates
    arbitrarily-but-consistently (per-edge GAT quantities depend only on
    endpoints, so duplicates carry identical values). Padding slots map to
    ``a.n_chunk * eb`` — callers append a zero row there."""
    sa, da, va = _slot_keys(a, swap=False)
    sb, db, vb = _slot_keys(at, swap=True)
    ia = np.flatnonzero(va)
    ib = np.flatnonzero(vb)
    oa = ia[np.lexsort((da[ia], sa[ia]))]
    ob = ib[np.lexsort((db[ib], sb[ib]))]
    perm = np.full(len(sb), a.n_chunk * a.eb, np.int32)
    perm[ob] = oa.astype(np.int32)
    return perm


def build_chunked_pair(
    src: np.ndarray,
    dst: np.ndarray,
    n_rows: int,
    n_cols: int,
    weight: Optional[np.ndarray] = None,
    eb: int = 512,
) -> Tuple[ChunkedCSR, ChunkedCSR]:
    """Chunked layouts for A and A^T (the transpose drives the backward pass).

    ``a.t_slot_perm`` is attached so per-edge cotangents can ride ``at``'s
    compiled scatter (see :func:`build_slot_perm`)."""
    a = build_chunked(src, dst, n_rows, n_cols, weight, eb)
    at = build_chunked(dst, src, n_cols, n_rows, weight, eb)
    a = a.replace(t_slot_perm=build_slot_perm(a, at))
    return a, at


def chunked_to_device(c: ChunkedCSR, device=None) -> ChunkedCSR:
    moved = jax.tree.map(
        (lambda x: jax.device_put(x, device)) if device is not None else jnp.asarray, c
    )
    return moved.replace(interpret=_target_platform(device) != "tpu")


def spmm_chunked_xla(c: ChunkedCSR, x: jax.Array) -> jax.Array:
    """Pure-XLA reference of the chunked one-hot matmul (CPU path / kernel oracle).

    out[rb*R + r, :] = sum_chunks sum_e w[c,e] * [dst_local[c,e]==r] * x[src[c,e], :]
    """
    nc = c.n_chunk
    msg = jnp.take(x, c.src[:nc].reshape(-1), axis=0).reshape(nc, c.eb, -1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (R_BLOCK, c.eb), 0)
    # S: [n_chunk, R, EB]
    S = jnp.where(
        rows[None] == c.dst_local[:nc, None, :], c.weight[:nc, None, :], 0.0
    ).astype(x.dtype)
    partial = jnp.einsum("cre,ced->crd", S, msg,
                         preferred_element_type=jnp.float32)
    out = jax.ops.segment_sum(partial, c.row_block[:nc], num_segments=c.n_row_blocks)
    return out.reshape(c.n_rows, -1).astype(x.dtype)
