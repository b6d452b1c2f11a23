"""Windowed chunked layout: gather-free SpMM for locality-bearing graphs.

The r3 kernel (``ops/chunked.py`` + ``ops/pallas/segment_matmul.py``) is
gather-bound: 72-80 % of its time is the XLA row gather feeding the message
matrix, and the hardware probe (``benchmarks/results/pallas_probe_r4.json``,
TPU v5e) shows why no per-row mechanism can fix that — XLA's take is ~4-11
ns/row, per-row DMA is 40 ns/row, while *streamed block DMA* runs at 1183 GB/s
(~0.9 ns/row) and a one-hot MXU matmul gathers from a VMEM-resident window at
~2.4 ns/row. The fused design therefore moves x in 512-row WINDOW BLOCKS picked
per chunk by a scalar-prefetched index map, and gathers in-kernel with small
one-hot matmuls — the gather rides the MXU and the streaming DMA path, and the
[E, F] message matrix never exists in HBM.

This requires source locality: every chunk's sources must fall in one aligned
``WIN_ROWS`` window of x, and every 128-edge sub-chunk's sources in a 128-row
sub-window. Clustered graphs — the reference's actual benchmark targets
(ogbn-products, reddit) and anything processed by the COG community-reordering
subsystem this framework ships (``parallel/community.py``; ref ``cog.py:31-45``)
— have it; the builder routes edges that violate it to a RESIDUAL edge list
handled by the classic gather kernel, and reports the captured fraction so
callers can decide (``Graph.with_chunked`` uses ``windowed_fraction``).

Layout per chunk c (EB = 512 edge slots = 4 sub-chunks x 128):

* ``row_block[c]``   destination 128-row block (output tile, revisited)
* ``win_block[c]``   which aligned [WIN_ROWS, F] block of x to stream in
* ``sub_off[c, 4]``  each sub-chunk's 128-row sub-window start (window-relative)
* ``src_local[c, e]`` source row, window-relative (-1 on padding)
* ``dst_local[c, e]``, ``weight[c, e]`` as in the classic layout

The fused CUDA kernel this replaces reads X rows directly by column index from
global memory (``/root/reference/dgll/FusedKernel/gcn_fused_kernel.cu:5-74``,
lane-strided nnz loop) — the GPU-native fusion. Streamed windows + MXU one-hot
is the TPU-native equivalent: no per-row addressing anywhere on the hot path.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from dgll_tpu.ops.chunked import R_BLOCK, ChunkedCSR, _target_platform, build_chunked

WIN_ROWS = 512   # x rows streamed per chunk (one aligned block)
SUB = 128        # edges per sub-chunk == sub-window rows (one-hot width)


def _sub_window_off(lo: int) -> int:
    """Sub-window start: clamped into [0, WIN_ROWS-SUB], aligned down to 16
    rows — the bf16 sublane tile (dynamic VMEM slices need tile-aligned starts;
    16 serves both f32 (8) and bf16 (16) windows)."""
    return int(min(max(lo, 0), WIN_ROWS - SUB)) & ~15


@struct.dataclass
class WindowedCSR:
    """Edges packed into [n_chunk, EB] slots with per-chunk x windows."""

    # Metadata is stored PER SUB-CHUNK ([n_sub, n_chunk_meta, SUB]) so every
    # kernel read is a full-lane [1, SUB] row — Mosaic cannot sublane-broadcast
    # a lane-sliced vector (measured: "Invalid input layout" on vector.broadcast)
    src_local: jax.Array   # [n_sub, n_chunk_meta, SUB] int32, window-rel (-1 pad)
    dst_local: jax.Array   # [n_sub, n_chunk_meta, SUB] int32 in [0, R_BLOCK)
    weight: jax.Array      # [n_sub, n_chunk_meta, SUB] float32 (0 on padding)
    row_block: jax.Array   # [n_chunk] int32, non-decreasing
    win_block: jax.Array   # [n_chunk] int32 — x block index for the chunk
    sub_off: jax.Array     # [n_chunk, EB // SUB] int32 sub-window starts
    n_chunk: int = struct.field(pytree_node=False, default=0)
    eb: int = struct.field(pytree_node=False, default=512)
    n_rows: int = struct.field(pytree_node=False, default=0)   # padded to R_BLOCK
    n_cols: int = struct.field(pytree_node=False, default=0)   # padded to WIN_ROWS
    interpret: bool = struct.field(pytree_node=False, default=False)

    @property
    def n_row_blocks(self) -> int:
        return self.n_rows // R_BLOCK

    @property
    def n_sub(self) -> int:
        return self.eb // SUB

    @property
    def n_chunk_meta(self) -> int:
        return self.src_local.shape[1]


def build_windowed(
    src: np.ndarray,
    dst: np.ndarray,
    n_rows: int,
    n_cols: int,
    weight: Optional[np.ndarray] = None,
    eb: int = 512,
    min_fill: float = 0.25,
) -> Tuple[WindowedCSR, Optional[np.ndarray]]:
    """Pack a COO edge list into the windowed layout (host, numpy).

    Edges are grouped by (dst 128-block, src WIN_ROWS-window); groups are cut
    into sub-chunks of <= SUB edges spanning <= SUB source rows; four sub-chunks
    form a chunk. Chunks that would fill below ``min_fill`` give their edges to
    the residual list instead. Returns ``(layout, residual_edge_indices)``
    where the residual indices (into the input arrays) are None if empty.
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    if len(src) and (src.max() >= n_cols or dst.max() >= n_rows):
        # out-of-range ids would become out-of-bounds window DMAs at runtime
        raise ValueError(
            f"edge ids out of range: src<{n_cols}, dst<{n_rows} required "
            f"(got max src {src.max()}, max dst {dst.max()})")
    w = np.ones(len(src), np.float32) if weight is None else np.asarray(weight, np.float32)
    n_sub = eb // SUB

    nb = -(-n_rows // R_BLOCK)
    n_rows_pad = nb * R_BLOCK
    n_cols_pad = max(1, -(-n_cols // WIN_ROWS)) * WIN_ROWS

    # sort edges by (dst block, src window, src) in one pass
    blk = dst // R_BLOCK
    win = src // WIN_ROWS
    order = np.lexsort((src, win, blk))
    so, do, wo = src[order], dst[order], w[order]
    bo, wno = blk[order], win[order]

    # group boundaries: (dst block, window) pairs
    gkey = bo * (n_cols_pad // WIN_ROWS) + wno
    gstart = np.flatnonzero(np.r_[True, gkey[1:] != gkey[:-1]])
    gend = np.r_[gstart[1:], len(so)]

    # --- cut each group into sub-chunks (<= SUB edges, <= SUB row span) ---
    # vectorized pre-filter: tiny groups (the common case on non-clustered
    # graphs — millions of 1-2 edge groups) go residual without touching the
    # python loop at all
    sizes = gend - gstart
    big = sizes >= max(min_fill * SUB, 1.0)
    edge_in_big = np.repeat(big, sizes)
    pre_resid = order[~edge_in_big]

    chunks: list = []      # (blk, win, [list of (i, j) sub-chunk slices])
    resid: list = []
    for gs, ge in zip(gstart[big], gend[big]):
        n_edges = ge - gs
        i = gs
        subs_here = []
        while i < ge:
            j = min(i + SUB, ge)
            off = _sub_window_off(so[i] - wno[i] * WIN_ROWS)
            # shrink until the span fits the 128-row sub-window
            while so[j - 1] - wno[i] * WIN_ROWS - off >= SUB:
                j -= 1
            subs_here.append((i, j))
            i = j
        if n_edges < min_fill * len(subs_here) * SUB:
            resid.append((gs, ge))
            continue
        # groups arrive (dst block, window)-sorted: emit this group's chunks
        for k in range(0, len(subs_here), n_sub):
            chunks.append((int(bo[gs]), int(wno[gs]), subs_here[k:k + n_sub]))
    if not chunks:
        chunks.append((0, 0, []))
    # ensure every row block appears (all-padding chunks write the zeros)
    present = {c[0] for c in chunks}
    for b in range(nb):
        if b not in present:
            chunks.append((b, 0, []))
    chunks.sort(key=lambda c: c[0])

    n_chunk = len(chunks)
    if n_chunk % 2 == 0:   # odd count: same metadata-tile trick as build_chunked
        chunks.append((nb - 1, 0, []))
        n_chunk += 1
    n_meta = ((n_chunk + 7) // 8) * 8

    SL = np.full((n_sub, n_meta, SUB), -1, np.int32)
    DL = np.zeros((n_sub, n_meta, SUB), np.int32)
    W = np.zeros((n_sub, n_meta, SUB), np.float32)
    RB = np.zeros(n_chunk, np.int32)
    WB = np.zeros(n_chunk, np.int32)
    SO = np.zeros((n_chunk, n_sub), np.int32)

    for c, (b, wn, ss) in enumerate(chunks):
        RB[c] = b
        WB[c] = wn
        for k, (i, j) in enumerate(ss):
            m = j - i
            rel = (so[i:j] - wn * WIN_ROWS).astype(np.int64)
            off = _sub_window_off(int(rel[0]))
            SO[c, k] = off
            SL[k, c, :m] = (rel - off).astype(np.int32)
            DL[k, c, :m] = (do[i:j] - b * R_BLOCK).astype(np.int32)
            W[k, c, :m] = wo[i:j]
    RB[len(chunks):] = nb - 1

    resid_idx = None
    parts = ([pre_resid] if len(pre_resid) else []) + [
        order[gs:ge] for gs, ge in resid]
    if parts:
        resid_idx = np.concatenate(parts)

    layout = WindowedCSR(
        src_local=SL, dst_local=DL, weight=W,
        row_block=RB, win_block=WB, sub_off=SO,
        n_chunk=n_chunk, eb=eb, n_rows=n_rows_pad, n_cols=n_cols_pad,
        interpret=_target_platform() != "tpu",
    )
    return layout, resid_idx


@struct.dataclass
class HybridCSR:
    """Windowed layout + (optional) residual classic layout; one SpMM operand.

    ``windowed_fraction`` is the share of edges on the gather-free path.
    """

    win: WindowedCSR
    res: Optional[ChunkedCSR]
    windowed_fraction: float = struct.field(pytree_node=False, default=1.0)


def build_hybrid(
    src: np.ndarray,
    dst: np.ndarray,
    n_rows: int,
    n_cols: int,
    weight: Optional[np.ndarray] = None,
    eb: int = 512,
    min_fill: float = 0.25,
) -> HybridCSR:
    winl, resid_idx = build_windowed(src, dst, n_rows, n_cols, weight, eb, min_fill)
    res = None
    frac = 1.0
    if resid_idx is not None and len(resid_idx):
        w = None if weight is None else np.asarray(weight)[resid_idx]
        res = build_chunked(np.asarray(src)[resid_idx], np.asarray(dst)[resid_idx],
                            n_rows, n_cols, w, eb)
        frac = 1.0 - len(resid_idx) / max(len(np.asarray(src)), 1)
    return HybridCSR(win=winl, res=res, windowed_fraction=float(frac))


def build_hybrid_pair(src, dst, n_rows, n_cols, weight=None, eb=512,
                      min_fill=0.25) -> Tuple[HybridCSR, HybridCSR]:
    """Hybrid layouts for A and A^T (the transpose drives the backward pass)."""
    a = build_hybrid(src, dst, n_rows, n_cols, weight, eb, min_fill)
    at = build_hybrid(dst, src, n_cols, n_rows, weight, eb, min_fill)
    return a, at


def hybrid_to_device(h: HybridCSR, device=None) -> HybridCSR:
    moved = jax.tree.map(
        (lambda x: jax.device_put(x, device)) if device is not None else jnp.asarray,
        h)
    interp = _target_platform(device) != "tpu"
    win = moved.win.replace(interpret=interp)
    res = moved.res.replace(interpret=interp) if moved.res is not None else None
    return moved.replace(win=win, res=res)


def spmm_windowed_xla(c: WindowedCSR, x: jax.Array) -> jax.Array:
    """Pure-XLA oracle of the windowed kernel (CPU path / kernel tests).

    out[rb*R + r] = sum_chunks sum_e w[c,e] * [dst_local[c,e]==r]
                    * x[win_block[c]*WIN + sub_off[c, e//SUB] + src_local[c,e]]
    """
    nc = c.n_chunk
    sl = c.src_local[:, :nc].transpose(1, 0, 2)          # [nc, n_sub, SUB]
    dl = c.dst_local[:, :nc].transpose(1, 0, 2).reshape(nc, c.eb)
    wv = c.weight[:, :nc].transpose(1, 0, 2).reshape(nc, c.eb)
    base = c.win_block[:, None, None] * WIN_ROWS + c.sub_off[:, :, None]
    gidx = jnp.clip(base + sl, 0, x.shape[0] - 1).reshape(nc, c.eb)
    msg = jnp.take(x, gidx.reshape(-1), axis=0).reshape(nc, c.eb, -1)
    valid = sl.reshape(nc, c.eb) >= 0
    w = jnp.where(valid, wv, 0.0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (R_BLOCK, c.eb), 0)
    S = jnp.where(rows[None] == dl[:, None, :], w[:, None, :], 0.0
                  ).astype(x.dtype)
    part = jnp.einsum("cre,ced->crd", S, msg, preferred_element_type=jnp.float32)
    out = jax.ops.segment_sum(part, c.row_block[:nc], num_segments=c.n_row_blocks)
    return out.reshape(c.n_rows, -1).astype(x.dtype)
