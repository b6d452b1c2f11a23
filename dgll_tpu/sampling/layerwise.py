"""Layer-wise importance samplers: FastGCN and LADIES (+ flat / WRS variants).

Parity targets in the reference:

* FastGCN — ``/root/reference/dgll/GPU Accelerator/MQFastGCN.py:60-88``: layer-independent
  probabilities ``p_i ∝ ||L[:, i]||^2`` over the whole graph (one precompute), per layer
  draw ``s`` nodes without replacement, slice ``Q = L[prev, :][:, next]`` and rescale
  columns by ``1/(p_j * s)``.
* LADIES — ``MQLadies.py:62-89``: layer-*dependent* ``p_j ∝ ||L[prev, :][:, j]||^2``
  recomputed from the previous layer's rows.
* ``+flat`` — ``MQFastGCNFlat.py:78``: ``p <- sqrt(p)`` flattening.
* ``+wrs`` — ``MQFastGCNWrs.py:86-95`` / ``utils.py:199-213``: weighted sampling without
  replacement, implemented here as Efraimidis–Spirakis exponential keys (vectorised).
* geometric layer-size growth — ``MQFastGCNFlat.py:30-32``.

Blocks are emitted as static-shape :class:`SparseBlock`s (padded node and edge counts),
outermost first, so the jitted step sees one shape for every batch.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from dgll_tpu.graph import Graph
from dgll_tpu.sampling.base import BaseSampler, HostGraph, SparseBlock


def normalized_laplacian(g: Graph) -> sp.csr_matrix:
    """D^-1/2 (A + I) D^-1/2 as scipy CSR (ref ``utils.py:215-222``); rows = dst."""
    src = np.asarray(g.src)[: g.n_real_edge]
    dst = np.asarray(g.dst)[: g.n_real_edge]
    n = g.n_real_node
    A = sp.coo_matrix((np.ones(len(src), np.float32), (dst, src)), shape=(n, n)).tocsr()
    A = A + sp.eye(n, dtype=np.float32, format="csr")
    A.data = np.minimum(A.data, 1.0)  # dedupe self loops
    d = np.asarray(A.sum(axis=1)).ravel()
    dinv = 1.0 / np.sqrt(np.maximum(d, 1.0))
    D = sp.diags(dinv.astype(np.float32))
    return (D @ A @ D).tocsr()


def geometric_layer_sizes(n_samp: int, growth_rate: float, n_layers: int) -> List[int]:
    """Per-layer sample counts ``n_samp * rate^l`` (ref ``MQFastGCNFlat.py:30-32``),
    outermost (input-side) layer largest."""
    return [max(1, int(round(n_samp * growth_rate**l))) for l in range(n_layers)][::-1]


def _draw_without_replacement(
    p: np.ndarray, s: int, rng: np.random.Generator, wrs: bool
) -> np.ndarray:
    p = np.maximum(p, 0)
    tot = p.sum()
    if tot <= 0:
        p = np.ones_like(p)
        tot = p.sum()
    p = p / tot
    s = min(s, int((p > 0).sum()))
    if wrs:
        # Efraimidis–Spirakis: top-s of u^(1/p) == top-s of log(u)/p
        u = rng.random(p.shape[0])
        keys = np.where(p > 0, np.log(u) / np.maximum(p, 1e-30), -np.inf)
        return np.argpartition(-keys, s - 1)[:s]
    return rng.choice(p.shape[0], size=s, replace=False, p=p)


def _pad_ids(ids: np.ndarray, n: int) -> Tuple[np.ndarray, np.ndarray]:
    out = np.zeros(n, np.int64)
    mask = np.zeros(n, bool)
    k = min(len(ids), n)
    out[:k] = ids[:k]
    mask[:k] = True
    return out, mask


class LayerWiseSampler(BaseSampler):
    """Shared machinery; subclasses define per-layer probabilities."""

    def __init__(
        self,
        lap: sp.csr_matrix,
        layer_sizes: Sequence[int],
        flatten: bool = False,
        wrs: bool = False,
        edges_per_dst: int = 32,
        include_seeds: bool = True,
        seed: int = 0,
    ):
        self.lap = lap.tocsr()
        self.lap_sq = self.lap.multiply(self.lap).tocsr()
        self.layer_sizes = [int(s) for s in layer_sizes]  # outermost first
        self.flatten = flatten
        self.wrs = wrs
        self.edges_per_dst = int(edges_per_dst)
        self.include_seeds = include_seeds
        self._rng = np.random.default_rng(seed)

    # -- subclass hook ------------------------------------------------------
    def _layer_probs(self, prev_nodes: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def sample(
        self, g: Optional[HostGraph], seeds: np.ndarray, pad_to: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray, List[SparseBlock]]:
        seeds = np.asarray(seeds, np.int64)
        b = len(seeds) if pad_to is None else int(pad_to)
        out_ids, out_mask = _pad_ids(seeds, b)

        blocks: List[SparseBlock] = []
        prev_ids, prev_mask = out_ids, out_mask  # dst side of the current (top) layer
        # iterate from the output layer downwards (innermost block first), then reverse
        for s in reversed(self.layer_sizes):
            prev_real = prev_ids[prev_mask]
            p = self._layer_probs(prev_real)
            if self.flatten:
                p = np.sqrt(p)
            cand = _draw_without_replacement(p, s, self._rng, self.wrs)
            if self.include_seeds:
                # Layer protocol: source slot i < n_dst is destination i itself.
                # The previous layer's (padded) dst ids sit at the head of src_ids,
                # then the drawn candidates not already present (reference appends
                # the batch nodes each layer, MQFastGCN.py:81-84; putting them at the
                # head makes x[:n_dst] the self features SAGE/GIN/GAT expect).
                extra = np.setdiff1d(np.unique(cand), prev_real)
                b_prev = prev_ids.shape[0]
                src_ids = np.zeros(b_prev + s, np.int64)
                src_mask = np.zeros(b_prev + s, bool)
                src_ids[:b_prev] = prev_ids
                src_mask[:b_prev] = prev_mask
                k = min(len(extra), s)
                src_ids[b_prev : b_prev + k] = extra[:k]
                src_mask[b_prev : b_prev + k] = True
                self_at_head = True
            else:
                # pure importance sample (unbiased estimator); no self guarantee
                src_ids, src_mask = _pad_ids(np.unique(cand), s)
                self_at_head = False

            # Q = L[prev, :][:, src]; drawn-only columns rescaled by
            # 1/(p_j·s), deterministically-included prev columns kept exact
            # (defensive importance sampling — unbiased with bounded weights).
            # The reference computes the rescale for EVERY kept column but
            # then drops the values when building its DGL block
            # (MQFastGCN.py:82: create_block(..., values=[]) — GraphConv
            # renormalizes), so the naive form never actually trains there;
            # here the weights are real, and rescaling exact-inclusion columns
            # by 1/(s·p_j) >> 1 would blow the loss scale.
            real_src = src_ids[src_mask]
            pfull = p / max(p.sum(), 1e-30)
            Q = self.lap[prev_real][:, real_src].tocoo()
            scale = 1.0 / np.maximum(pfull[real_src[Q.col]] * s, 1e-12)
            if self.include_seeds:
                in_prev = np.isin(real_src[Q.col], prev_real)
                scale = np.where(in_prev, 1.0, scale)
            data = Q.data * scale
            src_pos = np.nonzero(src_mask)[0]  # local slot of each real src column

            blocks.insert(
                0,
                _pack_sparse_block(
                    dst_ids=prev_ids,
                    dst_mask=prev_mask,
                    src_ids=src_ids,
                    src_mask=src_mask,
                    rows=np.nonzero(prev_mask)[0][Q.row],
                    cols=src_pos[Q.col],
                    vals=data.astype(np.float32),
                    n_edge=prev_ids.shape[0] * self.edges_per_dst,
                    self_at_head=self_at_head,
                ),
            )
            prev_ids, prev_mask = src_ids, src_mask

        input_nodes = np.asarray(blocks[0].src_ids, np.int64)
        return input_nodes, out_ids, blocks


def _pack_sparse_block(dst_ids, dst_mask, src_ids, src_mask, rows, cols, vals, n_edge,
                       self_at_head=True):
    ne = len(vals)
    if ne > n_edge:
        # keep the heaviest edges if over budget (importance-weighted truncation)
        keep = np.argpartition(-np.abs(vals), n_edge - 1)[:n_edge]
        rows, cols, vals = rows[keep], cols[keep], vals[keep]
        ne = n_edge
    src_l = np.zeros(n_edge, np.int64)
    dst_l = np.zeros(n_edge, np.int64)
    w = np.zeros(n_edge, np.float32)
    src_l[:ne], dst_l[:ne], w[:ne] = cols, rows, vals
    # host numpy leaves by design — see NeighborSampler.sample
    return SparseBlock(
        dst_ids=dst_ids.astype(np.int32),
        src_ids=src_ids.astype(np.int32),
        src=src_l.astype(np.int32),
        dst=dst_l.astype(np.int32),
        edge_weight=w,
        dst_mask=dst_mask,
        src_mask=src_mask,
        n_dst=int(dst_ids.shape[0]),
        n_src=int(src_ids.shape[0]),
        n_edge=int(n_edge),
        self_at_head=bool(self_at_head),
    )


class FastGCNSampler(LayerWiseSampler):
    """Layer-independent importance sampling (ref ``MQFastGCN.py:60-88``)."""

    def __init__(self, lap: sp.csr_matrix, layer_sizes, **kw):
        super().__init__(lap, layer_sizes, **kw)
        self._global_p = np.asarray(self.lap_sq.sum(axis=0)).ravel()  # ||L[:, i]||^2

    def _layer_probs(self, prev_nodes: np.ndarray) -> np.ndarray:
        return self._global_p.copy()


class LadiesSampler(LayerWiseSampler):
    """Layer-dependent importance sampling (ref ``MQLadies.py:62-89``)."""

    def _layer_probs(self, prev_nodes: np.ndarray) -> np.ndarray:
        return np.asarray(self.lap_sq[prev_nodes].sum(axis=0)).ravel()
