"""Graph/feature normalisation utilities.

Math mirrors the reference: symmetric GCN normalisation ``D^-1/2 (A+I) D^-1/2``
(``/root/reference/dgll/FusedKernel/train_gcn.py:63-78`` and
``GPU Accelerator/utils.py:215-222``), row-normalisation of adjacency/features
(``dgll/nn/utils/utils.py:240-249``).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dgll_tpu.graph import Graph


def gcn_normalize(g: Graph, add_self_loops: bool = True) -> Graph:
    """Set edge weights to the symmetric GCN normalisation D^-1/2 (A [+ I]) D^-1/2.

    Degrees count only real edges; padded edges keep weight 0. Host-side (numpy) —
    run once at load time, like the reference's CSR prep.
    """
    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    real = np.arange(g.n_edge) < g.n_real_edge

    if add_self_loops:
        has_loop = np.zeros(g.n_node, bool)
        has_loop[dst[real & (src == dst)]] = True
        need = np.nonzero(~has_loop[: g.n_real_node])[0]
        if need.size:
            raise ValueError(
                "gcn_normalize(add_self_loops=True) on a graph without self-loops: "
                "build with Graph.from_edges(..., add_self_loops=True) so shapes stay static."
            )

    deg = np.zeros(g.n_node, np.float64)
    np.add.at(deg, dst[real], 1.0)
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1.0))
    w = np.where(real, dinv[dst] * dinv[src], 0.0).astype(np.float32)
    return g.replace(edge_weight=w)  # host numpy; .to_device() moves it


def row_normalize_adj(g: Graph) -> Graph:
    """Set edge weights to D^-1 A (random-walk normalisation)."""
    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    real = np.arange(g.n_edge) < g.n_real_edge
    deg = np.zeros(g.n_node, np.float64)
    np.add.at(deg, dst[real], 1.0)
    w = np.where(real, 1.0 / np.maximum(deg[dst], 1.0), 0.0).astype(np.float32)
    return g.replace(edge_weight=w)  # host numpy; .to_device() moves it


def row_normalize_features(x: np.ndarray) -> np.ndarray:
    """Row-normalise a feature matrix (ref ``dgll/nn/utils/utils.py:240-249``)."""
    x = np.asarray(x, np.float32)
    s = x.sum(axis=1, keepdims=True)
    return x / np.maximum(s, 1e-12)


def precompute_neighbor_features(g: Graph, kind: str = "mean") -> np.ndarray:
    """Offline neighbour-feature aggregation — the reference's ``preprocess`` mode
    (``FeatureCache/gs.py:43-56``: a precomputed 'neigh' field replaces the
    outermost sampled hop, so training needs one hop less per batch).

    Returns the aggregated [n_real_node, d] matrix (host numpy); concatenate with
    the raw features and drop the outermost fanout at the call site.
    """
    n = g.n_real_node
    src = np.asarray(g.src)[: g.n_real_edge]
    dst = np.asarray(g.dst)[: g.n_real_edge]
    x = np.asarray(g.node_feat, np.float32)[:n]
    agg = np.zeros((n, x.shape[1]), np.float32)
    np.add.at(agg, dst, x[src])
    if kind == "mean":
        deg = np.bincount(dst, minlength=n).astype(np.float32)
        agg /= np.maximum(deg, 1.0)[:, None]
    elif kind != "sum":
        raise ValueError(f"unknown aggregation {kind!r}")
    return agg
