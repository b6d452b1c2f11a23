"""Locality manufacturing: node reordering that feeds the window-fused SpMM.

The gather-free windowed kernel (``ops/windowed.py`` + ``ops/pallas/
spmm_windowed.py``) needs *source locality*: a destination 128-row block's
sources must cluster into few aligned 512-row windows. Clustered graphs have
it natively; real power-law graphs (products/reddit-like) usually have the
structure but not in id space. This module recovers it by relabeling — the
reference's own preprocessing thesis (COG community reordering,
``/root/reference/dgll/GPU Accelerator/cog.py:31-45,107-254``) applied to our
kernel's layout:

* :func:`estimate_windowed_fraction` — cheap (two lexsort passes, no layout
  build) upper-bound estimate of the edge fraction the windowed builder would
  capture; used to decide whether to reorder and which ordering wins.
* orderings: ``community`` (label-propagation + contiguous relabel — the COG
  pipeline, ``parallel/community.py``), ``rcm`` (reverse Cuthill-McKee
  bandwidth minimisation over the symmetrised adjacency — the classic
  community-free fallback), ``degree`` (out-degree descending — concentrates
  hub sources into the first windows).
* :func:`reorder_for_locality` — try the orderings, score each with the
  estimator, return the best permuted :class:`Graph` (or the original when
  nothing helps — a uniform-random graph is an expander and no ordering can
  manufacture locality; the classic gather kernel is the right program there).

``Graph.with_windowed(reorder=True)`` composes this automatically; the CLI
full-batch path enables it on TPU. Training on the permuted graph is exact
(features/labels/masks ride the same permutation); ``Graph.node_perm`` maps
new id -> original id for callers that need to emit per-node outputs.
"""
from __future__ import annotations

import time
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from dgll_tpu.graph import Graph
from dgll_tpu.ops.windowed import SUB, WIN_ROWS
from dgll_tpu.ops.chunked import R_BLOCK


def estimate_windowed_fraction(
    src: np.ndarray,
    dst: np.ndarray,
    min_fill: float = 0.25,
) -> float:
    """Upper-bound estimate of ``build_windowed``'s captured edge fraction.

    Groups edges by (dst 128-block, src 512-window) and counts the edges in
    groups of size >= ``min_fill * SUB`` — the builder's vectorised residual
    pre-filter (``ops/windowed.py:build_windowed``). The true captured
    fraction is slightly lower (sub-chunk fill/row-span cuts) but tracks this
    tightly; it is exact about what matters — whether locality exists at all.
    """
    if len(src) == 0:
        return 1.0
    key = (dst.astype(np.int64) // R_BLOCK) * (1 << 32) + src.astype(np.int64) // WIN_ROWS
    _, counts = np.unique(key, return_counts=True)
    big = counts >= max(min_fill * SUB, 1.0)
    return float(counts[big].sum() / len(src))


# ------------------------------------------------------------------ orderings
def degree_order(g: Graph) -> np.ndarray:
    """Out-degree-descending order: hub sources pack into the first windows."""
    return np.argsort(-g.out_degrees_np()[: g.n_real_node], kind="stable")


def rcm_order(g: Graph) -> np.ndarray:
    """Reverse Cuthill-McKee over A + A^T (bandwidth minimisation).

    Low bandwidth == every dst block's sources sit in a narrow id band ==
    few windows per block. scipy's implementation is C-speed."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    n = g.n_real_node
    s = np.asarray(g.src)[: g.n_real_edge]
    d = np.asarray(g.dst)[: g.n_real_edge]
    ones = np.ones(len(s), np.int8)
    A = sp.coo_matrix((ones, (d, s)), shape=(n, n)).tocsr()
    perm = reverse_cuthill_mckee(A + A.T, symmetric_mode=True)
    return np.asarray(perm, np.int64)


def community_order(g: Graph, seed: int = 0) -> np.ndarray:
    """COG ordering: label-propagation communities, members contiguous
    (``cog.py:31-45`` relabel semantics), communities in id order."""
    from dgll_tpu.parallel.community import detect_communities, merge_groups

    part = detect_communities(g, seed=seed)
    # merge tiny communities so window-sized groups exist (ref merge_groups)
    part = merge_groups(part, min_size=min(WIN_ROWS, g.n_real_node))
    return np.argsort(part, kind="stable")


def permute_graph(g: Graph, order: np.ndarray) -> Graph:
    """Relabel so new node ``i`` is old node ``order[i]`` (features/labels/
    masks/edges all permuted; edge weights preserved). Shared machinery with
    COG's ``relabel_communities``."""
    from dgll_tpu import native

    n = g.n_real_node
    order = np.asarray(order, np.int64)
    new_id = np.empty(n, np.int64)
    new_id[order] = np.arange(n)

    src = native.remap(new_id, np.asarray(g.src)[: g.n_real_edge].astype(np.int64))
    dst = native.remap(new_id, np.asarray(g.dst)[: g.n_real_edge].astype(np.int64))
    ew = None if g.edge_weight is None else np.asarray(g.edge_weight)[: g.n_real_edge]

    def _perm(x):
        return None if x is None else np.asarray(x)[:n][order]

    g2 = Graph.from_edges(
        src, dst, n,
        edge_weight=ew,
        node_feat=_perm(g.node_feat),
        labels=_perm(g.labels),
        train_mask=_perm(g.train_mask),
        val_mask=_perm(g.val_mask),
        test_mask=_perm(g.test_mask),
    )
    base = g.node_perm  # compose with an earlier reorder if present
    perm = order if base is None else np.asarray(base)[order]
    return g2.replace(node_perm=perm)


def reorder_for_locality(
    g: Graph,
    methods: Sequence[str] = ("community", "rcm", "degree"),
    min_fill: float = 0.25,
    min_fraction: Optional[float] = None,
    early_stop_fraction: float = 0.85,
    seed: int = 0,
) -> Tuple[Graph, Dict[str, float]]:
    """Pick the ordering that maximises the windowed capture estimate.

    Returns ``(graph, info)`` where ``info`` records per-method estimates and
    phase seconds (the reference's COG persists the same style of timing CSV,
    ``cog.py:250-253``). The original graph is returned when no ordering beats
    the as-is estimate — honest negative for expander-like graphs — or, with
    ``min_fraction`` set, when the best estimate stays below it (the permute
    would be wasted work: the layout builder would decline anyway). Orderings
    are tried in sequence and stop early once one clears
    ``early_stop_fraction`` (RCM over A+A^T is the expensive fallback — no
    point running it when community ordering already captured the graph).
    """
    src = np.asarray(g.src)[: g.n_real_edge].astype(np.int64)
    dst = np.asarray(g.dst)[: g.n_real_edge].astype(np.int64)
    t0 = time.perf_counter()
    base = estimate_windowed_fraction(src, dst, min_fill)
    info: Dict[str, float] = {"estimate_identity": base}

    best_name, best_frac, best_order = "identity", base, None
    for name in methods:
        t1 = time.perf_counter()
        if name == "community":
            order = community_order(g, seed=seed)
        elif name == "rcm":
            order = rcm_order(g)
        elif name == "degree":
            order = degree_order(g)
        else:
            raise ValueError(f"unknown reorder method {name!r}")
        new_id = np.empty(g.n_real_node, np.int64)
        new_id[order] = np.arange(g.n_real_node)
        frac = estimate_windowed_fraction(new_id[src], new_id[dst], min_fill)
        info[f"estimate_{name}"] = frac
        info[f"order_{name}_s"] = time.perf_counter() - t1
        if frac > best_frac + 1e-3:
            best_name, best_frac, best_order = name, frac, order
        if best_frac >= early_stop_fraction:
            break

    info["chosen"] = best_name  # type: ignore[assignment]
    info["estimate_chosen"] = best_frac
    if min_fraction is not None and best_frac < min_fraction:
        info["chosen"] = "identity"  # type: ignore[assignment]
        info["declined"] = True  # type: ignore[assignment]
        info["total_s"] = time.perf_counter() - t0
        return g, info
    if best_order is not None:
        t1 = time.perf_counter()
        g = permute_graph(g, best_order)
        info["permute_s"] = time.perf_counter() - t1
    info["total_s"] = time.perf_counter() - t0
    return g, info
