"""Dataset loaders and synthetic graph generators.

Format-parity loaders for the reference's data paths:

* Planetoid/cora ``.content`` + ``.cites`` text format
  (``/root/reference/dgll/nn/utils/utils.py:146-185``).
* PPI ``{split}_graph.json`` (networkx node-link) + ``.npy`` feats/labels/graph-ids
  (``/root/reference/Evaluation/PPI/ppi_dataloader.py:10-81``).
* Graph-classification text format (``load_dataP`` / ``S2VGraph``,
  ``dgll/nn/utils/utils.py:187-238,387-...``).

The reference snapshot is missing its data blobs (``.MISSING_LARGE_BLOBS``), and this
environment has zero egress, so tests and benchmarks run on the synthetic generators
below (power-law and SBM graphs with planted community labels), which reproduce the
*shape* of reddit/ogbn-products-style workloads.
"""
from __future__ import annotations

import json
import os
import pickle
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from dgll_tpu.graph import Graph
from dgll_tpu.data.transforms import row_normalize_features


# ----------------------------------------------------------------- synthetic
def synthetic_classification_graph(
    n_node: int = 2708,
    avg_degree: int = 4,
    n_class: int = 7,
    feat_dim: int = 64,
    power_law: float = 0.0,
    homophily: float = 0.8,
    seed: int = 0,
    train_frac: float = 0.1,
    val_frac: float = 0.2,
    feat_noise: float = 1.0,
) -> Graph:
    """SBM-flavoured node-classification graph with class-informative features.

    ``power_law > 0`` skews the degree distribution (prob ∝ (rank+1)^-power_law),
    reproducing the load-imbalance that the reference's samplers/caches target.
    A 2-layer GCN reaches high accuracy when ``homophily`` is high — used by the
    accuracy-parity tests in place of the missing cora/PPI blobs.
    """
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_class, size=n_node)

    n_edge = n_node * avg_degree
    if power_law > 0:
        p = (np.arange(n_node, dtype=np.float64) + 1.0) ** (-power_law)
        p /= p.sum()
        dst = rng.choice(n_node, size=n_edge, p=p)
    else:
        dst = rng.integers(0, n_node, size=n_edge)

    # homophilous wiring: with prob `homophily` pick src from same class
    same = rng.random(n_edge) < homophily
    # per-class node pools
    order = np.argsort(labels, kind="stable")
    sorted_labels = labels[order]
    class_start = np.searchsorted(sorted_labels, np.arange(n_class))
    class_end = np.searchsorted(sorted_labels, np.arange(n_class), side="right")
    cls = labels[dst]
    lo, hi = class_start[cls], class_end[cls]
    same_src = order[(lo + (rng.random(n_edge) * np.maximum(hi - lo, 1)).astype(np.int64)) % n_node]
    rand_src = rng.integers(0, n_node, size=n_edge)
    src = np.where(same, same_src, rand_src)

    # class-mean features + noise
    means = rng.normal(0, 1, size=(n_class, feat_dim))
    feats = means[labels] + feat_noise * rng.normal(0, 1, size=(n_node, feat_dim))

    perm = rng.permutation(n_node)
    n_tr = int(train_frac * n_node)
    n_va = int(val_frac * n_node)
    train_mask = np.zeros(n_node, bool)
    val_mask = np.zeros(n_node, bool)
    test_mask = np.zeros(n_node, bool)
    train_mask[perm[:n_tr]] = True
    val_mask[perm[n_tr : n_tr + n_va]] = True
    test_mask[perm[n_tr + n_va :]] = True

    return Graph.from_edges(
        src,
        dst,
        n_node,
        node_feat=feats.astype(np.float32),
        labels=labels.astype(np.int32),
        train_mask=train_mask,
        val_mask=val_mask,
        test_mask=test_mask,
        make_bidirected=True,
        add_self_loops=True,
    )


def synthetic_power_law_graph(
    n_node: int, avg_degree: int, alpha: float = 1.0, seed: int = 0, feat_dim: int = 0
) -> Graph:
    """Raw power-law COO graph for kernel benchmarking (no labels)."""
    rng = np.random.default_rng(seed)
    n_edge = n_node * avg_degree
    p = (np.arange(n_node, dtype=np.float64) + 1.0) ** (-alpha)
    p /= p.sum()
    dst = rng.choice(n_node, size=n_edge, p=p)
    src = rng.integers(0, n_node, size=n_edge)
    feats = (
        rng.normal(0, 1, size=(n_node, feat_dim)).astype(np.float32) if feat_dim else None
    )
    return Graph.from_edges(src, dst, n_node, node_feat=feats)


def synthetic_graph_classification(
    n_graph: int = 128,
    n_node_range: Tuple[int, int] = (10, 40),
    n_class: int = 2,
    feat_dim: int = 8,
    seed: int = 0,
):
    """List of (src, dst, feats, label) small graphs where label ~ edge density.

    Synthetic stand-in for real graph-classification data (real files load via
    ``load_dataP`` below). Returns host-side numpy tuples; batch with
    ``dgll_tpu.nn.pooling.batch_graphs``.
    """
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_graph):
        n = int(rng.integers(*n_node_range))
        label = int(rng.integers(0, n_class))
        # density tied to label so the task is learnable
        p = 0.15 + 0.5 * label / max(n_class - 1, 1)
        m = np.maximum((rng.random((n, n)) < p), np.eye(n, dtype=bool))
        src, dst = np.nonzero(m)
        feats = rng.normal(0, 1, size=(n, feat_dim)).astype(np.float32)
        feats[:, 0] = 0.1 * (m.sum(0) - 1)  # degree feature
        out.append((src.astype(np.int64), dst.astype(np.int64), feats, label))
    return out


# ---------------------------------------------------- graph classification txt
@dataclass
class S2VGraph:
    """One graph of the GIN text format — parity with the reference's ``S2VGraph``
    (``dgll/nn/utils/utils.py:267-284``): bidirected edge list, per-node tags
    (optionally replaced by degrees), optional float node attributes, integer label."""

    src: np.ndarray                  # [e] int64 (bidirected, like the ref edge_mat)
    dst: np.ndarray                  # [e] int64
    node_tags: List[int]
    label: int
    n_node: int
    node_features: Optional[np.ndarray] = None   # [n, d] float32 attrs (or None)
    neighbors: Optional[List[List[int]]] = None
    max_neighbor: int = 0


def load_dataP(path: str, degree_as_tag: bool = False) -> Tuple[List[S2VGraph], int]:
    """Parse the graph-classification text format (ref ``load_dataP``,
    ``dgll/nn/utils/utils.py:286-385``).

    Format: first line = #graphs; per graph a header ``n label`` then ``n`` node rows
    ``tag deg nbr_0 ... nbr_{deg-1} [attr...]`` (float attrs optional). Labels and tags
    are densely re-mapped in first-seen order, exactly like the reference's
    ``label_dict`` / ``feat_dict``. Returns ``(graphs, n_classes)``.
    """
    g_list: List[S2VGraph] = []
    label_dict: dict = {}
    feat_dict: dict = {}

    with open(path) as f:
        n_g = int(f.readline().strip())
        for _ in range(n_g):
            n, l = (int(w) for w in f.readline().strip().split())
            if l not in label_dict:
                label_dict[l] = len(label_dict)
            tags: List[int] = []
            attrs: List[np.ndarray] = []
            src, dst = [], []
            for j in range(n):
                row = f.readline().strip().split()
                deg = int(row[1])
                head = [int(w) for w in row[: deg + 2]]
                if len(row) > deg + 2:
                    attrs.append(np.array([float(w) for w in row[deg + 2 :]]))
                tag = head[0]
                if tag not in feat_dict:
                    feat_dict[tag] = len(feat_dict)
                tags.append(feat_dict[tag])
                for k in head[2:]:
                    src.append(j)
                    dst.append(k)
            if attrs and len(attrs) != n:
                raise ValueError(
                    f"graph with {n} nodes has float attrs on only {len(attrs)} "
                    "node rows — the format requires all or none"
                )
            # dedupe undirected pairs (the ref builds an nx.Graph, which dedupes),
            # then bidirect (ref extends edges with the reversed pairs)
            und = sorted({(min(a, b), max(a, b)) for a, b in zip(src, dst)})
            u = [a for a, _ in und]
            v = [b for _, b in und]
            s = np.array(u + v, np.int64)
            d = np.array(v + u, np.int64)
            neighbors: List[List[int]] = [[] for _ in range(n)]
            for a, b in und:
                neighbors[a].append(b)
                neighbors[b].append(a)
            g_list.append(
                S2VGraph(
                    src=s,
                    dst=d,
                    node_tags=tags,
                    label=label_dict[l],
                    n_node=n,
                    node_features=np.stack(attrs).astype(np.float32) if attrs else None,
                    neighbors=neighbors,
                    max_neighbor=max((len(x) for x in neighbors), default=0),
                )
            )

    if degree_as_tag:
        degset: dict = {}
        for g in g_list:
            degs = [len(x) for x in g.neighbors]
            for dg in degs:
                if dg not in degset:
                    degset[dg] = len(degset)
            g.node_tags = [degset[dg] for dg in degs]
        n_tag = len(degset)
    else:
        n_tag = len(feat_dict)

    # one-hot tag features where no attrs exist (the ref GIN driver's convention)
    for g in g_list:
        if g.node_features is None:
            oh = np.zeros((g.n_node, n_tag), np.float32)
            oh[np.arange(g.n_node), np.asarray(g.node_tags)] = 1.0
            g.node_features = oh
    return g_list, len(label_dict)


def s2v_to_tuples(g_list: List[S2VGraph]):
    """(src, dst, feats, label) quadruples for ``dgll_tpu.nn.pooling.batch_graphs``."""
    return [(g.src, g.dst, g.node_features, g.label) for g in g_list]


def separate_graphs(graph_list: List[S2VGraph], seed: int, fold_idx: int,
                    n_splits: int = 10) -> Tuple[List[S2VGraph], List[S2VGraph]]:
    """Stratified k-fold split over graphs (ref ``separate_data``, ``utils.py:387-399``);
    fold machinery shared with ``dgll_tpu.data.utils.separate_data``."""
    from dgll_tpu.data.utils import separate_data

    train_idx, test_idx = separate_data(
        [g.label for g in graph_list], n_folds=n_splits, fold_idx=fold_idx, seed=seed
    )
    return [graph_list[i] for i in train_idx], [graph_list[i] for i in test_idx]


# ------------------------------------------------------------------ planetoid
def load_planetoid(path: str, dataset: str = "cora") -> Graph:
    """Load cora-style ``<dataset>.content`` / ``<dataset>.cites`` files.

    Format parity with ``load_data`` (``dgll/nn/utils/utils.py:146-185``): content rows
    are ``<id> <feat...> <label-str>``; cites rows are ``<cited> <citing>``. Features are
    row-normalised; standard planetoid splits (140 train / 500 val / 1000 test).
    """
    content = np.genfromtxt(os.path.join(path, f"{dataset}.content"), dtype=np.dtype(str))
    ids = content[:, 0]
    feats = row_normalize_features(content[:, 1:-1].astype(np.float32))
    label_strs = content[:, -1]
    classes = sorted(set(label_strs))
    labels = np.array([classes.index(c) for c in label_strs], np.int32)

    idx_map = {j: i for i, j in enumerate(ids)}
    cites = np.genfromtxt(os.path.join(path, f"{dataset}.cites"), dtype=np.dtype(str))
    cites = cites.reshape(-1, 2)  # a single-edge file parses as 1-D
    edges = np.array(
        [(idx_map[a], idx_map[b]) for a, b in cites if a in idx_map and b in idx_map],
        np.int64,
    )
    n = len(ids)
    train_mask = np.zeros(n, bool)
    val_mask = np.zeros(n, bool)
    test_mask = np.zeros(n, bool)
    train_mask[:140] = True
    val_mask[200:700] = True
    test_mask[500:1500] = True
    return Graph.from_edges(
        edges[:, 0],
        edges[:, 1],
        n,
        node_feat=feats,
        labels=labels,
        train_mask=train_mask,
        val_mask=val_mask,
        test_mask=test_mask,
        make_bidirected=True,
        add_self_loops=True,
    )


# ------------------------------------------------------------------------ PPI
def load_ppi_split(path: str, split: str = "train") -> List[Graph]:
    """Load a PPI split from ``{split}_graph.json`` + ``{split}_feats/labels/graph_id.npy``.

    Format parity with ``Evaluation/PPI/ppi_dataloader.py:10-81``: the json is a
    networkx node-link dump covering all graphs in the split; ``graph_id`` assigns nodes
    to graphs; returns one Graph per graph id with multilabel targets.
    """
    with open(os.path.join(path, f"{split}_graph.json")) as f:
        gdata = json.load(f)
    feats = np.load(os.path.join(path, f"{split}_feats.npy"))
    labels = np.load(os.path.join(path, f"{split}_labels.npy"))
    graph_id = np.load(os.path.join(path, f"{split}_graph_id.npy"))

    links = np.array([(l["source"], l["target"]) for l in gdata["links"]], np.int64)
    graphs = []
    for gid in np.unique(graph_id):
        nodes = np.nonzero(graph_id == gid)[0]
        lo, hi = nodes.min(), nodes.max()
        m = (links[:, 0] >= lo) & (links[:, 0] <= hi)
        e = links[m] - lo
        graphs.append(
            Graph.from_edges(
                e[:, 0],
                e[:, 1],
                hi - lo + 1,
                node_feat=feats[lo : hi + 1].astype(np.float32),
                labels=labels[lo : hi + 1].astype(np.float32),
                make_bidirected=True,
                add_self_loops=True,
            )
        )
    return graphs


# ------------------------------------------------------------- pickled graphs
def save_graph(g: Graph, path: str) -> None:
    """Persist a Graph (host numpy pickle — parity with DGraph pickling, ``example.py:17``)."""
    state = {
        "src": np.asarray(g.src),
        "dst": np.asarray(g.dst),
        "n_node": g.n_real_node,
        "edge_weight": None if g.edge_weight is None else np.asarray(g.edge_weight),
        "node_feat": None if g.node_feat is None else np.asarray(g.node_feat),
        "labels": None if g.labels is None else np.asarray(g.labels),
        "train_mask": None if g.train_mask is None else np.asarray(g.train_mask),
        "val_mask": None if g.val_mask is None else np.asarray(g.val_mask),
        "test_mask": None if g.test_mask is None else np.asarray(g.test_mask),
    }
    with open(path, "wb") as f:
        pickle.dump(state, f)


def load_graph(path: str) -> Graph:
    with open(path, "rb") as f:
        s = pickle.load(f)
    return Graph.from_edges(
        s["src"],
        s["dst"],
        s["n_node"],
        edge_weight=s["edge_weight"],
        node_feat=s["node_feat"],
        labels=s["labels"],
        train_mask=s["train_mask"],
        val_mask=s["val_mask"],
        test_mask=s["test_mask"],
    )
