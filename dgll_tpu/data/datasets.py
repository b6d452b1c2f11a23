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

    Stand-in for the reference's graph-classification datasets (``load_dataP``).
    Returns host-side numpy tuples; batch with ``dgll_tpu.nn.pooling.batch_graphs``.
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
