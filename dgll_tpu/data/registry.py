"""Named-dataset registry — parity with the reference's loader multiplexer
(``/root/reference/dgll/GPU Accelerator/load_data.py`` + ``utils.py:116-196``:
cora/citeseer/pubmed/reddit/ogbn-arxiv/ogbn-products/ogbn-proteins via DGL/OGB
constructors).

This environment has zero egress, so remote-download constructors are injectable:
``load_dataset(name, loader=...)`` takes the constructor as a parameter (and the
tests mock it — the same strategy as the reference's ``unittest_dataset.py:9-91``,
which patches the DGL/OGB constructors). On a connected machine, pass
``loader=make_ogb_loader(...)`` or any callable returning ``(src, dst, feats,
labels, splits)``.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np

from dgll_tpu.graph import Graph

# name -> canonical metric + expected loader kind (reference utils.py:60-91)
DATASETS: Dict[str, dict] = {
    "cora": {"metric": "acc", "kind": "planetoid"},
    "citeseer": {"metric": "acc", "kind": "planetoid"},
    "pubmed": {"metric": "acc", "kind": "planetoid"},
    "reddit": {"metric": "f1", "kind": "dgl"},
    "ogbn-arxiv": {"metric": "acc", "kind": "ogb"},
    "ogbn-products": {"metric": "acc", "kind": "ogb"},
    "ogbn-proteins": {"metric": "roc-auc", "kind": "ogb"},
    "ppi": {"metric": "f1", "kind": "ppi"},
}


def load_dataset(
    name: str,
    loader: Optional[Callable] = None,
    add_self_loops: bool = True,
    make_bidirected: bool = True,
) -> Graph:
    """Build a Graph for a named dataset.

    ``loader()`` must return ``(src, dst, feats, labels, splits)`` where splits is a
    dict with 'train'/'valid'/'test' index arrays. Reverse-edge and self-loop
    handling matches the reference loaders (``utils.py:116-196``).
    """
    if name not in DATASETS:
        raise KeyError(f"unknown dataset {name!r}; known: {sorted(DATASETS)}")
    if loader is None:
        raise RuntimeError(
            f"dataset {name!r} needs a loader callable (no network access here); "
            "pass loader=... returning (src, dst, feats, labels, splits)"
        )
    src, dst, feats, labels, splits = loader()
    n = feats.shape[0]
    masks = {}
    for k in ("train", "valid", "test"):
        m = np.zeros(n, bool)
        m[np.asarray(splits[k])] = True
        masks[k] = m
    return Graph.from_edges(
        src, dst, n,
        node_feat=np.asarray(feats, np.float32),
        labels=np.asarray(labels),
        train_mask=masks["train"],
        val_mask=masks["valid"],
        test_mask=masks["test"],
        add_self_loops=add_self_loops,
        make_bidirected=make_bidirected,
    )


def dataset_metric(name: str) -> str:
    """Canonical eval metric for a dataset (``record_result_new``, utils.py:60-91)."""
    return DATASETS[name]["metric"]
