"""Misc data utilities — parity with ``dgll/nn/utils/utils.py`` leftovers:

* ``multihop_sampling`` (``utils.py:52-82``): fixed-fanout multi-hop id expansion
  (with replacement), returning per-hop id arrays — the raw-array cousin of
  ``NeighborSampler`` for code that wants id lists, not blocks.
* ``separate_data`` (``utils.py:387``): stratified k-fold split for graph
  classification.
* ``create_khop_index`` (``load_khop``/``createIndex``, ``utils.py:84-145``):
  dense k-hop neighbour index tables.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from dgll_tpu.sampling.base import HostGraph


def multihop_sampling(
    hg: HostGraph, seeds: Sequence[int], fanouts: Sequence[int], seed: int = 0
) -> List[np.ndarray]:
    """[seeds, hop1 ids, hop2 ids, ...] with hop k of size len(prev) * fanout_k."""
    from dgll_tpu import native

    rng = np.random.default_rng(seed)
    out = [np.asarray(seeds, np.int64)]
    for k in fanouts:
        prev = out[-1]
        sampled, _ = native.sample_neighbors(
            hg.indptr, hg.src, prev, np.ones(len(prev), bool), k,
            int(rng.integers(0, 2**63 - 1)),
        )
        out.append(sampled.reshape(-1))
    return out


def create_khop_index(
    hg: HostGraph, k: int, max_neighbors: int, seed: int = 0
) -> np.ndarray:
    """[n_node, max_neighbors] dense index of sampled k-hop neighbours (replacement),
    the static-shape twin of the reference's k-hop index tables."""
    from dgll_tpu import native

    rng = np.random.default_rng(seed)
    idx = np.arange(hg.n_node, dtype=np.int64)
    for _ in range(k):
        sampled, _ = native.sample_neighbors(
            hg.indptr, hg.src, idx.reshape(-1), np.ones(idx.size, bool), 1,
            int(rng.integers(0, 2**63 - 1)),
        )
        idx = sampled.reshape(-1)
    full, _ = native.sample_neighbors(
        hg.indptr, hg.src, np.arange(hg.n_node), np.ones(hg.n_node, bool),
        max_neighbors, seed,
    )
    return full


def separate_data(
    labels: Sequence[int], n_folds: int = 10, fold_idx: int = 0, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Stratified k-fold (train_idx, test_idx) — ref ``separate_data`` (sklearn
    StratifiedKFold there; self-contained here)."""
    labels = np.asarray(labels)
    rng = np.random.default_rng(seed)
    folds: List[List[int]] = [[] for _ in range(n_folds)]
    for c in np.unique(labels):
        members = np.nonzero(labels == c)[0]
        rng.shuffle(members)
        for i, m in enumerate(members):
            folds[i % n_folds].append(int(m))
    test = np.asarray(sorted(folds[fold_idx % n_folds]), np.int64)
    train = np.asarray(sorted(set(range(len(labels))) - set(test)), np.int64)
    return train, test
