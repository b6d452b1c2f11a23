"""Embedding subsystem: walks validity, skip-gram learning, classifier downstream."""
import numpy as np
import pytest

from dgll_tpu.data import synthetic_classification_graph
from dgll_tpu.embedding import (
    DeepWalk,
    SkipGramModel,
    WalkGraph,
    deepwalk_walks,
    node2vec_walks,
    struc2vec_walks,
    train_classifier,
    walk_pairs,
)


@pytest.fixture(scope="module")
def g():
    return synthetic_classification_graph(n_node=120, avg_degree=6, n_class=3,
                                          feat_dim=8, homophily=0.9, seed=0)


@pytest.fixture(scope="module")
def wg(g):
    return WalkGraph.from_graph(g)


def _walks_are_paths(wg, walks, n_check=50):
    rng = np.random.default_rng(0)
    idx = rng.integers(0, len(walks), n_check)
    for i in idx:
        for t in range(walks.shape[1] - 1):
            u, v = walks[i, t], walks[i, t + 1]
            if u == v:
                continue  # zero-degree self-loop convention
            nbrs = wg.nbrs[wg.indptr[u] : wg.indptr[u + 1]]
            assert v in nbrs, (u, v)


def test_deepwalk_walks_are_paths(wg):
    walks = deepwalk_walks(wg, num_walks=2, walk_length=10, seed=0)
    assert walks.shape == (2 * wg.n_node, 10)
    _walks_are_paths(wg, walks)


def test_node2vec_walks_are_paths(wg):
    walks = node2vec_walks(wg, num_walks=1, walk_length=8, p=0.5, q=2.0, seed=0)
    assert walks.shape == (wg.n_node, 8)
    _walks_are_paths(wg, walks)


def test_struc2vec_walks_shapes(wg):
    walks = struc2vec_walks(wg, num_walks=1, walk_length=6, k_hops=1, n_similar=5,
                            seed=0)
    assert walks.shape == (wg.n_node, 6)
    assert walks.min() >= 0 and walks.max() < wg.n_node


def test_walk_pairs_window():
    walks = np.array([[0, 1, 2, 3]])
    pairs = walk_pairs(walks, window=1, rng=np.random.default_rng(0))
    s = {tuple(p) for p in pairs}
    assert s == {(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2)}


def test_skipgram_learns_communities(g, wg):
    """Embeddings from homophilous walks should classify labels well above chance."""
    walks = deepwalk_walks(wg, num_walks=8, walk_length=16, seed=0)
    pairs = walk_pairs(walks, window=3, rng=np.random.default_rng(0))
    m = SkipGramModel(wg.n_node, dim=32, lr=5e-2, seed=0)
    m.train(pairs, epochs=3, batch_size=4096)
    labels = np.asarray(g.labels)[: wg.n_node]
    acc, _ = train_classifier(m.embeddings, labels, "logistic", seed=0)
    assert acc > 0.55, acc  # 3 classes -> chance ~0.33


def test_deepwalk_wrapper_end_to_end(g):
    dw = DeepWalk(g, walk_length=10, num_walks=4, dim=16, seed=0).train(epochs=1)
    assert dw.embeddings.shape == (g.n_real_node, 16)
    e = dw.model.edge_embedding([0, 1], [2, 3])
    assert e.shape == (2, 16)
