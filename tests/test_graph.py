import numpy as np
import jax.numpy as jnp
import pytest

from dgll_tpu.graph import Graph, pad_graph
from dgll_tpu.data.transforms import gcn_normalize, row_normalize_adj


def tiny_graph(**kw):
    # 0->1, 0->2, 1->2, 2->0, 3->3
    src = [0, 0, 1, 2, 3]
    dst = [1, 2, 2, 0, 3]
    return Graph.from_edges(src, dst, 4, **kw)


def test_csr_structure():
    g = tiny_graph()
    indptr = np.asarray(g.indptr)
    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    assert g.n_node == 4 and g.n_edge == 5
    assert list(indptr) == [0, 1, 2, 4, 5]
    assert np.all(np.diff(dst) >= 0)
    # in-neighbours of node 2 are {0, 1}
    assert sorted(src[indptr[2] : indptr[3]]) == [0, 1]


def test_dgraph_parity_api():
    g = tiny_graph(
        node_feat=np.eye(4, dtype=np.float32),
        labels=np.arange(4),
        train_mask=np.array([1, 1, 0, 0], bool),
        val_mask=np.array([0, 0, 1, 0], bool),
        test_mask=np.array([0, 0, 0, 1], bool),
    )
    assert g.get_neighbors([2]) == [[0, 1]]
    adj = g.get_induced_subgraph([0, 1, 2])
    assert adj[1, 0] == 1.0 and adj[2, 0] == 1.0 and adj[2, 1] == 1.0 and adj[0, 2] == 1.0
    assert adj.sum() == 4
    np.testing.assert_allclose(np.asarray(g.get_features([1, 3])), np.eye(4)[[1, 3]])
    assert list(g.get_train_nodes()) == [0, 1]
    assert list(g.get_validation_nodes()) == [2]
    assert list(g.get_test_nodes()) == [3]


def test_bidirect_and_self_loops():
    g = Graph.from_edges([0, 1], [1, 2], 3, make_bidirected=True, add_self_loops=True)
    # 2 edges * 2 directions + 3 self loops
    assert g.n_edge == 7
    src, dst = np.asarray(g.src), np.asarray(g.dst)
    pairs = set(zip(src.tolist(), dst.tolist()))
    assert (0, 1) in pairs and (1, 0) in pairs and (2, 2) in pairs


def test_padding_invariants():
    g = tiny_graph(node_feat=np.ones((4, 3), np.float32))
    p = pad_graph(g, node_multiple=8, edge_multiple=16)
    assert p.n_node == 8 and p.n_edge == 16
    assert p.n_real_node == 4 and p.n_real_edge == 5
    indptr = np.asarray(p.indptr)
    assert indptr.shape == (9,) and indptr[-1] == 16
    # padded edges target the last padded node only
    assert np.all(np.asarray(p.dst)[5:] == 7)
    assert np.asarray(p.node_feat).shape == (8, 3)
    assert np.all(np.asarray(p.node_feat)[4:] == 0)
    assert list(np.asarray(p.edge_mask)) == [True] * 5 + [False] * 11


def test_gcn_normalize_matches_dense():
    g = tiny_graph()
    g = Graph.from_edges(np.asarray(g.src), np.asarray(g.dst), 4, add_self_loops=True,
                         make_bidirected=True)
    g = gcn_normalize(g)
    src, dst, w = np.asarray(g.src), np.asarray(g.dst), np.asarray(g.edge_weight)
    A = np.zeros((4, 4))
    A[dst, src] = 1.0
    d = A.sum(1)
    expect = np.diag(d ** -0.5) @ A @ np.diag(d ** -0.5)
    got = np.zeros((4, 4))
    got[dst, src] = w
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_row_normalize_rowsums():
    g = tiny_graph()
    g = row_normalize_adj(g)
    dst, w = np.asarray(g.dst), np.asarray(g.edge_weight)
    sums = np.zeros(4)
    np.add.at(sums, dst, w)
    np.testing.assert_allclose(sums, [1, 1, 1, 1], rtol=1e-6)


def test_padded_norm_weights_zero():
    g = pad_graph(tiny_graph(), 8, 16)
    g = row_normalize_adj(g)
    assert np.all(np.asarray(g.edge_weight)[5:] == 0)


def test_pad_aligned_nodes_no_phantom_messages():
    """Regression: n_node already a multiple but edges padded — pad edges must NOT
    self-loop on a real node (unweighted aggregation picked up phantom messages)."""
    from dgll_tpu.ops.spmm import spmm_coo, spmm_mean_coo, spmm_max_coo

    src = [0, 1, 2]
    dst = [7, 7, 7]
    g = Graph.from_edges(src, dst, 8)  # 8 nodes, already aligned to node_multiple=8
    p = pad_graph(g, node_multiple=8, edge_multiple=128)
    # pad edges target a padded node, never a real one
    assert p.n_node > 8
    assert np.all(np.asarray(p.dst)[3:] >= 8)
    x = np.zeros((p.n_node, 2), np.float32)
    x[:8] = np.arange(16, dtype=np.float32).reshape(8, 2)
    for agg in (spmm_coo, spmm_mean_coo, spmm_max_coo):
        out = np.asarray(agg(jnp.asarray(p.src), jnp.asarray(p.dst), jnp.asarray(x), p.n_node))
        # node 7 aggregates exactly its 3 real in-neighbours {0,1,2}
        expect = {spmm_coo: x[0] + x[1] + x[2], spmm_mean_coo: (x[0] + x[1] + x[2]) / 3,
                  spmm_max_coo: x[2]}[agg]
        np.testing.assert_allclose(out[7], expect, rtol=1e-6)
