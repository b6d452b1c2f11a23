"""Per-layer numerical parity vs the reference layer math (dense forms), on CPU."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgll_tpu.graph import Graph
from dgll_tpu.data.transforms import gcn_normalize
from dgll_tpu.nn import GATConv, GCNConv, GINConv, SAGEConv


@pytest.fixture
def g_and_x():
    rng = np.random.default_rng(0)
    n, d = 30, 12
    src = rng.integers(0, n, 150)
    dst = rng.integers(0, n, 150)
    g = Graph.from_edges(src, dst, n, make_bidirected=True, add_self_loops=True)
    g = gcn_normalize(g)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    return g, x


def dense_adj(g, weighted=True):
    A = np.zeros((g.n_node, g.n_node), np.float32)
    w = np.asarray(g.edge_weight) if (weighted and g.edge_weight is not None) else 1.0
    np.add.at(A, (np.asarray(g.dst), np.asarray(g.src)),
              w if np.ndim(w) else np.ones(g.n_edge, np.float32))
    return A


def test_gcnconv_parity(g_and_x):
    """out == A_hat @ (X W) + b — reference gcnConv.forward (gcnconv.py:29-35)."""
    g, x = g_and_x
    layer = GCNConv(8)
    params = layer.init(jax.random.key(0), g, x)
    out = layer.apply(params, g, x)
    W = np.asarray(params["params"]["weight"]["kernel"])
    b = np.asarray(params["params"]["bias"])
    expect = dense_adj(g) @ (np.asarray(x) @ W) + b
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)


def test_gatconv_parity(g_and_x):
    """Single-head GAT vs the reference dense formulation (gatconv.py:30-54):
    e = LeakyReLU(Wh a_dst + (Wh a_src)^T), softmax masked by adjacency, out = alpha @ Wh."""
    g, x = g_and_x
    layer = GATConv(8, num_heads=1, concat_heads=True)
    params = layer.init(jax.random.key(1), g, x)
    out = layer.apply(params, g, x)

    W = np.asarray(params["params"]["weight"]["kernel"])
    a_src = np.asarray(params["params"]["attn_src"])[0]
    a_dst = np.asarray(params["params"]["attn_dst"])[0]
    h = np.asarray(x) @ W
    n = g.n_node
    e = (h @ a_dst)[:, None] + (h @ a_src)[None, :]  # e[i, j] = score of edge j -> i
    e = np.where(e > 0, e, 0.2 * e)
    adj = dense_adj(g, weighted=False) > 0
    e = np.where(adj, e, -1e30)
    e = e - e.max(axis=1, keepdims=True)
    alpha = np.exp(e) * adj
    alpha = alpha / np.maximum(alpha.sum(1, keepdims=True), 1e-16)
    expect = alpha @ h
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-3, atol=1e-4)


def test_sageconv_mean_parity(g_and_x):
    """Mean aggregate + self transform, concat combine (sageconv.py:70-83)."""
    g, x = g_and_x
    layer = SAGEConv(8, aggregator="mean", combine="concat")
    params = layer.init(jax.random.key(2), g, x)
    out = layer.apply(params, g, x)

    Wn = np.asarray(params["params"]["neigh"]["kernel"])
    Ws = np.asarray(params["params"]["self"]["kernel"])
    bs = np.asarray(params["params"]["self"]["bias"])
    A = dense_adj(g, weighted=False)
    deg = np.maximum(A.sum(1, keepdims=True), 1)
    agg = (A @ np.asarray(x)) / deg
    expect = np.concatenate([np.asarray(x) @ Ws + bs, agg @ Wn], axis=-1)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)


def test_ginconv_parity(g_and_x):
    """ReLU(Linear(X + A X)) (ginconv.py:16-30)."""
    g, x = g_and_x
    layer = GINConv(8)
    params = layer.init(jax.random.key(3), g, x)
    out = layer.apply(params, g, x)
    W = np.asarray(params["params"]["mlp"]["kernel"])
    b = np.asarray(params["params"]["mlp"]["bias"])
    A = dense_adj(g)
    expect = np.maximum((np.asarray(x) + A @ np.asarray(x)) @ W + b, 0)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)


def test_gat_multihead_shapes(g_and_x):
    g, x = g_and_x
    layer = GATConv(8, num_heads=4, concat_heads=True)
    params = layer.init(jax.random.key(4), g, x)
    out = layer.apply(params, g, x)
    assert out.shape == (g.n_node, 32)
    layer2 = GATConv(8, num_heads=4, concat_heads=False)
    params2 = layer2.init(jax.random.key(5), g, x)
    assert layer2.apply(params2, g, x).shape == (g.n_node, 8)
