"""Locality manufacturing (parallel/reorder.py): estimator, orderings,
with_windowed(reorder=True) composition, and training equivalence.

Scenario matrix mirrors the r5 hardware bench (spmm_windowed_bench):
* shuffled SBM — locality EXISTS but not in id space; reorder must recover it.
* uniform random — an expander; no ordering can help and nothing should pretend to.
"""
import numpy as np
import pytest

from dgll_tpu.data import gcn_normalize
from dgll_tpu.graph import Graph
from dgll_tpu.ops.windowed import build_hybrid
from dgll_tpu.parallel.reorder import (
    degree_order,
    estimate_windowed_fraction,
    permute_graph,
    rcm_order,
    reorder_for_locality,
)


def _sbm_edges(n, deg, csize=512, intra=0.9, seed=0):
    rng = np.random.default_rng(seed)
    e = n * deg
    dst = rng.integers(0, n, e)
    loc = rng.random(e) < intra
    src = np.where(loc, (dst // csize) * csize + rng.integers(0, csize, e),
                   rng.integers(0, n, e)) % n
    return src.astype(np.int64), dst.astype(np.int64)


def _shuffled_sbm_graph(n=65536, deg=12, seed=0):
    """SBM with node ids randomly shuffled: hidden locality."""
    src, dst = _sbm_edges(n, deg, seed=seed)
    rng = np.random.default_rng(seed + 1)
    shuf = rng.permutation(n)        # original id -> shuffled id
    labels = (np.arange(n) // 512 % 4).astype(np.int32)  # community-aligned
    node_feat = rng.standard_normal((n, 8), dtype=np.float32)
    node_lab = np.empty(n, np.int32)
    node_lab[shuf] = labels
    return Graph.from_edges(shuf[src], shuf[dst], n, node_feat=node_feat,
                            labels=node_lab, train_mask=np.ones(n, bool),
                            add_self_loops=True)


def test_estimator_tracks_builder():
    n, deg = 4096, 12
    src, dst = _sbm_edges(n, deg, seed=3)
    est = estimate_windowed_fraction(src, dst)
    h = build_hybrid(src, dst, n, n)
    # estimator is an upper bound that tracks the true captured fraction
    assert h.windowed_fraction <= est + 1e-9
    assert est - h.windowed_fraction < 0.25
    assert est > 0.6  # clustered graph: locality visible without reorder

    # expander at REALISTIC scale (tiny graphs have trivial locality: few
    # windows cover everything — that capture is real, not an estimator bug)
    rng = np.random.default_rng(0)
    nb = 131072
    rs, rd = rng.integers(0, nb, nb * 8), rng.integers(0, nb, nb * 8)
    assert estimate_windowed_fraction(rs, rd) < 0.2  # nothing there


def test_reorder_recovers_hidden_locality():
    g = _shuffled_sbm_graph()
    src = np.asarray(g.src)[: g.n_real_edge]
    dst = np.asarray(g.dst)[: g.n_real_edge]
    before = estimate_windowed_fraction(src, dst)
    assert before < 0.5, before  # shuffling destroyed id-space locality

    g2, info = reorder_for_locality(g, seed=0)
    assert info["chosen"] != "identity"
    assert info["estimate_chosen"] > max(0.7, before + 0.2), info
    assert g2.node_perm is not None
    # permutation really is a permutation and data rode along
    perm = np.asarray(g2.node_perm)
    assert sorted(perm.tolist()) == list(range(g.n_real_node))
    np.testing.assert_array_equal(np.asarray(g2.labels),
                                  np.asarray(g.labels)[perm])
    np.testing.assert_allclose(np.asarray(g2.node_feat),
                               np.asarray(g.node_feat)[perm])


def test_reorder_declines_on_expander():
    n = 131072  # realistic scale: tiny graphs have trivial window locality
    rng = np.random.default_rng(1)
    g = Graph.from_edges(rng.integers(0, n, n * 6), rng.integers(0, n, n * 6), n,
                         node_feat=rng.standard_normal((n, 4), dtype=np.float32),
                         labels=rng.integers(0, 3, n).astype(np.int32))
    g2, info = reorder_for_locality(g)
    assert info["estimate_chosen"] < 0.5  # no ordering manufactures locality
    assert info["estimate_identity"] < 0.2
    if info["chosen"] == "identity":
        assert g2 is g


def test_with_windowed_reorder_composes():
    g = gcn_normalize(_shuffled_sbm_graph())
    plain = g.with_windowed()
    assert plain.hybrid is None  # declines without reorder

    g2 = g.with_windowed(reorder=True)
    assert g2.hybrid is not None
    assert g2.hybrid.windowed_fraction >= 0.5
    assert g2.node_perm is not None

    # SpMM over the reordered layout == COO aggregation on the reordered graph
    # (pure-XLA oracles of both kernels — interpret-mode at this scale is slow;
    # kernel-vs-oracle exactness is covered in test_pallas_spmm_windowed)
    import jax.numpy as jnp

    from dgll_tpu.ops import spmm_coo
    from dgll_tpu.ops.chunked import spmm_chunked_xla
    from dgll_tpu.ops.windowed import spmm_windowed_xla

    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (g2.hybrid.win.n_cols, 8), dtype=np.float32))
    out = np.asarray(spmm_windowed_xla(g2.hybrid.win, x))[: g2.n_real_node]
    if g2.hybrid.res is not None:
        out = out + np.asarray(spmm_chunked_xla(g2.hybrid.res,
                                                x))[: g2.n_real_node]
    ref = spmm_coo(g2.src, g2.dst, x[: g2.n_node], g2.n_real_node,
                   g2.edge_weight)[: g2.n_real_node]
    np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_training_on_reordered_graph_is_exact():
    """Full-batch loss on the permuted graph == loss on the original."""
    import jax
    import jax.numpy as jnp
    import optax

    from dgll_tpu.nn import GCN
    from dgll_tpu.train import FullBatchTrainer

    g = gcn_normalize(_shuffled_sbm_graph(n=1024, deg=8, seed=5))
    g2 = permute_graph(g, np.random.default_rng(3).permutation(g.n_real_node))

    def loss_of(graph):
        model = GCN(hidden=16, n_class=int(np.asarray(graph.labels).max()) + 1,
                    dropout=0.0)
        tr = FullBatchTrainer(model, optax.adam(1e-2), seed=0)
        state, hist = tr.fit(graph, graph.node_feat, graph.labels,
                             graph.train_mask, None, epochs=3)
        return hist.epochs[-1].loss

    # parameters are permutation-invariant (Dense over features); the loss is a
    # masked mean over nodes -> identical up to fp reduction order
    assert abs(loss_of(g) - loss_of(g2)) < 2e-3


def test_orderings_are_permutations():
    g = _shuffled_sbm_graph(n=2048, deg=8, seed=7)
    for order in (degree_order(g), rcm_order(g)):
        assert sorted(np.asarray(order).tolist()) == list(range(g.n_real_node))


def test_with_windowed_reorder_declines_cheaply_on_expander():
    """When no ordering can clear min_fraction, with_windowed(reorder=True)
    must return the ORIGINAL graph without paying the permute + layout build
    (the declined path gates on the capture estimate)."""
    import time

    n = 131072
    rng = np.random.default_rng(9)
    g = Graph.from_edges(rng.integers(0, n, n * 6), rng.integers(0, n, n * 6),
                         n, node_feat=rng.standard_normal((n, 4),
                                                          dtype=np.float32),
                         labels=rng.integers(0, 3, n).astype(np.int32))
    t0 = time.perf_counter()
    g2 = g.with_windowed(reorder=True)
    dt = time.perf_counter() - t0
    assert g2 is g                      # unchanged graph, no layouts
    assert g2.hybrid is None and g2.node_perm is None
    # orderings + estimates only — no permute, no hybrid build (which takes
    # tens of seconds at this scale when it runs)
    assert dt < 60, dt
