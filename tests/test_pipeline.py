"""Pipelined (MQ-style) trainer: cached + uncached feature paths, early stop, stats."""
import numpy as np
import optax
import pytest

from dgll_tpu.cache import HBMFeatureCache
from dgll_tpu.data import gcn_normalize, synthetic_classification_graph
from dgll_tpu.nn import GraphSAGE
from dgll_tpu.sampling import NeighborSampler
from dgll_tpu.train import PipelinedTrainer


@pytest.fixture(scope="module")
def g():
    return gcn_normalize(
        synthetic_classification_graph(n_node=400, avg_degree=8, n_class=4,
                                       feat_dim=16, seed=0)
    )


def test_pipelined_trainer_learns(g):
    tr = PipelinedTrainer(
        GraphSAGE(hidden=32, n_class=4, dropout=0.0), optax.adam(1e-2),
        g, NeighborSampler([5, 5], seed=0), batch_size=32,
        features=g.node_feat, labels=g.labels, seed=0,
    ).init(g.get_train_nodes())
    res = tr.fit(np.arange(g.n_real_node), g.get_validation_nodes(), epochs=5)
    assert res["best_val"] > 0.7, res["best_val"]
    assert {"load", "compute"} <= set(res["phases"])
    acc = tr.evaluate_nodes(g.get_test_nodes())
    assert acc > 0.7


def test_pipelined_trainer_with_cache(g):
    cache = HBMFeatureCache(np.asarray(g.node_feat))
    deg = np.asarray(g.in_degrees)
    cache.auto_cache(deg, budget_bytes=deg.shape[0] * 16 * 4 // 2)  # half the nodes
    tr = PipelinedTrainer(
        GraphSAGE(hidden=32, n_class=4, dropout=0.0), optax.adam(1e-2),
        g, NeighborSampler([4, 4], seed=0), batch_size=32,
        features=cache, labels=g.labels, seed=0,
    ).init(g.get_train_nodes())
    res = tr.fit(np.arange(g.n_real_node), epochs=3)
    assert "cache_miss_rate" in res
    assert 0.0 < res["cache_miss_rate"] < 0.9  # hot-degree cache beats random
    assert np.isfinite(res["history"][-1]["loss"])


def test_early_stopping(g):
    tr = PipelinedTrainer(
        GraphSAGE(hidden=8, n_class=4, dropout=0.0), optax.adam(1e-4),
        g, NeighborSampler([3], seed=0), batch_size=32,
        features=g.node_feat, labels=g.labels, seed=0,
    )
    # n_layers mismatch: model default 2 layers needs 2 fanouts -> use 2
    tr.sampler = NeighborSampler([3, 3], seed=0)
    tr.init(g.get_train_nodes())
    res = tr.fit(g.get_train_nodes(), g.get_validation_nodes(), epochs=50, patience=2)
    assert len(res["history"]) < 50
