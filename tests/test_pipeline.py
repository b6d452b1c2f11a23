"""Pipelined (MQ-style) trainer: cached + uncached feature paths, early stop, stats."""
import jax.numpy as jnp
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


class TestPackedPipeline:
    """Transfer-minimal host pipeline: (ids, mask) buffers + in-jit unpacking."""

    def _setup(self):
        from dgll_tpu.data import synthetic_classification_graph, gcn_normalize

        g = gcn_normalize(synthetic_classification_graph(
            n_node=400, avg_degree=8, n_class=4, feat_dim=16, seed=0))
        return g

    def test_packed_matches_block_semantics(self):
        import jax
        from dgll_tpu.sampling import HostGraph, NeighborSampler
        from dgll_tpu.train.trainer import blocks_from_packed

        g = self._setup()
        hg = HostGraph.from_graph(g)
        fanouts = [4, 3]
        s = NeighborSampler(fanouts, seed=0)
        ids, mask = s.sample_packed(hg, np.arange(16), pad_to=16)
        assert ids.dtype == np.int32
        sizes = NeighborSampler.packed_sizes(16, fanouts)
        assert len(ids) == sizes[-1] == 16 * 4 * 5
        blocks = blocks_from_packed(jnp.asarray(ids), jnp.asarray(mask), fanouts)
        assert len(blocks) == 2
        assert blocks[-1].n_dst == 16 and blocks[-1].fanout == 3
        assert blocks[0].n_dst == 64 and blocks[0].fanout == 4
        # seeds at the head, self-at-head protocol
        assert (np.asarray(blocks[-1].src_ids[:16]) == np.arange(16)).all()
        # every masked-valid sampled id is a real in-neighbour of its dst
        indptr = np.asarray(g.indptr); src = np.asarray(g.src)
        blk = blocks[-1]
        sm = np.asarray(blk.neigh_mask); sampled = np.asarray(
            blk.src_ids[16:]).reshape(16, 3)
        for i in range(16):
            nbrs = set(src[indptr[i]:indptr[i + 1]].tolist())
            for j in range(3):
                if sm[i, j]:
                    assert sampled[i, j] in nbrs

    def test_packed_epoch_learns_and_matches_loader(self):
        import jax
        import optax
        from dgll_tpu.dataloader import DataLoader
        from dgll_tpu.nn import GraphSAGE
        from dgll_tpu.sampling import HostGraph, NeighborSampler
        from dgll_tpu.train import MiniBatchTrainer

        g = self._setup()
        hg = HostGraph.from_graph(g)
        fanouts = [4, 3]
        sampler = NeighborSampler(fanouts, seed=0)
        loader = DataLoader(hg, g.get_train_nodes(), sampler, 32, packed=True,
                            seed=0)
        first = next(iter(loader))
        assert isinstance(first, tuple) and len(first) == 2

        model = GraphSAGE(hidden=16, n_class=4, dropout=0.0)
        tr = MiniBatchTrainer(model, optax.adam(1e-2))
        _, _, b0 = sampler.sample(hg, g.get_train_nodes()[:32], pad_to=32)
        x0 = jnp.take(jnp.asarray(g.node_feat), jnp.asarray(b0[0].src_ids), axis=0)
        state = tr.init_state(b0, x0)
        losses = []
        for _ in range(6):
            state, loss, _ = tr.run_epoch_packed(
                state, loader, g.node_feat, g.labels, fanouts)
            losses.append(loss)
        assert losses[-1] < losses[0]


class TestGroupedPackedEpoch:
    """Grouped dispatch (run_epoch_packed(group=G)): G batches scanned per
    dispatch to amortise the per-batch round trip; must train identically to
    ungrouped stepping (dropout 0), including zero-mask tail padding."""

    def _train(self, group, n_epochs=4):
        import optax
        from dgll_tpu.data import synthetic_classification_graph
        from dgll_tpu.dataloader import DataLoader
        from dgll_tpu.nn import GraphSAGE
        from dgll_tpu.sampling import HostGraph, NeighborSampler
        from dgll_tpu.train import MiniBatchTrainer

        g = synthetic_classification_graph(n_node=300, avg_degree=6, feat_dim=12,
                                           n_class=4, seed=11)
        hg = HostGraph.from_graph(g)
        fanouts = [4, 3]
        sampler = NeighborSampler(fanouts, seed=0)
        # 300*0.1=30 train nodes, batch 8 -> 4 batches: group=3 forces a padded
        # tail (4 = 3 + 1-plus-2-padding)
        seeds = g.get_train_nodes()
        model = GraphSAGE(hidden=8, n_class=4, dropout=0.0)
        tr = MiniBatchTrainer(model, optax.adam(1e-2), seed=5)
        _, _, b0 = sampler.sample(hg, seeds[:8], pad_to=8)
        x0 = jnp.take(jnp.asarray(g.node_feat), jnp.asarray(b0[0].src_ids), axis=0)
        state = tr.init_state(b0, x0)
        losses = []
        for ep in range(n_epochs):
            loader = DataLoader(hg, seeds, sampler, 8, packed=True, seed=7,
                                shuffle=False)
            state, loss, _ = tr.run_epoch_packed(
                state, loader, g.node_feat, g.labels, fanouts, group=group)
            losses.append(loss)
        return losses, state

    def test_grouped_matches_ungrouped(self):
        import jax

        l1, s1 = self._train(group=1)
        l3, s3 = self._train(group=3)  # padded tail exercised
        np.testing.assert_allclose(l1, l3, rtol=2e-5)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
            s1.params, s3.params)

    def test_grouped_learns(self):
        losses, _ = self._train(group=4, n_epochs=6)
        assert losses[-1] < losses[0]
