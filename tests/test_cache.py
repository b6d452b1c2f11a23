"""HBM feature cache: policy, correctness of hit/miss merge, miss-rate accounting."""
import numpy as np
import jax.numpy as jnp

from dgll_tpu.cache import HBMFeatureCache


def test_capacity_model():
    feats = np.random.default_rng(0).normal(size=(100, 16)).astype(np.float32)
    c = HBMFeatureCache(feats)
    assert c.capacity_for_budget(16 * 4 * 10) == 10
    assert c.capacity_for_budget(0) == 0


def test_auto_cache_picks_top_degree():
    feats = np.arange(20, dtype=np.float32).reshape(20, 1).repeat(4, 1)
    c = HBMFeatureCache(feats)
    deg = np.arange(20)  # node 19 hottest
    k = c.auto_cache(deg, budget_bytes=4 * 4 * 5)  # room for 5 rows
    assert k == 5
    assert set(np.nonzero(c.cache_pos >= 0)[0]) == {15, 16, 17, 18, 19}


def test_fetch_merges_hits_and_misses():
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(50, 8)).astype(np.float32)
    c = HBMFeatureCache(feats)
    c.fill(np.arange(0, 25))  # cache first half
    ids = np.array([3, 30, 7, 45, 24, 25])
    out = np.asarray(c.fetch(ids))
    np.testing.assert_allclose(out, feats[ids], rtol=1e-6)
    rate, lookups, misses = c.miss_rate()
    assert lookups == 6 and misses == 3
    assert abs(rate - 0.5) < 1e-9


def test_fetch_all_hits_and_whole_graph():
    feats = np.random.default_rng(2).normal(size=(10, 4)).astype(np.float32)
    c = HBMFeatureCache(feats)
    c.fill(np.arange(10))
    assert c.cached_whole_graph
    out = np.asarray(c.fetch(np.array([9, 0, 5])))
    np.testing.assert_allclose(out, feats[[9, 0, 5]], rtol=1e-6)
    assert c.miss_rate()[2] == 0


def test_fetch_without_cache_falls_back_to_host():
    feats = np.random.default_rng(3).normal(size=(10, 4)).astype(np.float32)
    c = HBMFeatureCache(feats)
    out = np.asarray(c.fetch(np.array([1, 2])))
    np.testing.assert_allclose(out, feats[[1, 2]], rtol=1e-6)


def test_device_budget_probe():
    """Capacity from live device memory stats (ref storage.py:72-82); CPU backends
    may expose no stats -> None and auto_cache_from_device degrades to 0."""
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(64, 16)).astype(np.float32)
    c = HBMFeatureCache(feats)
    b = c.device_budget_bytes(reserve_bytes=0)
    assert b is None or b >= 0
    k = c.auto_cache_from_device(np.arange(64), reserve_bytes=0)
    if b is None:
        assert k == 0
    else:
        assert k == min(c.capacity_for_budget(b), 64)


def test_prefetched_epoch_matches_plain(tmp_path):
    """run_epoch with a fetch_fn (prefetch-overlapped) trains identically to the
    device-gather path when the cache holds the whole graph."""
    import jax
    import jax.numpy as jnp
    import optax
    from dgll_tpu.data import synthetic_classification_graph
    from dgll_tpu.dataloader import DataLoader
    from dgll_tpu.nn import GraphSAGE
    from dgll_tpu.sampling import NeighborSampler
    from dgll_tpu.train import MiniBatchTrainer

    g = synthetic_classification_graph(n_node=200, avg_degree=5, n_class=4,
                                       feat_dim=16, seed=0)
    model = GraphSAGE(hidden=16, n_class=4, dropout=0.0)

    cache = HBMFeatureCache(np.asarray(g.node_feat))
    cache.fill(np.arange(g.n_real_node))

    def run(fetch):
        sampler = NeighborSampler([3, 2], seed=0)
        tr = MiniBatchTrainer(model, optax.sgd(1e-2), seed=0)
        loader = DataLoader(g, g.get_train_nodes(), sampler, 16, seed=0)
        _, _, b0 = sampler.sample(loader.host_g, g.get_train_nodes()[:16], pad_to=16)
        x0 = jnp.take(jnp.asarray(g.node_feat), jnp.asarray(b0[0].src_ids), axis=0)
        state = tr.init_state(b0, x0)
        state, loss, _ = tr.run_epoch(state, loader, g.node_feat, g.labels,
                                      fetch_fn=fetch)
        return loss

    l_plain = run(None)
    l_cache = run(lambda ids: cache.fetch(np.asarray(ids)))
    assert abs(l_plain - l_cache) < 1e-5
    assert cache.miss_rate()[0] == 0.0
