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
