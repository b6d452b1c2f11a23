"""COG community pipeline: detection, merge/split, relabeling, book, sampler."""
import numpy as np
import pytest

from dgll_tpu.data import synthetic_classification_graph
from dgll_tpu.parallel import (
    community_feature_slice,
    detect_communities,
    load_community_book,
    max_community_size,
    merge_groups,
    relabel_communities,
    run_cog,
    save_community_book,
    split_oversized,
)
from dgll_tpu.sampling import CommunityNeighborSampler, HostGraph


@pytest.fixture(scope="module")
def g():
    # strongly homophilous SBM -> label propagation should find class-ish clusters
    return synthetic_classification_graph(n_node=300, avg_degree=10, n_class=4,
                                          feat_dim=8, homophily=0.95, seed=0)


def test_detect_communities_clusters(g):
    part = detect_communities(g, seed=0)
    assert part.shape == (g.n_real_node,)
    n_comm = len(np.unique(part))
    assert 1 <= n_comm <= g.n_real_node // 4  # found real clustering, not singletons


def test_merge_and_split():
    part = np.array([0] * 50 + [1] * 3 + [2] * 47)
    merged = merge_groups(part, min_size=10)
    _, sizes = np.unique(merged, return_counts=True)
    assert (sizes >= 10).all()
    split = split_oversized(merged, max_size=20)
    _, sizes2 = np.unique(split, return_counts=True)
    assert (sizes2 <= 20).all()
    assert sizes2.sum() == 100


def test_capacity_model():
    assert max_community_size(1000, feat_dim=10, feat_bytes=4, label_bytes=4) == 22


def test_relabel_contiguous_and_edge_preserving(g):
    part = detect_communities(g, seed=0)
    g2, book = relabel_communities(g, part)
    # book covers [0, n) contiguously without overlap
    spans = sorted(book.values())
    assert spans[0][0] == 0 and spans[-1][1] == g.n_real_node
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b == c
    assert g2.n_real_edge == g.n_real_edge
    # degree multiset is preserved under relabeling
    deg1 = np.sort(np.asarray(g.in_degrees)[: g.n_real_node])
    deg2 = np.sort(np.asarray(g2.in_degrees)[: g2.n_real_node])
    np.testing.assert_array_equal(deg1, deg2)


def test_run_cog_end_to_end(tmp_path, g):
    g2, book, timings = run_cog(g, hbm_budget_bytes=1 << 20, batch_size=32, seed=0)
    assert set(timings) == {"detect", "merge_split", "relabel"}
    p = tmp_path / "book.json"
    save_community_book(book, str(p))
    book2 = load_community_book(str(p))
    assert book2 == {int(k): list(v) for k, v in book.items()}
    feats = np.asarray(g2.node_feat)
    cid = next(iter(book2))
    sl = community_feature_slice(feats, book2, cid)
    lo, hi = book2[cid]
    assert sl.shape[0] == hi - lo


def test_community_sampler_stays_in_range(g):
    g2, book, _ = run_cog(g, hbm_budget_bytes=1 << 20, batch_size=32, seed=0)
    hg = HostGraph.from_graph(g2)
    cid, (lo, hi) = max(book.items(), key=lambda kv: kv[1][1] - kv[1][0])
    sampler = CommunityNeighborSampler([4, 3], (lo, hi), seed=0)
    seeds = np.arange(lo, min(lo + 16, hi))
    inp, out, blocks = sampler.sample(hg, seeds, pad_to=16)
    for b in blocks:
        ids = np.asarray(b.src_ids)
        assert ids.min() >= lo and ids.max() < hi
    # out-of-range seeds rejected
    with pytest.raises(AssertionError):
        sampler.sample(hg, np.array([hi]), pad_to=1)


def test_merge_groups_min_size_invariant_randomized():
    """Every surviving community must reach min_size (the COG loaders rely on it);
    regression for the prefix-binning repair (code-review r2 finding)."""
    rng = np.random.default_rng(0)
    for trial in range(50):
        n_comm = int(rng.integers(2, 40))
        sizes = rng.integers(1, 20, n_comm)
        part = np.repeat(np.arange(n_comm), sizes)
        rng.shuffle(part)
        min_size = int(rng.integers(2, 40))
        merged = merge_groups(part, min_size)
        _, out_sizes = np.unique(merged, return_counts=True)
        if part.size >= min_size:
            assert (out_sizes >= min_size).all(), (trial, min_size, sorted(out_sizes))
        else:
            assert len(out_sizes) == 1
        assert out_sizes.sum() == part.size
