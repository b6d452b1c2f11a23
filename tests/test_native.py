"""Native C++ host kernels vs numpy fallback: identical semantics, and the build works."""
import numpy as np
import pytest

from dgll_tpu import native


def test_native_library_builds():
    # the environment ships g++; the native path must actually be active here
    assert native.native_available()


def test_build_csr_matches_numpy():
    rng = np.random.default_rng(0)
    dst = rng.integers(0, 50, 500)
    indptr, order = native.build_csr(dst, 50)
    ref_order = np.argsort(dst, kind="stable")
    ref_indptr = np.zeros(51, np.int64)
    np.add.at(ref_indptr, dst + 1, 1)
    np.testing.assert_array_equal(indptr, np.cumsum(ref_indptr))
    np.testing.assert_array_equal(dst[order], dst[ref_order])
    # stability: equal keys keep input order
    np.testing.assert_array_equal(order, ref_order)


def test_sample_neighbors_validity():
    rng = np.random.default_rng(1)
    n, e = 40, 400
    dst = np.sort(rng.integers(0, n, e))
    src = rng.integers(0, n, e)
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, dst + 1, 1)
    indptr = np.cumsum(indptr)

    nodes = np.arange(n)
    mask = np.ones(n, bool)
    mask[-3:] = False
    out, om = native.sample_neighbors(indptr, src, nodes, mask, 7, seed=42)
    assert out.shape == (n, 7) and om.shape == (n, 7)
    for i in range(n):
        nbrs = set(src[indptr[i] : indptr[i + 1]])
        for j in range(7):
            if om[i, j]:
                assert out[i, j] in nbrs
            else:
                assert out[i, j] == i  # fallback id
    assert not om[-3:].any()  # masked rows invalid


def test_random_walks_are_paths():
    rng = np.random.default_rng(2)
    n, e = 30, 200
    src = np.sort(rng.integers(0, n, e))
    dst = rng.integers(0, n, e)
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)
    order = np.argsort(src, kind="stable")
    nbrs = dst[order]

    starts = np.arange(n)
    walks = native.random_walks(indptr, nbrs, starts, 12, seed=7)
    assert walks.shape == (n, 12)
    np.testing.assert_array_equal(walks[:, 0], starts)
    for i in range(n):
        for t in range(11):
            u, v = walks[i, t], walks[i, t + 1]
            row = nbrs[indptr[u] : indptr[u + 1]]
            assert (v in row) or (u == v and len(row) == 0)


def test_sampling_determinism_per_seed():
    rng = np.random.default_rng(3)
    n, e = 20, 100
    dst = np.sort(rng.integers(0, n, e))
    src = rng.integers(0, n, e)
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, dst + 1, 1)
    indptr = np.cumsum(indptr)
    nodes = np.arange(n)
    mask = np.ones(n, bool)
    a1, _ = native.sample_neighbors(indptr, src, nodes, mask, 5, seed=9)
    a2, _ = native.sample_neighbors(indptr, src, nodes, mask, 5, seed=9)
    b, _ = native.sample_neighbors(indptr, src, nodes, mask, 5, seed=10)
    np.testing.assert_array_equal(a1, a2)
    assert (a1 != b).any()
