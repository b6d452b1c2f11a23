"""Chunk-layout edge<->row primitives (ops/pallas/edge_ops.py): oracle + grads.

These replace the XLA segment ops + [E] takes in the GAT path (measured ~10x
slower on TPU, gat_profile_r4.json). Interpret-mode tests against numpy/segment
oracles, plus VJP checks for the differentiable wrappers.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgll_tpu.ops.chunked import R_BLOCK, build_chunked
from dgll_tpu.ops.pallas.edge_ops import (
    NEG,
    edge_softmax_chunked_fast,
    edges_to_rows_max,
    edges_to_rows_sum,
    rows_to_edges,
    rows_to_edges_d,
)
from dgll_tpu.ops.pallas.sddmm import edge_softmax_chunked_heads


@pytest.fixture(scope="module")
def layout():
    rng = np.random.default_rng(0)
    n, e = 1000, 6000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32) + 0.1
    c = build_chunked(src, dst, n, n, w, eb=256)
    dstg = (np.asarray(c.row_block)[:, None] * R_BLOCK
            + np.asarray(c.dst_local))
    valid = np.asarray(c.weight) != 0
    return c, dstg, valid


def test_rows_to_edges_matches_take(layout):
    c, dstg, valid = layout
    v = np.random.default_rng(1).standard_normal(c.n_rows).astype(np.float32)
    got = np.asarray(rows_to_edges(c, jnp.asarray(v), interpret=True))
    want = v[dstg]
    want[c.n_chunk:] = 0.0
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_edges_to_rows_sum_matches_segment(layout):
    c, dstg, valid = layout
    e = np.random.default_rng(2).standard_normal(dstg.shape).astype(np.float32)
    got = np.asarray(edges_to_rows_sum(c, jnp.asarray(e), interpret=True))
    want = np.zeros(c.n_rows, np.float64)
    np.add.at(want, dstg[valid], e[valid])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_edges_to_rows_max_matches_segment(layout):
    c, dstg, valid = layout
    e = np.random.default_rng(3).standard_normal(dstg.shape).astype(np.float32)
    got = np.asarray(edges_to_rows_max(c, jnp.asarray(e), interpret=True))
    want = np.full(c.n_rows, NEG, np.float32)
    np.maximum.at(want, dstg[valid], e[valid])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_softmax_fast_matches_segment_version(layout):
    c, dstg, valid = layout
    H = 4
    s = np.random.default_rng(4).standard_normal(
        (dstg.size, H)).astype(np.float32)
    got = np.asarray(edge_softmax_chunked_fast(c, jnp.asarray(s), interpret=True))
    want = np.asarray(edge_softmax_chunked_heads(c, jnp.asarray(s)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_softmax_fast_gradients_match(layout):
    c, dstg, valid = layout
    H = 2
    rng = np.random.default_rng(5)
    s = jnp.asarray(rng.standard_normal((dstg.size, H)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((dstg.size, H)).astype(np.float32))

    g_fast = jax.grad(
        lambda x: jnp.sum(edge_softmax_chunked_fast(c, x, interpret=True) * t))(s)
    g_ref = jax.grad(
        lambda x: jnp.sum(edge_softmax_chunked_heads(c, x) * t))(s)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=5e-4, atol=5e-5)


def test_rows_to_edges_d_gradient(layout):
    c, dstg, valid = layout
    rng = np.random.default_rng(6)
    v = jnp.asarray(rng.standard_normal(c.n_rows).astype(np.float32))
    t_full = rng.standard_normal(dstg.shape).astype(np.float32)
    t_full[c.n_chunk:] = 0.0  # zero cotangent on pad rows (caller contract)
    t = jnp.asarray(t_full)

    g = jax.grad(lambda x: jnp.sum(rows_to_edges_d(c, x, interpret=True)
                                   * t.reshape(c.n_chunk_meta, c.eb)))(v)
    want = np.zeros(c.n_rows, np.float64)
    np.add.at(want, dstg.reshape(-1), np.asarray(t).reshape(-1))
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-4, atol=1e-4)


class TestMultiHead:
    """All-heads-per-launch variants must match the per-head versions exactly."""

    def test_rows_to_edges_multi(self, layout):
        from dgll_tpu.ops.pallas.edge_ops import rows_to_edges_multi

        c, dstg, valid = layout
        H = 5
        v = np.random.default_rng(7).standard_normal(
            (c.n_rows, H)).astype(np.float32)
        got = np.asarray(rows_to_edges_multi(c, jnp.asarray(v), interpret=True))
        for h in range(H):
            want = v[:, h][dstg]
            want[c.n_chunk:] = 0.0
            np.testing.assert_allclose(got[:, h].reshape(dstg.shape), want,
                                       rtol=1e-6)

    def test_softmax_multi_matches_segment(self, layout):
        from dgll_tpu.ops.pallas.edge_ops import edge_softmax_chunked_multi

        c, dstg, valid = layout
        H = 3
        s = np.random.default_rng(8).standard_normal(
            (dstg.size, H)).astype(np.float32)
        got = np.asarray(edge_softmax_chunked_multi(c, jnp.asarray(s),
                                                    interpret=True))
        want = np.asarray(edge_softmax_chunked_heads(c, jnp.asarray(s)))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)

    def test_softmax_multi_gradients(self, layout):
        from dgll_tpu.ops.pallas.edge_ops import edge_softmax_chunked_multi

        c, dstg, valid = layout
        H = 2
        rng = np.random.default_rng(9)
        s = jnp.asarray(rng.standard_normal((dstg.size, H)).astype(np.float32))
        t = jnp.asarray(rng.standard_normal((dstg.size, H)).astype(np.float32))
        g_fast = jax.grad(lambda x: jnp.sum(
            edge_softmax_chunked_multi(c, x, interpret=True) * t))(s)
        g_ref = jax.grad(lambda x: jnp.sum(
            edge_softmax_chunked_heads(c, x) * t))(s)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                                   rtol=5e-4, atol=5e-5)
