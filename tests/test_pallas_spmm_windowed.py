"""Window-fused SpMM: builder invariants + kernel exactness + VJP (interpret).

The windowed layout/kernel (``ops/windowed.py`` + ``ops/pallas/spmm_windowed.py``)
is the round-4 gather-free SpMM: x streams in 512-row blocks, the gather is an
in-kernel one-hot MXU matmul. These tests run the kernel in interpret mode on
CPU against dense oracles; the hardware A/B lives in benchmarks/spmm_bench.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgll_tpu.ops.chunked import R_BLOCK
from dgll_tpu.ops.pallas.spmm_windowed import spmm_hybrid, spmm_windowed_pallas
from dgll_tpu.ops.windowed import (
    SUB,
    WIN_ROWS,
    build_hybrid,
    build_hybrid_pair,
    build_windowed,
    spmm_windowed_xla,
)


def clustered_coo(n, deg, n_comm, intra=0.9, seed=0):
    """SBM-ish edges: most sources inside the dst's community block."""
    rng = np.random.default_rng(seed)
    e = n * deg
    dst = rng.integers(0, n, e)
    csize = n // n_comm
    comm = dst // csize
    local = rng.random(e) < intra
    src = np.where(
        local,
        comm * csize + rng.integers(0, csize, e),
        rng.integers(0, n, e),
    ) % n  # communities at the tail may overrun n when csize does not divide it
    w = rng.random(e).astype(np.float32) + 0.5
    return src.astype(np.int64), dst.astype(np.int64), w


def dense_ref(src, dst, w, n_rows, n_cols, x):
    A = np.zeros((n_rows, n_cols), np.float64)
    np.add.at(A, (dst, src), w.astype(np.float64))
    return A @ np.asarray(x, np.float64)


class TestBuilder:
    def test_every_edge_exactly_once(self):
        src, dst, w = clustered_coo(1024, 8, 4, intra=0.85, seed=1)
        h = build_hybrid(src, dst, 1024, 1024, w)
        # reconstruct (src, dst, w) multiset from windowed + residual layouts
        c = h.win
        got = []
        for ci in range(c.n_chunk):
            for k in range(c.n_sub):
                for e in range(SUB):
                    sl = int(c.src_local[k, ci, e])
                    if sl < 0:
                        continue
                    gsrc = int(c.win_block[ci]) * WIN_ROWS + int(c.sub_off[ci, k]) + sl
                    gdst = int(c.row_block[ci]) * R_BLOCK + int(c.dst_local[k, ci, e])
                    got.append((gsrc, gdst, float(c.weight[k, ci, e])))
        if h.res is not None:
            r = h.res
            for ci in range(r.n_chunk):
                for e in range(r.eb):
                    if float(r.weight[ci, e]) == 0.0:
                        continue
                    got.append((int(r.src[ci, e]),
                                int(r.row_block[ci]) * R_BLOCK + int(r.dst_local[ci, e]),
                                float(r.weight[ci, e])))
        want = sorted((a, b, round(float(v), 4))
                      for a, b, v in zip(src.tolist(), dst.tolist(), w.tolist()))
        got = sorted((a, b, round(float(v), 4)) for a, b, v in got)
        assert got == want

    def test_sub_window_bounds(self):
        src, dst, w = clustered_coo(2048, 10, 8, intra=0.8, seed=2)
        c, resid = build_windowed(src, dst, 2048, 2048, w)
        sl = np.asarray(c.src_local[:, : c.n_chunk])
        so = np.asarray(c.sub_off)
        assert sl.max() < SUB and (so % 16 == 0).all()
        assert so.max() <= WIN_ROWS - SUB
        # row_block non-decreasing, all blocks covered
        rb = np.asarray(c.row_block)
        assert (np.diff(rb) >= 0).all()
        assert set(range(c.n_rows // R_BLOCK)) <= set(rb.tolist())

    def test_clustered_mostly_windowed(self):
        src, dst, w = clustered_coo(4096, 16, 8, intra=0.9, seed=3)
        h = build_hybrid(src, dst, 4096, 4096, w)
        assert h.windowed_fraction > 0.75, h.windowed_fraction


class TestKernelExactness:
    @pytest.mark.parametrize("intra", [0.95, 0.7])
    def test_forward_matches_dense(self, intra):
        n = 1536
        src, dst, w = clustered_coo(n, 9, 6, intra=intra, seed=4)
        h, ht = build_hybrid_pair(src, dst, n, n, w)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((n, 128)).astype(np.float32)
        out = spmm_hybrid(h, ht, jnp.asarray(x), interpret=True)[:n]
        want = dense_ref(src, dst, w, n, n, x)
        np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-4)

    def test_xla_oracle_matches_dense(self):
        n = 1024
        src, dst, w = clustered_coo(n, 8, 4, intra=1.0, seed=5)
        c, resid = build_windowed(src, dst, n, n, w, min_fill=0.0)
        assert resid is None  # fully captured at min_fill=0
        x = np.random.default_rng(1).standard_normal((c.n_cols, 128)).astype(np.float32)
        out = spmm_windowed_xla(c, jnp.asarray(x))[:n]
        want = dense_ref(src, dst, w, n, n, x[:n])
        np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-4)

    def test_windowed_pallas_matches_xla_oracle(self):
        n = 1024
        src, dst, w = clustered_coo(n, 8, 4, intra=1.0, seed=6)
        c, resid = build_windowed(src, dst, n, n, w, min_fill=0.0)
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((c.n_cols, 128)).astype(np.float32))
        got = spmm_windowed_pallas(c, x, interpret=True)
        want = spmm_windowed_xla(c, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_bias_relu_fused(self):
        n = 512
        src, dst, w = clustered_coo(n, 6, 2, intra=0.9, seed=7)
        h, ht = build_hybrid_pair(src, dst, n, n, w)
        x = jnp.asarray(np.random.default_rng(3).standard_normal((n, 128)), jnp.float32)
        b = jnp.asarray(np.random.default_rng(4).standard_normal(128), jnp.float32)
        out = spmm_hybrid(h, ht, x, bias=b, activation="relu", interpret=True)[:n]
        want = np.maximum(dense_ref(src, dst, w, n, n, np.asarray(x)) + np.asarray(b), 0)
        np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-4)

    def test_bf16_messages_close(self):
        n = 512
        src, dst, w = clustered_coo(n, 6, 2, intra=0.9, seed=8)
        h, ht = build_hybrid_pair(src, dst, n, n, w)
        x = jnp.asarray(np.random.default_rng(5).standard_normal((n, 128)), jnp.float32)
        f32 = spmm_hybrid(h, ht, x, interpret=True)[:n]
        b16 = spmm_hybrid(h, ht, x, interpret=True, msg_dtype=jnp.bfloat16)[:n]
        assert b16.dtype == jnp.float32
        rel = np.abs(np.asarray(b16) - np.asarray(f32)).max() / (
            np.abs(np.asarray(f32)).max() + 1e-9)
        assert rel < 0.05, rel


class TestVJP:
    def test_grad_matches_dense(self):
        n = 640
        src, dst, w = clustered_coo(n, 7, 4, intra=0.85, seed=9)
        h, ht = build_hybrid_pair(src, dst, n, n, w)
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.standard_normal((n, 128)), jnp.float32)
        b = jnp.asarray(rng.standard_normal(128), jnp.float32)
        t = jnp.asarray(rng.standard_normal((n, 128)), jnp.float32)

        def loss(x_, b_):
            o = spmm_hybrid(h, ht, x_, bias=b_, activation="relu", interpret=True)
            return jnp.sum(o[:n] * t)

        gx, gb = jax.grad(loss, argnums=(0, 1))(x, b)

        A = np.zeros((n, n), np.float64)
        np.add.at(A, (dst, src), w.astype(np.float64))

        def loss_ref(x_, b_):
            o = jnp.maximum(jnp.asarray(A, jnp.float32) @ x_ + b_[None, :], 0.0)
            return jnp.sum(o * t)

        gx_ref, gb_ref = jax.grad(loss_ref, argnums=(0, 1))(x, b)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref),
                                   rtol=5e-4, atol=5e-4)


class TestGraphIntegration:
    def test_with_windowed_attaches_and_gcn_matches(self):
        """Graph.with_windowed routes GCNConv aggregation through the fused
        kernel; output matches the classic chunked path."""
        import optax
        from dgll_tpu.graph import Graph
        from dgll_tpu.nn import GCN

        n = 1024
        src, dst, w = clustered_coo(n, 8, 4, intra=0.9, seed=10)
        g = Graph.from_edges(src, dst, n, add_self_loops=True)
        from dgll_tpu.data import gcn_normalize

        g = gcn_normalize(g)
        gw = g.with_windowed()
        assert gw.hybrid is not None
        gc = g.with_chunked()
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((n, 128)), jnp.float32)
        model = GCN(hidden=128, n_class=4, dropout=0.0)
        params = model.init(jax.random.key(0), gw, x)["params"]
        out_w = model.apply({"params": params}, gw, x, deterministic=True)
        out_c = model.apply({"params": params}, gc, x, deterministic=True)
        np.testing.assert_allclose(np.asarray(out_w), np.asarray(out_c),
                                   rtol=2e-3, atol=2e-3)

    def test_with_windowed_declines_random_graph(self):
        from dgll_tpu.graph import Graph

        rng = np.random.default_rng(1)
        # large enough that (dst-block, window) groups are sparse — at this
        # scale a uniform-random graph has ~4 edges per group, far below fill
        n = 65536
        src = rng.integers(0, n, n * 4)
        dst = rng.integers(0, n, n * 4)
        g = Graph.from_edges(src, dst, n)
        gw = g.with_windowed(min_fraction=0.5)
        assert gw.hybrid is None  # random graph: windowed capture too low


class TestLargerChunks:
    """eb=1024 layouts (r5): the hardware probe (windowed_probe_r5.json) shows
    the kernel is grid-step bound, so halving the chunk count is the lever —
    correctness must hold at the larger chunk size."""

    def test_eb1024_forward_matches_dense(self):
        n = 1536
        src, dst, w = clustered_coo(n, 9, 6, intra=0.9, seed=7)
        h, ht = build_hybrid_pair(src, dst, n, n, w, eb=1024)
        assert h.win.n_sub == 8
        rng = np.random.default_rng(3)
        x = rng.standard_normal((n, 128)).astype(np.float32)
        out = spmm_hybrid(h, ht, jnp.asarray(x), interpret=True)[:n]
        want = dense_ref(src, dst, w, n, n, x)
        np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-4)

    def test_eb1024_vjp_matches_autodiff_oracle(self):
        n = 768
        src, dst, w = clustered_coo(n, 6, 4, intra=0.9, seed=8)
        h, ht = build_hybrid_pair(src, dst, n, n, w, eb=1024)
        x = jnp.asarray(
            np.random.default_rng(4).standard_normal((n, 128)).astype(np.float32))
        t = jnp.asarray(
            np.random.default_rng(5).standard_normal(
                (h.win.n_rows, 128)).astype(np.float32))

        def lo(x_):
            return jnp.vdot(spmm_hybrid(h, ht, x_, interpret=True), t)

        gx = jax.grad(lo)(x)
        # oracle: dense A^T t
        A = np.zeros((n, n), np.float32)
        np.add.at(A, (dst, src), w)
        np.testing.assert_allclose(np.asarray(gx), A.T @ np.asarray(t)[:n],
                                   rtol=2e-4, atol=2e-4)
