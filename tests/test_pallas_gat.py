"""SDDMM / expand-rows / dynamic-weight SpMM kernels + the sparse GAT layer:
numerical parity vs dense math and VJP parity vs XLA autodiff (interpret on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgll_tpu.ops.chunked import R_BLOCK, build_chunked, build_chunked_pair
from dgll_tpu.ops.pallas.expand_rows import expand_rows_chunked
from dgll_tpu.ops.pallas.gat import gat_attention_chunked, sddmm, spmm_dyn
from dgll_tpu.ops.pallas.sddmm import (
    edge_softmax_chunked,
    sddmm_chunked_pallas,
    sddmm_chunked_xla,
)
from dgll_tpu.ops.segment import segment_softmax
from dgll_tpu.ops.spmm import sddmm_coo, spmm_coo


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    n, e, d = 200, 2000, 128
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    c, ct = build_chunked_pair(src, dst, n, n, None, eb=128)
    a = rng.normal(size=(c.n_rows, d)).astype(np.float32)
    x = rng.normal(size=(c.n_rows, d)).astype(np.float32)
    return src, dst, c, ct, jnp.asarray(a), jnp.asarray(x), n


def _flat_valid(c):
    # compute-grid level: first n_chunk metadata rows (the rest sit outside the grid)
    return np.asarray(c.weight)[: c.n_chunk].reshape(-1) != 0


def _edge_dst(c):
    nc = c.n_chunk
    return (np.asarray(c.row_block)[:nc, None] * R_BLOCK
            + np.asarray(c.dst_local)[:nc]).reshape(-1)


def _edge_src(c):
    return np.asarray(c.src)[: c.n_chunk].reshape(-1)


def _crop(c, arr2d):
    """Metadata-level [n_chunk_meta, EB] array -> flat compute-grid view."""
    return np.asarray(arr2d)[: c.n_chunk].reshape(-1)


def test_sddmm_matches_reference(setup):
    src, dst, c, ct, a, x, n = setup
    msg = jnp.take(x, c.src[: c.n_chunk].reshape(-1), axis=0)
    e_pal = _crop(c, sddmm_chunked_pallas(c, a, msg, interpret=True))
    e_xla = _crop(c, sddmm_chunked_xla(c, a, msg))
    v = _flat_valid(c)
    np.testing.assert_allclose(e_pal[v], e_xla[v], rtol=1e-4, atol=1e-4)
    # against the COO sddmm on real edges
    expect = np.asarray(
        sddmm_coo(jnp.asarray(_edge_src(c)[v]), jnp.asarray(_edge_dst(c)[v]), a, x)
    )
    np.testing.assert_allclose(e_pal[v], expect, rtol=1e-4, atol=1e-4)


def test_expand_rows(setup):
    src, dst, c, ct, a, x, n = setup
    out = np.asarray(expand_rows_chunked(c, a, interpret=True))
    v = _flat_valid(c)
    np.testing.assert_allclose(out[v], np.asarray(a)[_edge_dst(c)[v]], rtol=1e-5)


def test_edge_softmax_matches_segment_softmax(setup):
    src, dst, c, ct, a, x, n = setup
    rng = np.random.default_rng(1)
    scores = rng.normal(size=(c.n_chunk_meta, c.eb)).astype(np.float32)
    alpha = _crop(c, edge_softmax_chunked(c, jnp.asarray(scores)))
    v = _flat_valid(c)
    ref = np.asarray(
        segment_softmax(jnp.asarray(scores[: c.n_chunk].reshape(-1)[v]),
                        jnp.asarray(_edge_dst(c)[v]), c.n_rows)
    )
    np.testing.assert_allclose(alpha[v], ref, rtol=1e-4, atol=1e-5)
    assert np.all(alpha[~v] == 0)


def test_spmm_dyn_vjp(setup):
    src, dst, c, ct, a, x, n = setup
    rng = np.random.default_rng(2)
    w = jnp.asarray(
        np.where(np.asarray(c.weight) != 0,
                 rng.normal(size=(c.n_chunk_meta, c.eb)), 0.0).astype(np.float32)
    )
    msg = jnp.take(x, c.src[: c.n_chunk].reshape(-1), axis=0)

    def pal(msg_, w_):
        return jnp.sum(spmm_dyn(c, ct, msg_, w_, True) ** 2)

    def ref(msg_, w_):
        out = jax.ops.segment_sum(
            msg_ * w_[: c.n_chunk].reshape(-1, 1), jnp.asarray(_edge_dst(c)),
            num_segments=c.n_rows,
        )
        return jnp.sum(out ** 2)

    np.testing.assert_allclose(float(pal(msg, w)), float(ref(msg, w)), rtol=1e-3)
    gm_p, gw_p = jax.grad(pal, argnums=(0, 1))(msg, w)
    gm_r, gw_r = jax.grad(ref, argnums=(0, 1))(msg, w)
    v = _flat_valid(c)
    np.testing.assert_allclose(np.asarray(gm_p), np.asarray(gm_r), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(_crop(c, gw_p)[v], _crop(c, gw_r)[v],
                               rtol=1e-3, atol=1e-3)


def test_sddmm_vjp(setup):
    src, dst, c, ct, a, x, n = setup
    msg = jnp.take(x, c.src[: c.n_chunk].reshape(-1), axis=0)
    vmask = jnp.asarray((_flat_valid(c)).astype(np.float32))

    def pal(a_, msg_):
        e = sddmm(c, ct, a_, msg_, True)[: c.n_chunk].reshape(-1) * vmask
        return jnp.sum(jnp.sin(e))

    def ref(a_, msg_):
        e = jnp.sum(jnp.take(a_, jnp.asarray(_edge_dst(c)), axis=0) * msg_, axis=-1)
        e = e * vmask
        return jnp.sum(jnp.sin(e))

    np.testing.assert_allclose(float(pal(a, msg)), float(ref(a, msg)), rtol=1e-3)
    ga_p, gm_p = jax.grad(pal, argnums=(0, 1))(a, msg)
    ga_r, gm_r = jax.grad(ref, argnums=(0, 1))(a, msg)
    np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_r), rtol=1e-3, atol=1e-3)
    v = _flat_valid(c)
    np.testing.assert_allclose(np.asarray(gm_p)[v], np.asarray(gm_r)[v], rtol=1e-3,
                               atol=1e-3)


def test_gat_layer_matches_dense(setup):
    """Full sparse GAT layer vs the dense reference formulation (gatconv.py:30-54)."""
    src, dst, _, _, a, x, n = setup
    # dedupe edges: the dense oracle's adjacency can't represent multi-edges
    key = np.unique(np.asarray(dst) * 1000 + np.asarray(src))
    dst, src = key // 1000, key % 1000
    c, ct = build_chunked_pair(src, dst, n, n, None, eb=128)
    rng = np.random.default_rng(3)
    d = x.shape[1]
    a_src = jnp.asarray(rng.normal(size=d).astype(np.float32) * 0.1)
    a_dst = jnp.asarray(rng.normal(size=d).astype(np.float32) * 0.1)

    out = np.asarray(gat_attention_chunked(c, ct, x, a_src, a_dst, interpret=True))

    h = np.asarray(x)
    ssrc = h @ np.asarray(a_src)
    sdst = h @ np.asarray(a_dst)
    adj = np.zeros((c.n_rows, c.n_rows), bool)
    adj[dst, src] = True
    e = sdst[:, None] + ssrc[None, :]
    e = np.where(e > 0, e, 0.2 * e)
    e = np.where(adj, e, -1e30)
    e -= e.max(1, keepdims=True)
    alpha = np.exp(e) * adj
    alpha /= np.maximum(alpha.sum(1, keepdims=True), 1e-16)
    expect = alpha @ h
    np.testing.assert_allclose(out[:n], expect[:n], rtol=1e-3, atol=1e-4)


def test_gat_layer_grads_flow(setup):
    src, dst, c, ct, a, x, n = setup
    a_src = jnp.ones((x.shape[1],), jnp.float32) * 0.05
    a_dst = jnp.ones((x.shape[1],), jnp.float32) * -0.03

    def loss(h):
        return jnp.sum(gat_attention_chunked(c, ct, h, a_src, a_dst, interpret=True) ** 2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_multihead_chunked_matches_segment_layer():
    """GATConv kernel dispatch == GATConv segment path on the same params."""
    import jax.numpy as jnp
    from dgll_tpu.data import synthetic_classification_graph
    from dgll_tpu.nn import GATConv

    g = synthetic_classification_graph(n_node=150, avg_degree=5, seed=0)
    gc = g.with_chunked(eb=128)
    x = jnp.asarray(np.asarray(g.node_feat))
    layer = GATConv(128, num_heads=2, concat_heads=True)  # 128-wide heads -> kernel
    params = layer.init(jax.random.key(0), g, x)          # plain graph: segment path
    out_seg = layer.apply(params, g, x)
    out_ker = layer.apply(params, gc, x)
    np.testing.assert_allclose(np.asarray(out_ker), np.asarray(out_seg),
                               rtol=2e-3, atol=2e-4)


def test_multihead_small_heads_kernel_reachable():
    """Reference-style many-small-heads GAT (8 heads x 16 dims = 128 total) now rides
    the kernel path — (H*F) % 128 == 0 instead of per-head F % 128 (VERDICT r1 #11)."""
    import jax.numpy as jnp
    from dgll_tpu.data import synthetic_classification_graph
    from dgll_tpu.nn import GATConv

    g = synthetic_classification_graph(n_node=150, avg_degree=5, seed=1)
    gc = g.with_chunked(eb=128)
    x = jnp.asarray(np.asarray(g.node_feat))
    layer = GATConv(16, num_heads=8, concat_heads=True)
    params = layer.init(jax.random.key(0), g, x)
    out_seg = layer.apply(params, g, x)
    out_ker = layer.apply(params, gc, x)
    assert out_ker.shape == (150, 128)
    np.testing.assert_allclose(np.asarray(out_ker), np.asarray(out_seg),
                               rtol=2e-3, atol=2e-4)


def test_multihead_kernel_grads_match_segment():
    import jax
    import jax.numpy as jnp
    from dgll_tpu.data import synthetic_classification_graph
    from dgll_tpu.nn import GATConv

    g = synthetic_classification_graph(n_node=120, avg_degree=4, seed=2)
    gc = g.with_chunked(eb=128)
    x = jnp.asarray(np.asarray(g.node_feat))
    layer = GATConv(32, num_heads=4, concat_heads=True)
    params = layer.init(jax.random.key(0), g, x)

    def loss(p, graph):
        return jnp.sum(layer.apply(p, graph, x) ** 2)

    g_seg = jax.grad(loss)(params, g)
    g_ker = jax.grad(loss)(params, gc)
    for a, b in zip(jax.tree.leaves(g_seg), jax.tree.leaves(g_ker)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-4)


def test_gatconv_8x8_heads_hits_kernel_and_matches_xla(monkeypatch):
    """The reference's canonical 8-head x 8-dim config (gatconv.py:174-199) must
    reach the compiled (r5 fused) kernel path (per-head features zero-padded to
    make H*F' MXU-tileable) and agree with the XLA segment path."""
    from dgll_tpu.data import gcn_normalize, synthetic_classification_graph
    from dgll_tpu.nn.conv import GATConv
    import dgll_tpu.ops.pallas.gat as gatmod

    g = synthetic_classification_graph(n_node=150, avg_degree=6, n_class=3,
                                       feat_dim=16, seed=0)
    g = gcn_normalize(g).with_chunked(eb=128)

    calls = []
    orig = gatmod.gat_attention_chunked_fused

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(gatmod, "gat_attention_chunked_fused", spy)

    conv = GATConv(features=8, num_heads=8)  # H*F = 64, not 128-tileable raw
    x = jnp.asarray(np.asarray(g.node_feat))
    params = conv.init(jax.random.key(0), g, x)
    out_kernel = conv.apply(params, g, x)
    assert calls, "8x8-head config did not dispatch to the compiled kernel"

    g_plain = g.replace(chunked=None, chunked_t=None)
    out_xla = conv.apply(params, g_plain, x)
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-4)


def test_gatconv_single_head_dispatches_single_head_kernel(monkeypatch):
    """H=1 routes through the fused kernel path (r5: one fused entry for all
    head counts)."""
    from dgll_tpu.data import gcn_normalize, synthetic_classification_graph
    from dgll_tpu.nn.conv import GATConv
    import dgll_tpu.ops.pallas.gat as gatmod

    g = synthetic_classification_graph(n_node=120, avg_degree=5, n_class=3,
                                       feat_dim=16, seed=1)
    g = gcn_normalize(g).with_chunked(eb=128)

    calls = []
    orig = gatmod.gat_attention_chunked_fused

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(gatmod, "gat_attention_chunked_fused", spy)

    conv = GATConv(features=48, num_heads=1, concat_heads=False)  # pads 48->128
    x = jnp.asarray(np.asarray(g.node_feat))
    params = conv.init(jax.random.key(0), g, x)
    out_kernel = conv.apply(params, g, x)
    assert calls, "single-head config did not dispatch to gat_attention_chunked"

    g_plain = g.replace(chunked=None, chunked_t=None)
    out_xla = conv.apply(params, g_plain, x)
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-4)
