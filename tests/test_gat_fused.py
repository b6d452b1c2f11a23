"""Fused GAT attention (ops/pallas/gat_fused.py): stats/alpha/aggregate parity
vs the segment-op oracle and VJP parity vs XLA autodiff (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgll_tpu.ops.chunked import R_BLOCK, build_chunked_pair
from dgll_tpu.ops.pallas.gat import (
    gat_attention_chunked_fused,
    gat_attention_chunked_multihead,
)
from dgll_tpu.ops.pallas.gat_fused import gat_alpha, gat_stats
from dgll_tpu.ops.segment import segment_softmax


@pytest.fixture(scope="module", params=[1, 4])
def setup(request):
    H = request.param
    rng = np.random.default_rng(0)
    n, e, f = 192, 1500, 128 // H if H > 1 else 128
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    c, ct = build_chunked_pair(src, dst, n, n, None, eb=128)
    h = rng.normal(size=(c.n_rows, H * f)).astype(np.float32)
    a_src = rng.normal(size=(H, f)).astype(np.float32) * 0.3
    a_dst = rng.normal(size=(H, f)).astype(np.float32) * 0.3
    return H, f, c, ct, jnp.asarray(h), jnp.asarray(a_src), jnp.asarray(a_dst)


def _edge_layout(c):
    nc = c.n_chunk
    dst_g = (np.asarray(c.row_block)[:nc, None] * R_BLOCK
             + np.asarray(c.dst_local)[:nc]).reshape(-1)
    src_g = np.asarray(c.src)[:nc].reshape(-1)
    valid = np.asarray(c.weight)[:nc].reshape(-1) != 0
    return src_g, dst_g, valid


def _oracle(c, h, a_src, a_dst, slope=0.2):
    """Segment-op reference of the full fused layer."""
    H, f = a_src.shape
    src_g, dst_g, valid = _edge_layout(c)
    h3 = h.reshape(-1, H, f)
    sc_src = jnp.einsum("ehf,hf->eh", h3[src_g], a_src)
    s_dst = jnp.einsum("nhf,hf->nh", h3, a_dst)
    z = sc_src + s_dst[dst_g]
    e = jnp.where(z > 0, z, slope * z)
    e = jnp.where(jnp.asarray(valid)[:, None], e, -3e38)
    alpha = segment_softmax(e, jnp.asarray(dst_g), c.n_rows)
    alpha = alpha * jnp.asarray(valid)[:, None]
    msgw = h3[src_g] * alpha[:, :, None]
    out = jax.ops.segment_sum(msgw.reshape(len(src_g), -1), jnp.asarray(dst_g),
                              num_segments=c.n_rows)
    return out.reshape(c.n_rows, H, f), alpha, e


def test_stats_match_oracle(setup):
    H, f, c, ct, h, a_src, a_dst = setup
    nc, nm = c.n_chunk, c.n_chunk_meta
    src_g, dst_g, valid = _edge_layout(c)
    h3 = h.reshape(-1, H, f)
    sc_src = jnp.einsum("ehf,hf->eh", h3[src_g], a_src)
    sc_pad = jnp.pad(sc_src, ((0, (nm - nc) * c.eb), (0, 0)))
    s_dst = jnp.einsum("nhf,hf->nh", h3, a_dst)
    m, den = gat_stats(c, sc_pad, s_dst, 0.2, interpret=True)

    _, _, e = _oracle(c, h, a_src, a_dst)
    e_np = np.asarray(e)
    for r in range(c.n_rows):
        rows = (np.asarray(dst_g) == r) & valid
        if rows.any():
            em = e_np[rows].max(axis=0)
            np.testing.assert_allclose(np.asarray(m)[r], em, rtol=1e-5,
                                       atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(den)[r],
                np.exp(e_np[rows] - em[None]).sum(axis=0), rtol=1e-4,
                atol=1e-5)
        else:
            assert (np.asarray(den)[r] == 0.0).all()


def test_alpha_matches_segment_softmax(setup):
    H, f, c, ct, h, a_src, a_dst = setup
    nc, nm = c.n_chunk, c.n_chunk_meta
    src_g, dst_g, valid = _edge_layout(c)
    h3 = h.reshape(-1, H, f)
    sc_src = jnp.einsum("ehf,hf->eh", h3[src_g], a_src)
    sc_pad = jnp.pad(sc_src, ((0, (nm - nc) * c.eb), (0, 0)))
    s_dst = jnp.einsum("nhf,hf->nh", h3, a_dst)
    m, den = gat_stats(c, sc_pad, s_dst, 0.2, interpret=True)
    alpha, lgrad = gat_alpha(c, sc_pad, s_dst, m, den, 0.2, interpret=True)

    _, alpha_ref, e = _oracle(c, h, a_src, a_dst)
    a = np.asarray(alpha)[: nc * c.eb][valid]
    np.testing.assert_allclose(a, np.asarray(alpha_ref)[valid], rtol=1e-4,
                               atol=1e-5)
    # leaky-grad factor
    z = np.asarray(e)[valid]
    lg = np.asarray(lgrad)[: nc * c.eb][valid]
    np.testing.assert_allclose(lg, np.where(z > 0, 1.0, 0.2), rtol=1e-6)


def test_fused_layer_matches_oracle(setup):
    H, f, c, ct, h, a_src, a_dst = setup
    out = gat_attention_chunked_fused(c, ct, h, a_src, a_dst, 0.2,
                                      interpret=True)
    ref, _, _ = _oracle(c, h, a_src, a_dst)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)


def test_fused_matches_unfused(setup):
    H, f, c, ct, h, a_src, a_dst = setup
    if H == 1:
        pytest.skip("unfused multihead path expects H > 1")
    out = gat_attention_chunked_fused(c, ct, h, a_src, a_dst, 0.2,
                                      interpret=True)
    old = gat_attention_chunked_multihead(c, ct, h, a_src, a_dst, 0.2,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(old), rtol=2e-4,
                               atol=2e-4)


def test_fused_vjp_matches_autodiff(setup):
    H, f, c, ct, h, a_src, a_dst = setup
    t = jnp.asarray(np.random.default_rng(1).normal(
        size=(c.n_rows, H, f)).astype(np.float32))

    def loss_fused(h_, as_, ad_):
        o = gat_attention_chunked_fused(c, ct, h_, as_, ad_, 0.2,
                                        interpret=True)
        return jnp.vdot(o, t)

    def loss_ref(h_, as_, ad_):
        o, _, _ = _oracle(c, h_, as_, ad_)
        return jnp.vdot(o, t)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(h, a_src, a_dst)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(h, a_src, a_dst)
    for a, b, name in zip(gf, gr, ["h", "a_src", "a_dst"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-3, err_msg=name)


def test_fused_attention_dropout_matches_oracle(setup):
    """drop_mask path: fused output + grads == segment-op oracle with the SAME
    mask applied to alpha (so full-batch GAT trains through the kernels)."""
    H, f, c, ct, h, a_src, a_dst = setup
    rng = np.random.default_rng(7)
    p = 0.4
    keep = rng.random((c.n_chunk_meta * c.eb, H)) > p
    mask = jnp.asarray(keep.astype(np.float32) / (1.0 - p))
    t = jnp.asarray(rng.normal(size=(c.n_rows, H, f)).astype(np.float32))

    def loss_fused(h_):
        o = gat_attention_chunked_fused(c, ct, h_, a_src, a_dst, 0.2,
                                        interpret=True, drop_mask=mask)
        return jnp.vdot(o, t)

    def oracle(h_):
        from dgll_tpu.ops.segment import segment_softmax

        src_g, dst_g, valid = _edge_layout(c)
        h3 = h_.reshape(-1, H, f)
        sc_src = jnp.einsum("ehf,hf->eh", h3[src_g], a_src)
        s_dst = jnp.einsum("nhf,hf->nh", h3, a_dst)
        z = sc_src + s_dst[dst_g]
        e = jnp.where(z > 0, z, 0.2 * z)
        e = jnp.where(jnp.asarray(valid)[:, None], e, -3e38)
        alpha = segment_softmax(e, jnp.asarray(dst_g), c.n_rows)
        alpha = alpha * jnp.asarray(valid)[:, None]
        alpha = alpha * mask[: len(src_g)]
        msgw = (h3[src_g] * alpha[:, :, None]).reshape(len(src_g), -1)
        out = jax.ops.segment_sum(msgw, jnp.asarray(dst_g),
                                  num_segments=c.n_rows)
        return jnp.vdot(out.reshape(c.n_rows, H, f), t)

    np.testing.assert_allclose(float(loss_fused(h)), float(oracle(h)),
                               rtol=2e-4)
    gf = jax.grad(loss_fused)(h)
    gr = jax.grad(oracle)(h)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=2e-3,
                               atol=2e-3)


def test_gatconv_trains_through_kernel_with_attn_dropout():
    """GATConv with attn_dropout > 0 and deterministic=False must STILL take
    the kernel path (r5: dropout rides the fused op as an alpha mask)."""
    import dgll_tpu.ops.pallas.gat as gatmod
    from dgll_tpu.data import gcn_normalize, synthetic_classification_graph
    from dgll_tpu.nn.conv import GATConv

    g = gcn_normalize(synthetic_classification_graph(
        n_node=150, avg_degree=6, n_class=3, feat_dim=16,
        seed=0)).with_chunked(eb=128)
    conv = GATConv(features=16, num_heads=4, attn_dropout=0.5)
    x = jnp.asarray(np.asarray(g.node_feat))
    calls = []
    orig = gatmod.gat_attention_chunked_fused

    def spy(*a, **k):
        calls.append(k.get("drop_mask") is not None)
        return orig(*a, **k)

    gatmod.gat_attention_chunked_fused = spy
    try:
        params = conv.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, g, x, False)
        out = conv.apply(params, g, x, False,
                         rngs={"dropout": jax.random.key(2)})
    finally:
        gatmod.gat_attention_chunked_fused = orig
    assert calls and calls[-1] is True  # kernel path WITH a mask
    assert np.isfinite(np.asarray(out)).all()
    # eval mode: no mask
    calls.clear()
    gatmod.gat_attention_chunked_fused = spy
    try:
        out_eval = conv.apply(params, g, x, True)
    finally:
        gatmod.gat_attention_chunked_fused = orig
    assert calls and calls[-1] is False
    assert np.isfinite(np.asarray(out_eval)).all()
