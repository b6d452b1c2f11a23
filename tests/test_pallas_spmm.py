"""Chunked one-hot segment-matmul SpMM: layout, XLA reference, Pallas kernel
(interpret mode on CPU), and custom VJP vs autodiff oracle."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgll_tpu.ops.chunked import (
    R_BLOCK,
    build_chunked,
    build_chunked_pair,
    spmm_chunked_xla,
)
from dgll_tpu.ops.pallas.segment_matmul import spmm_chunked, spmm_chunked_pallas
from dgll_tpu.ops.spmm import spmm_coo


@pytest.fixture(scope="module")
def coo():
    rng = np.random.default_rng(0)
    n, e, d = 300, 4000, 128
    src = rng.integers(0, n, e)
    # power-law-ish dst so some row blocks are heavy, some empty after padding
    p = (np.arange(n) + 1.0) ** -1.2
    p /= p.sum()
    dst = rng.choice(n, size=e, p=p)
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    return src, dst, w, x, n


def dense_expect(src, dst, w, x, n):
    A = np.zeros((n, n), np.float32)
    np.add.at(A, (dst, src), w)
    return A @ x


def test_layout_roundtrip(coo):
    src, dst, w, x, n = coo
    c = build_chunked(src, dst, n, n, w, eb=256)
    # every real edge appears once: total weight preserved
    np.testing.assert_allclose(c.weight.sum(), w.sum(), rtol=1e-4)
    # chunk row blocks cover all blocks (empty blocks get padding chunks)
    assert set(np.asarray(c.row_block)) == set(range(c.n_row_blocks))
    assert np.all(np.diff(np.asarray(c.row_block)) >= 0)
    assert np.all(np.asarray(c.dst_local) < R_BLOCK)


def test_xla_reference_matches_dense(coo):
    src, dst, w, x, n = coo
    c = build_chunked(src, dst, n, n, w, eb=256)
    out = spmm_chunked_xla(c, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out)[:n], dense_expect(src, dst, w, x, n), rtol=1e-3, atol=1e-3
    )


def test_pallas_kernel_matches_dense(coo):
    src, dst, w, x, n = coo
    c = build_chunked(src, dst, n, n, w, eb=256)
    msg = jnp.take(jnp.asarray(x), c.src[: c.n_chunk].reshape(-1), axis=0)
    out = spmm_chunked_pallas(c, msg, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out)[:n], dense_expect(src, dst, w, x, n), rtol=1e-3, atol=1e-3
    )


def test_pallas_fused_bias_relu(coo):
    src, dst, w, x, n = coo
    c = build_chunked(src, dst, n, n, w, eb=256)
    bias = np.linspace(-1, 1, x.shape[1]).astype(np.float32)
    msg = jnp.take(jnp.asarray(x), c.src[: c.n_chunk].reshape(-1), axis=0)
    out = spmm_chunked_pallas(c, msg, jnp.asarray(bias), activation="relu",
                              interpret=True)
    expect = np.maximum(dense_expect(src, dst, w, x, n) + bias, 0.0)
    np.testing.assert_allclose(np.asarray(out)[:n], expect, rtol=1e-3, atol=1e-3)


def test_custom_vjp_matches_autodiff(coo):
    src, dst, w, x, n = coo
    c, ct = build_chunked_pair(src, dst, n, n, w, eb=256)
    bias = jnp.asarray(np.linspace(-0.5, 0.5, x.shape[1]).astype(np.float32))
    xj = jnp.asarray(x)
    srcj, dstj, wj = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)

    def pallas_loss(x_, b_):
        out = spmm_chunked(c, ct, x_, b_, "relu", True)
        return jnp.sum(out[:n] ** 2)

    def ref_loss(x_, b_):
        out = jax.nn.relu(spmm_coo(srcj, dstj, x_, n, wj) + b_)
        return jnp.sum(out ** 2)

    np.testing.assert_allclose(float(pallas_loss(xj, bias)), float(ref_loss(xj, bias)),
                               rtol=1e-3)
    gx_p, gb_p = jax.grad(pallas_loss, argnums=(0, 1))(xj, bias)
    gx_r, gb_r = jax.grad(ref_loss, argnums=(0, 1))(xj, bias)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_r), rtol=1e-3, atol=1e-2)


def test_pallas_kernel_bf16_messages(coo):
    """bf16 messages with f32 in-kernel accumulation (mixed-precision mode used by
    the fullgraph benchmark): matches the f32 dense oracle at bf16 tolerance, and
    the VJP runs the transpose kernel in bf16 too."""
    src, dst, w, x, n = coo
    c, ct = build_chunked_pair(src, dst, n, n, w, eb=256)
    xb = jnp.asarray(x, jnp.bfloat16)
    msg = jnp.take(xb, c.src[: c.n_chunk].reshape(-1), axis=0)
    out = spmm_chunked_pallas(c, msg, interpret=True)
    assert out.dtype == jnp.bfloat16
    # oracle = f32 math over bf16-QUANTIZED inputs: the kernel accumulates in
    # f32, so the only extra error left is the final bf16 store rounding
    xq = np.asarray(xb, np.float32)
    wq = np.asarray(jnp.asarray(w, jnp.bfloat16), np.float32)
    expect = dense_expect(src, dst, wq, xq, n)
    scale = np.maximum(np.abs(expect), 1.0)
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[:n] / scale, expect / scale, atol=1e-2
    )

    def loss(x_):
        return jnp.sum(spmm_chunked(c, ct, x_, None, "relu", True)[:n] ** 2)

    gx = jax.grad(loss)(xb)
    assert gx.dtype == jnp.bfloat16
    # backward oracle built from the pallas forward's OWN output (so relu-mask
    # flips on near-zero sums don't poison the comparison): dx = A^T (2 out)
    out_f = np.zeros((c.n_rows, x.shape[1]), np.float32)
    out_f[:n] = np.maximum(dense_expect(src, dst, wq, xq, n), 0.0)
    A = np.zeros((n, n), np.float32)
    np.add.at(A, (dst, src), wq)
    # quantize the cotangent like the kernel sees it (g flows in as bf16)
    g_q = np.asarray(jnp.asarray(2.0 * out_f[:n], jnp.bfloat16), np.float32)
    gx_r = A.T @ g_q
    gscale = np.maximum(np.abs(gx_r), 1.0)
    np.testing.assert_allclose(
        np.asarray(gx, np.float32) / gscale, gx_r / gscale, atol=5e-2
    )


def test_rectangular_block(coo):
    """Bipartite A [rows x cols] with rows != cols (sampled-block shape)."""
    rng = np.random.default_rng(1)
    rows, cols, e, d = 100, 250, 1500, 128
    src = rng.integers(0, cols, e)
    dst = rng.integers(0, rows, e)
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(cols, d)).astype(np.float32)
    c = build_chunked(src, dst, rows, cols, w, eb=128)
    msg = jnp.take(jnp.asarray(x), c.src[: c.n_chunk].reshape(-1), axis=0)
    out = spmm_chunked_pallas(c, msg, interpret=True)
    A = np.zeros((rows, cols), np.float32)
    np.add.at(A, (dst, src), w)
    np.testing.assert_allclose(np.asarray(out)[:rows], A @ x, rtol=1e-3, atol=1e-3)


def test_gcn_training_via_chunked_dispatch():
    """Full-batch GCN with the graph carrying chunked layouts: the Pallas path is
    exercised end-to-end through the flax layer and reaches the same accuracy."""
    import optax

    from dgll_tpu.data import gcn_normalize, synthetic_classification_graph
    from dgll_tpu.nn import GCN
    from dgll_tpu.train import FullBatchTrainer, accuracy

    g = gcn_normalize(
        synthetic_classification_graph(n_node=200, avg_degree=6, n_class=3,
                                       feat_dim=16, seed=0)
    )
    gc = g.with_chunked(eb=128)
    assert gc.chunked is not None and gc.chunked_t is not None
    model = GCN(hidden=128, n_class=3, dropout=0.0)  # 128 wide -> kernel path
    tr = FullBatchTrainer(model, optax.adam(1e-2))
    state, hist = tr.fit(gc, gc.node_feat, gc.labels, gc.train_mask, epochs=30)
    logp = tr.evaluate(state, gc, gc.node_feat)
    acc = accuracy(logp, gc.labels, gc.test_mask)
    assert acc > 0.7, acc


def test_msg_dtype_bf16_mixed_precision(coo):
    """msg_dtype=bf16: f32 inputs/outputs with the edge-sized message matrix (and
    MXU operands) in bf16 — the HBM-traffic-halving mode of ``spmm_chunked``."""
    src, dst, w, x, n = coo
    c, ct = build_chunked_pair(src, dst, n, n, w, eb=256)
    xj = jnp.asarray(x)

    out = spmm_chunked(c, ct, xj, None, None, True, msg_dtype=jnp.bfloat16)
    assert out.dtype == jnp.float32  # output stays at input precision
    xq = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
    wq = np.asarray(jnp.asarray(w, jnp.bfloat16), np.float32)
    expect = dense_expect(src, dst, wq, xq, n)
    scale = np.maximum(np.abs(expect), 1.0)
    np.testing.assert_allclose(np.asarray(out)[:n] / scale, expect / scale, atol=1e-2)

    def loss(x_):
        return jnp.sum(
            spmm_chunked(c, ct, x_, None, None, True, msg_dtype=jnp.bfloat16)[:n] ** 2
        )

    gx = jax.grad(loss)(xj)
    assert gx.dtype == jnp.float32
    A = np.zeros((n, n), np.float32)
    np.add.at(A, (dst, src), wq)
    g_q = np.asarray(jnp.asarray(2.0 * expect, jnp.bfloat16), np.float32)
    gx_r = A.T @ g_q
    gscale = np.maximum(np.abs(gx_r), 1.0)
    np.testing.assert_allclose(np.asarray(gx) / gscale, gx_r / gscale, atol=5e-2)
