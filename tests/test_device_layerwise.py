"""Device-resident FastGCN/LADIES: estimator correctness + epoch integration.

The key property (inherited from the reference samplers,
``/root/reference/dgll/GPU Accelerator/MQFastGCN.py:60-88`` / ``MQLadies.py:62-89``):
the sampled, rescaled block aggregation is an unbiased estimator of the exact
``L @ x`` restricted to the previous layer's rows. We verify that statistically,
plus shape/jit invariants and end-to-end training through the scanned epoch.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dgll_tpu.data import synthetic_classification_graph
from dgll_tpu.nn.models import GCN
from dgll_tpu.sampling import (
    DeviceLap,
    WeightedBlock,
    build_device_lap,
    normalized_laplacian,
    sample_blocks_device_layerwise,
)
from dgll_tpu.train.device_pipeline import DeviceEpochRunner


@pytest.fixture(scope="module")
def small():
    g = synthetic_classification_graph(n_node=120, avg_degree=6, feat_dim=8,
                                      n_class=4, seed=3)
    # k large enough that no row is truncated -> exact support
    lap = build_device_lap(g, k=32)
    L = normalized_laplacian(g).toarray()
    x = np.random.default_rng(0).standard_normal((g.n_real_node, 8)).astype(np.float32)
    return g, lap, L, x


def aggregate(block: WeightedBlock, x_by_src: jnp.ndarray) -> np.ndarray:
    rows = jnp.take(x_by_src, block.slot.reshape(-1), axis=0)
    rows = rows.reshape(block.n_dst, block.k, -1)
    return np.asarray(jnp.einsum("nk,nkf->nf", block.weight, rows))


@pytest.mark.parametrize("mode", ["fastgcn", "ladies"])
def test_single_layer_estimator_unbiased_for_exact_aggregation(small, mode):
    """E[sampled aggregation] == the EXACT ``L[:b] @ x``.

    Defensive importance sampling: previous-layer columns (deterministically
    included) carry their exact Laplacian weight; drawn-only columns carry
    ``mult/(s·p_j)`` whose expectation cancels (E[mult_j] = s·p_j). So the
    estimator is unbiased for the exact row aggregation — the property the
    naive rescale-everything form (which the reference computes then discards,
    ``MQFastGCN.py:82`` values=[]) does not have.
    """
    g, lap, L, x = small
    b, s = 16, 64
    seeds = jnp.arange(b, dtype=jnp.int32)
    mask = jnp.ones(b, bool)
    expected = L[:b] @ x

    @jax.jit
    def one(key):
        _, _, blocks = sample_blocks_device_layerwise(
            lap, seeds, mask, [s], key, mode=mode)
        blk = blocks[0]
        xs = jnp.take(jnp.asarray(x), blk.src_ids, axis=0)
        rows = jnp.take(xs, blk.slot.reshape(-1), axis=0)
        rows = rows.reshape(blk.n_dst, blk.k, -1)
        return jnp.einsum("nk,nkf->nf", blk.weight, rows)

    keys = jax.random.split(jax.random.key(0), 400)
    est = np.mean([np.asarray(one(k)) for k in keys], axis=0)
    err = np.abs(est - expected).max() / max(np.abs(expected).max(), 1e-6)
    assert err < 0.12, f"{mode}: relative estimator error {err:.3f}"


@pytest.mark.parametrize("mode", ["fastgcn", "ladies"])
def test_shapes_and_protocol(small, mode):
    g, lap, L, x = small
    b = 8
    seeds = jnp.arange(b, dtype=jnp.int32)
    mask = jnp.ones(b, bool)
    inp, out, blocks = jax.jit(
        lambda k: sample_blocks_device_layerwise(
            lap, seeds, mask, [24, 12], k, mode=mode)
    )(jax.random.key(1))
    assert len(blocks) == 2
    # outermost first: blocks[0] is the input-side layer
    assert blocks[-1].n_dst == b                      # output layer dst = seeds
    assert blocks[-1].n_src == b + 12
    assert blocks[0].n_dst == b + 12                  # grows by the drawn count
    assert blocks[0].n_src == b + 12 + 24
    assert inp.shape == blocks[0].src_ids.shape
    for blk in blocks:
        assert blk.self_at_head
        assert blk.slot.shape == (blk.n_dst, lap.k)
        assert blk.weight.shape == (blk.n_dst, lap.k)
        # every slot points inside src_ids
        assert int(jnp.max(blk.slot)) < blk.n_src
        # padded/unhit edges carry zero weight
        w = np.asarray(blk.weight)
        assert np.isfinite(w).all()


def test_padded_seeds_masked(small):
    g, lap, L, x = small
    seeds = jnp.asarray([3, 5, 0, 0], jnp.int32)
    mask = jnp.asarray([True, True, False, False])
    _, _, blocks = sample_blocks_device_layerwise(
        lap, seeds, mask, [16], jax.random.key(2), mode="fastgcn")
    blk = blocks[0]
    w = np.asarray(blk.weight)
    assert w[2:4].sum() == 0.0  # masked rows contribute nothing
    assert w[:2].sum() > 0.0


@pytest.mark.parametrize("mode", ["fastgcn", "ladies"])
def test_device_epoch_trains(small, mode):
    """GCN through the scanned single-dispatch epoch with layer-wise sampling."""
    g, lap, L, x = small
    feats = jnp.asarray(g.node_feat)
    labels = jnp.asarray(g.labels)
    model = GCN(hidden=16, n_class=4, dropout=0.0)
    runner = DeviceEpochRunner(
        model, optax.adam(5e-2), lap, fanouts=[32, 16], batch_size=16,
        train_nodes=np.arange(64), seed=0, sampler=mode)
    state = runner.init_state(feats)
    losses = []
    for _ in range(6):
        state, loss = runner.run_epoch(state, feats, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
