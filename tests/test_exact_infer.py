"""Exact full-neighborhood inference (train/exact_infer.py).

A minibatch-trained model evaluated through the exact full-graph forward must
(1) match the model's own full-batch apply bit-for-bit, (2) be deterministic
(no sampling noise), and (3) beat/match the sampled sweep's accuracy on a
community-structured task where sampling noise hurts.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dgll_tpu.data import gcn_normalize, synthetic_classification_graph
from dgll_tpu.nn import GCN, GraphSAGE
from dgll_tpu.sampling import DeviceCSR
from dgll_tpu.train import DeviceEpochRunner, exact_accuracy, exact_predict


@pytest.fixture(scope="module")
def trained():
    g = gcn_normalize(synthetic_classification_graph(
        n_node=600, avg_degree=8, n_class=5, feat_dim=16, seed=0))
    csr = DeviceCSR.from_graph(g)
    model = GraphSAGE(hidden=32, n_class=5, dropout=0.0)
    runner = DeviceEpochRunner(model, optax.adam(1e-2), csr, fanouts=[8, 6],
                               batch_size=64, train_nodes=np.arange(400), seed=0)
    feats = jnp.asarray(g.node_feat)
    state = runner.init_state(feats)
    for _ in range(8):
        state, _ = runner.run_epoch(state, feats, jnp.asarray(g.labels))
    return g, model, runner, state, feats


def test_exact_matches_full_batch_apply(trained):
    g, model, runner, state, feats = trained
    pred = exact_predict(model.apply, state.params, g, feats)
    logp = model.apply({"params": state.params}, g, feats, deterministic=True)
    np.testing.assert_array_equal(
        pred, np.asarray(jnp.argmax(logp, -1))[: g.n_real_node])


def test_exact_is_deterministic_and_runner_method(trained):
    g, model, runner, state, feats = trained
    nodes = np.arange(400, 600)
    a = runner.predict_nodes_exact(state, g, feats, nodes)
    b = runner.predict_nodes_exact(state, g, feats, nodes)
    np.testing.assert_array_equal(a, b)
    acc = runner.evaluate_nodes_exact(state, g, feats, np.asarray(g.labels),
                                      nodes)
    assert 0.0 <= acc <= 1.0


def test_exact_at_least_as_good_as_sampled(trained):
    """On a trained model, exact eval should not lose to the sampled sweep
    (it removes estimator noise; allow a small statistical margin)."""
    g, model, runner, state, feats = trained
    nodes = np.arange(400, 600)
    labels_np = np.asarray(g.labels)
    acc_exact = exact_accuracy(model.apply, state.params, g, feats, labels_np,
                               nodes)
    acc_sampled = runner.evaluate_nodes(state, feats, labels_np, nodes, seed=7)
    assert acc_exact >= acc_sampled - 0.05, (acc_exact, acc_sampled)


def test_cli_exact_eval_smoke():
    from dgll_tpu.run import main

    out = main([
        "--dataset", "synthetic", "--Model", "GCN", "--device_sampling",
        "--exact_eval", "--n_epochs", "2", "--n_node", "400", "--n_stops", "0",
        "--batch_size", "64", "--nhid", "16", "--feat_dim", "8",
        "--n_class", "4", "--avg_degree", "6",
    ])
    assert out["trials"][0]["exact_eval"] is True
    assert 0.0 <= out["trials"][0]["test_acc"] <= 1.0
