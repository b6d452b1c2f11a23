"""GIN graph classification with global pooling + stratified 10-fold evaluation —
parity with the reference's GIN protocol (``ginconv.py`` + ``separate_data``,
``dgll/nn/utils/utils.py:387-399``).

    python examples/graph_classification_gin.py                     # synthetic data
    python examples/graph_classification_gin.py --data MUTAG.txt    # load_dataP file
    python examples/graph_classification_gin.py --fold_idx 3 --degree_as_tag
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dgll_tpu.data import load_dataP, s2v_to_tuples, separate_graphs
from dgll_tpu.data.datasets import synthetic_graph_classification
from dgll_tpu.nn import GIN, batch_graphs
from dgll_tpu.train import accuracy


def load(args):
    if args.data:
        graphs, n_class = load_dataP(args.data, degree_as_tag=args.degree_as_tag)
        train_g, test_g = separate_graphs(graphs, seed=args.seed,
                                          fold_idx=args.fold_idx)
        return s2v_to_tuples(train_g), s2v_to_tuples(test_g), n_class
    data = synthetic_graph_classification(n_graph=128, n_class=2, feat_dim=8,
                                          seed=args.seed)
    # reuse the stratified fold machinery on the synthetic set too
    from dgll_tpu.data.utils import separate_data

    tr, te = separate_data([d[3] for d in data], fold_idx=args.fold_idx,
                           seed=args.seed)
    return [data[i] for i in tr], [data[i] for i in te], 2


def fit(train_data, test_data, n_class, epochs=100, seed=0):
    g, graph_id, labels = batch_graphs(train_data)
    n_graph = len(train_data)
    gt, graph_id_t, labels_t = batch_graphs(test_data)

    model = GIN(hidden=32, n_class=n_class, n_layers=3, pooling=("sum", "mean"),
                dropout=0.1)
    params = model.init(jax.random.key(seed), g, g.node_feat, graph_id, n_graph)["params"]
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_of(p):
            logp = model.apply({"params": p}, g, g.node_feat, graph_id, n_graph,
                               deterministic=False, rngs={"dropout": key})
            nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
            return nll.mean()

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state2 = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state2, loss

    key = jax.random.key(seed + 1)
    for _ in range(epochs):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)

    logp_tr = model.apply({"params": params}, g, g.node_feat, graph_id, n_graph)
    logp_te = model.apply({"params": params}, gt, gt.node_feat, graph_id_t,
                          len(test_data))
    return {
        "loss": float(loss),
        "train_acc": accuracy(logp_tr, labels),
        "test_acc": accuracy(logp_te, labels_t),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="", help="load_dataP text file (optional)")
    p.add_argument("--degree_as_tag", action="store_true")
    p.add_argument("--fold_idx", type=int, default=0)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    train_data, test_data, n_class = load(args)
    out = fit(train_data, test_data, n_class, epochs=args.epochs, seed=args.seed)
    print({"fold": args.fold_idx, "n_train": len(train_data),
           "n_test": len(test_data), **out})


if __name__ == "__main__":
    main()
