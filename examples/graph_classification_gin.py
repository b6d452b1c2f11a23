"""GIN graph classification with global pooling — parity with the reference's
``ginconv.py`` + ``GlobalPooling`` usage (graph-level tasks).

    python examples/graph_classification_gin.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dgll_tpu.data.datasets import synthetic_graph_classification
from dgll_tpu.nn import GIN, batch_graphs
from dgll_tpu.train import accuracy


def main():
    data = synthetic_graph_classification(n_graph=128, n_class=2, feat_dim=8, seed=0)
    g, graph_id, labels = batch_graphs(data)
    n_graph = len(data)
    model = GIN(hidden=32, n_class=2, n_layers=3, pooling=("sum", "mean"), dropout=0.1)
    params = model.init(jax.random.key(0), g, g.node_feat, graph_id, n_graph)["params"]
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

    key = jax.random.key(1)
    for epoch in range(100):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
    logp = model.apply({"params": params}, g, g.node_feat, graph_id, n_graph)
    print({"loss": float(loss), "train_acc": accuracy(logp, labels)})


if __name__ == "__main__":
    main()
