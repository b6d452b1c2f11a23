"""Unified training CLI — ``python -m dgll_tpu.run --Model GCN --dataset synthetic ...``

Replaces the reference's per-model entry scripts (``MQGCN.py``, ``MQGraphSAGE.py``,
``MQFastGCN*.py``, ``MQLadies*.py``, ``CommGCN.py``, ``FeatureCache/gcn.py`` CLIs)
with one trainer driven by the shared flag set (``dgll_tpu/utils/config.py``).
Aggregates metric mean/std over ``--n_trial`` repeats like ``record_result_new``
(``GPU Accelerator/utils.py:38-99``).
"""
from __future__ import annotations

import json
import time
from typing import Optional

import numpy as np


def build_dataset(cfg):
    from dgll_tpu.data import (
        gcn_normalize,
        load_graph,
        load_planetoid,
        synthetic_classification_graph,
    )

    if cfg.dataset == "synthetic":
        g = synthetic_classification_graph(
            n_node=cfg.n_node, avg_degree=cfg.avg_degree, n_class=cfg.n_class,
            feat_dim=cfg.feat_dim, power_law=1.0, seed=cfg.seed,
        )
    elif cfg.dataset.endswith(".graph") or cfg.dataset.endswith(".pkl"):
        g = load_graph(cfg.dataset)
    else:
        # planetoid directory containing <name>.content / <name>.cites
        import os

        path, name = os.path.split(cfg.dataset.rstrip("/"))
        g = load_planetoid(path or ".", name)
    return gcn_normalize(g)


def build_model(cfg, n_class: int):
    from dgll_tpu.nn import GAT, GCN, GraphSAGE

    if cfg.model.upper() == "GCN":
        return GCN(hidden=cfg.nhid, n_class=n_class, n_layers=cfg.n_layers,
                   dropout=cfg.dropout)
    if cfg.model.upper() == "GAT":
        return GAT(hidden=cfg.nhid, n_class=n_class, num_heads=cfg.n_heads,
                   n_layers=cfg.n_layers, dropout=cfg.dropout)
    if cfg.model.upper() in ("GRAPHSAGE", "SAGE"):
        return GraphSAGE(hidden=cfg.nhid, n_class=n_class, n_layers=cfg.n_layers,
                         dropout=cfg.dropout)
    raise ValueError(f"unknown model {cfg.model!r}")


def build_sampler(cfg, g):
    from dgll_tpu.sampling import (
        FastGCNSampler,
        LadiesSampler,
        NeighborSampler,
        geometric_layer_sizes,
        normalized_laplacian,
    )

    if cfg.sampler == "neighbor":
        return NeighborSampler(cfg.fanouts, seed=cfg.seed)
    sizes = geometric_layer_sizes(cfg.n_samp, cfg.samp_growth_rate, cfg.n_layers)
    lap = normalized_laplacian(g)
    cls = FastGCNSampler if cfg.sampler == "fastgcn" else LadiesSampler
    return cls(lap, sizes, flatten=cfg.flatten, wrs=cfg.wrs, seed=cfg.seed)


def run_trial(cfg, g, trial_seed: int) -> dict:
    import jax
    import optax

    from dgll_tpu.train import FullBatchTrainer, MiniBatchTrainer, accuracy, micro_f1
    from dgll_tpu.utils import PhaseTimer, get_logger

    log = get_logger(cfg.log_file)
    timer = PhaseTimer()
    n_class = int(np.asarray(g.labels)[: g.n_real_node].max()) + 1
    model = build_model(cfg, n_class)
    tx = (
        optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
        if cfg.weight_decay
        else optax.adam(cfg.lr)
    )

    t_start = time.perf_counter()
    if cfg.sampler == "full":
        tr = FullBatchTrainer(model, tx, seed=trial_seed)
        with timer.phase("train"):
            state, hist = tr.fit(
                g, g.node_feat, g.labels, g.train_mask, g.val_mask,
                epochs=cfg.n_epochs, patience=cfg.n_stops,
            )
        logp = tr.evaluate(state, g, g.node_feat)
        test_acc = accuracy(logp, g.labels, g.test_mask)
        f1 = micro_f1(np.asarray(logp).argmax(-1), np.asarray(g.labels),
                      np.asarray(g.test_mask))
        best_val = hist.best_val
        n_epochs_run = len(hist.epochs)
    else:
        import jax.numpy as jnp

        from dgll_tpu.dataloader import DataLoader

        sampler = build_sampler(cfg, g)
        train_nodes = g.get_train_nodes()
        loader = DataLoader(g, train_nodes, sampler, cfg.batch_size, seed=trial_seed)
        tr = MiniBatchTrainer(model, tx, seed=trial_seed)
        _, _, b0 = sampler.sample(loader.host_g, train_nodes[: cfg.batch_size],
                                  pad_to=cfg.batch_size)
        feats = jnp.asarray(g.node_feat)
        labels = jnp.asarray(g.labels)
        x0 = jnp.take(feats, jnp.asarray(b0[0].src_ids), axis=0)
        state = tr.init_state(b0, x0)
        best_val, bad, n_epochs_run = -np.inf, 0, 0
        val_loader = DataLoader(g, g.get_validation_nodes(), sampler, cfg.batch_size,
                                shuffle=False, seed=trial_seed + 1)
        for epoch in range(cfg.n_epochs):
            with timer.phase("train"):
                state, loss, dt = tr.run_epoch(state, loader, feats, labels)
            n_epochs_run += 1
            with timer.phase("validate"):
                val = tr.evaluate_nodes(state, val_loader, feats, labels)
            if val > best_val:
                best_val, bad = val, 0
            else:
                bad += 1
            log.info(f"epoch {epoch} loss {loss:.4f} val {val:.4f} ({dt:.2f}s)")
            if cfg.n_stops and bad >= cfg.n_stops:
                break
        test_loader = DataLoader(g, g.get_test_nodes(), sampler, cfg.batch_size,
                                 shuffle=False, seed=trial_seed + 2)
        test_acc = tr.evaluate_nodes(state, test_loader, feats, labels)
        f1 = test_acc

    total = time.perf_counter() - t_start
    if cfg.checkpoint_dir:
        from dgll_tpu.train import CheckpointManager

        mgr = CheckpointManager(cfg.checkpoint_dir)
        mgr.save(n_epochs_run, jax.tree.map(np.asarray, state.params), wait=True)
        mgr.close()
    return {
        "test_acc": float(test_acc),
        "micro_f1": float(f1),
        "best_val": float(best_val),
        "epochs": n_epochs_run,
        "train_s": timer.totals.get("train", total),
        "total_s": total,
    }


def main(argv=None) -> dict:
    from dgll_tpu.utils import parse_train_config

    cfg = parse_train_config(argv)
    g = build_dataset(cfg)
    results = [run_trial(cfg, g, cfg.seed + t) for t in range(cfg.n_trial)]
    agg = {
        k: {
            "mean": float(np.mean([r[k] for r in results])),
            "std": float(np.std([r[k] for r in results])),
        }
        for k in results[0]
    }
    out = {"config": vars(cfg) | {"fanouts": list(cfg.fanouts)}, "trials": results,
           "aggregate": agg}
    print(json.dumps(out, default=str))
    return out


if __name__ == "__main__":
    main()
