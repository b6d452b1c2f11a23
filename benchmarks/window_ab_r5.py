"""Window-sampling convergence A/B, round 5: scored by EXACT inference.

Round-4's A/B (window_ab_r4.json) scored variants through the sampled eval
sweep; VERDICT r4 #5 asks the numbers to be re-emitted through the exact
full-neighborhood inference path so reported accuracies carry no sampling
noise. Same harness otherwise.

Block-window device sampling (one random 128-lane CSR window per node,
``sampling/device_sampler.py``) is ~7 % faster per epoch than exact per-slot
draws but its within-node samples are correlated. This harness settles whether
that costs accuracy at CONVERGENCE: train GraphSAGE to a validation plateau
(``n_stops``-style patience, ref ``CommGNN_train.py:147-153``) on a
scale-realistic homophilous SBM graph under

  * device sampling, window mode
  * device sampling, exact mode
  * host NeighborSampler (the reference-semantics baseline)

and record best-val / test accuracy. All three variants are scored through
the SAME **exact full-neighborhood inference** (train/exact_infer.py — zero
eval sampling noise), so only the TRAINING sampler differs.
Output: benchmarks/results/window_ab_r5.json.

Env knobs: WA_NODES (600k), WA_DEG (15), WA_EPOCHS (60), WA_STOPS (8).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from dgll_tpu.data import synthetic_classification_graph
    from dgll_tpu.dataloader import DataLoader
    from dgll_tpu.nn import GraphSAGE
    from dgll_tpu.sampling import DeviceCSR, HostGraph, NeighborSampler
    from dgll_tpu.train import DeviceEpochRunner, MiniBatchTrainer

    n_node = int(os.environ.get("WA_NODES", 600_000))
    avg_deg = int(os.environ.get("WA_DEG", 15))
    max_epochs = int(os.environ.get("WA_EPOCHS", 60))
    n_stops = int(os.environ.get("WA_STOPS", 8))
    noise = float(os.environ.get("WA_NOISE", 4.5))
    homophily = float(os.environ.get("WA_HOMOPHILY", 0.55))
    batch, fanouts = 1024, [15, 10]
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results", "window_ab_r5.json")

    t0 = time.perf_counter()
    # hard regime: high feature noise + moderate homophily, so converged
    # accuracy sits well below 1.0 and sampling-quality differences can show
    g = synthetic_classification_graph(
        n_node=n_node, avg_degree=avg_deg, n_class=32, feat_dim=100,
        power_law=1.0, homophily=homophily, feat_noise=noise, seed=0,
        train_frac=0.02)
    print(f"[ab] graph {time.perf_counter()-t0:.1f}s", flush=True)

    feats = jnp.asarray(g.node_feat)
    labels = jnp.asarray(g.labels)
    labels_np = np.asarray(g.labels)
    train_nodes = g.get_train_nodes()
    val_nodes = np.asarray(g.get_validation_nodes())[:20_000]
    test_nodes = np.asarray(g.get_test_nodes())[:50_000]
    csr = DeviceCSR.from_graph(g)
    model = GraphSAGE(hidden=256, n_class=32, dropout=0.5)
    print(f"[ab] device arrays {time.perf_counter()-t0:.1f}s", flush=True)

    # shared EXACT full-neighborhood eval (train/exact_infer.py): one
    # compiled full-graph forward, zero sampling noise
    from dgll_tpu.train.exact_infer import make_exact_logits_fn

    glight = g.replace(node_feat=None, labels=None, train_mask=None,
                       val_mask=None, test_mask=None)
    gd = jax.tree.map(jnp.asarray, glight)
    exact_fn = make_exact_logits_fn(model.apply)

    def exact_acc(params, nodes):
        logp = exact_fn(params, gd, feats)
        pred = np.asarray(jnp.argmax(logp, -1))[: g.n_real_node]
        return float((pred[nodes] == labels_np[nodes]).mean())

    results = {"eval": "exact_full_neighborhood",
               "n_node": n_node, "n_edge": g.n_real_edge, "batch": batch,
               "fanouts": fanouts, "max_epochs": max_epochs, "n_stops": n_stops,
               "variants": {}}

    def fit(name, run_epoch, state):
        nonlocal results
        best_val, best_params, bad, epochs = -1.0, state.params, 0, 0
        t_train = 0.0
        for ep in range(max_epochs):
            te = time.perf_counter()
            state, loss = run_epoch(state)
            loss = float(loss)
            if ep > 0:   # epoch 0 pays the compile; keep timing honest
                t_train += time.perf_counter() - te
            epochs += 1
            val = exact_acc(state.params, val_nodes)
            if val > best_val:
                best_val, best_params, bad = val, state.params, 0
            else:
                bad += 1
            print(f"[{name}] ep {ep} loss {loss:.4f} val {val:.4f}", flush=True)
            if bad >= n_stops:
                break
        test = exact_acc(best_params, test_nodes)
        results["variants"][name] = {
            "best_val": round(best_val, 4), "test_acc": round(test, 4),
            "epochs": epochs,
            "train_s_per_epoch": round(t_train / max(epochs - 1, 1), 3),
        }
        print(f"[{name}] DONE best_val={best_val:.4f} test={test:.4f} "
              f"({epochs} epochs)", flush=True)

    for name, window in (("device_window", True), ("device_exact", False)):
        runner = DeviceEpochRunner(model, optax.adam(1e-3), csr, fanouts, batch,
                                   train_nodes, seed=1, window=window)
        state = runner.init_state(feats)
        fit(name, lambda st: runner.run_epoch(st, feats, labels), state)

    # host-sampled baseline (reference semantics: i.i.d. numpy/C++ sampler)
    hg = HostGraph.from_graph(g)
    sampler = NeighborSampler(fanouts, seed=2)
    tr = MiniBatchTrainer(model, optax.adam(1e-3), seed=1)
    _, _, b0 = sampler.sample(hg, train_nodes[:batch], pad_to=batch)
    x0 = jnp.take(feats, jnp.asarray(b0[0].src_ids), axis=0)
    hstate = tr.init_state(b0, x0)

    def host_epoch(st):
        loader = DataLoader(hg, train_nodes, sampler, batch, packed=True,
                            prefetch=4, n_producers=2, seed=3)
        st, loss, _ = tr.run_epoch_packed(st, loader, feats, labels, fanouts,
                                          group=8)
        return st, loss

    fit("host_sampler", host_epoch, hstate)

    print(json.dumps(results, indent=1))
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
